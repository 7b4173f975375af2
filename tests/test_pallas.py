"""Pallas rasterizer tests (interpret mode on CPU) vs the XLA tile path."""

import jax.numpy as jnp
import numpy as np
import pytest

import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops.binning import bin_splats
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.rasterize_tiles import rasterize_tiles_jax
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


@pytest.fixture(scope="module")
def scene():
    return sphere_scene(n=1500, seed=0).activate()


@pytest.fixture(scope="module")
def camera():
    return Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=192, height=128,
    )


@pytest.mark.parametrize(
    "config",
    [
        RasterizeConfig(),
        RasterizeConfig(tile_h=8, chunk_size=64),
        RasterizeConfig(pair_multiplier=6.0, expand_chunk=128),
    ],
    ids=["default", "small-tiles", "small-expand-chunk"],
)
def test_pallas_forward_matches_xla(scene, camera, config):
    proj = project_splats(scene, camera)
    binning = bin_splats(proj, camera.width, camera.height, config)
    ref = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
    rpal.INTERPRET = True
    try:
        got = rpal.rasterize_tiles_pallas(
            proj, camera.width, camera.height, config
        )
    finally:
        rpal.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_empty_scene(camera):
    # Zero-opacity cloud: every tile must come out exactly empty (exercises
    # empty-tile schedule steps and output-block initialization).
    import dataclasses

    g = sphere_scene(n=256, seed=1).activate()
    g = dataclasses.replace(g, opacities=jnp.zeros_like(g.opacities))
    config = RasterizeConfig()
    proj = project_splats(g, camera)
    binning = bin_splats(proj, camera.width, camera.height, config)
    rpal.INTERPRET = True
    try:
        img = rpal.rasterize_tiles_pallas(
            proj, camera.width, camera.height, config
        )
    finally:
        rpal.INTERPRET = False
    np.testing.assert_array_equal(np.asarray(img), 0.0)


def test_overflow_truncation_is_reported_not_silent(scene, camera):
    # Under pair-budget overflow the fused and two-stage paths truncate
    # different pairs (splat-major vs depth-major generation) — the frame is
    # wrong either way, so what matters is that BOTH report the overflow.
    from unitygaussiansplatting_tpu.models.renderer import render_with_stats

    cfg = RasterizeConfig(pair_multiplier=0.5)
    rpal.INTERPRET = True
    try:
        for backend in ("jax", "pallas"):
            _, stats = render_with_stats(scene, camera, config=cfg, backend=backend)
            assert bool(stats.overflowed), backend
    finally:
        rpal.INTERPRET = False


def test_pack_axes_f16_matches_xla(scene, camera):
    # With axes packing on, the fused path's f16 round-trip must equal the
    # XLA path's (both quantize via quantize_view_fp16).
    config = RasterizeConfig(pack_axes_f16=True)
    proj = project_splats(scene, camera)
    binning = bin_splats(proj, camera.width, camera.height, config)
    ref = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
    rpal.INTERPRET = True
    try:
        got = rpal.rasterize_tiles_pallas(proj, camera.width, camera.height, config)
    finally:
        rpal.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)
