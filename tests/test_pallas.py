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


@pytest.mark.parametrize(
    "config",
    [
        RasterizeConfig(pack_axes_f16=True),
        RasterizeConfig(pack_color_rgba8=True),
        RasterizeConfig(pack_axes_f16=True, pack_color_rgba8=True),
        RasterizeConfig(pack_axes_u32=True),
        RasterizeConfig(pack_axes_u32=True, pack_color_rgba8=True),
    ],
    ids=["axes-f16", "color-rgba8", "axes+rgba8", "axes-u32",
         "axes-u32+rgba8"],
)
def test_pack_knobs_match_xla(scene, camera, config):
    # With packing knobs on, the fused path's quantize/pack/unpack round
    # trip must equal the XLA path's (both quantize via quantize_view_fp16,
    # and the u32 payload packing must be lossless on the lattice).
    proj = project_splats(scene, camera)
    binning = bin_splats(proj, camera.width, camera.height, config)
    ref = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
    rpal.INTERPRET = True
    try:
        got = rpal.rasterize_tiles_pallas(proj, camera.width, camera.height, config)
    finally:
        rpal.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_rgba8_gradients_pass_straight_through(scene, camera):
    # The RGBA8 quantizer must not zero gradients (round() alone would):
    # grads through the quantized render stay finite and comparable to the
    # unquantized path's.
    import jax

    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.utils.config import RenderSettings

    def loss(g, cfg):
        return jnp.mean(render(g, camera, RenderSettings(sh_order=0), cfg))

    g8 = jax.grad(lambda g: loss(g, RasterizeConfig(pack_color_rgba8=True)))(scene)
    gf = jax.grad(lambda g: loss(g, RasterizeConfig()))(scene)
    n8 = float(jnp.linalg.norm(g8.base_color))
    nf = float(jnp.linalg.norm(gf.base_color))
    assert np.isfinite(n8) and n8 > 0
    assert 0.5 < n8 / nf < 2.0, (n8, nf)


@pytest.mark.parametrize("mult", [4.0, 0.5], ids=["normal", "truncated"])
def test_run_window_invariant(scene, camera, mult):
    # The run-reduce kernel (rasterize_pallas_bwd._run_reduce) silently
    # drops any pair whose splat id falls outside its window's [b*C,
    # b*C + 2C) id range (all-zero one-hot column, ADVICE r4).  The range
    # is guaranteed by pair_expand's non-empty-run slot accounting
    # (counts_slots = max(counts, 1)); this checks the chain numerically,
    # including under budget truncation (run offsets clipped to K).
    from unitygaussiansplatting_tpu.ops.binning import cdiv
    from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare

    config = RasterizeConfig(pair_multiplier=mult)
    proj = project_splats(scene, camera)
    binning, _, _ = bin_and_prepare(
        proj, camera.width, camera.height, config, interpret=True
    )
    n = int(proj.depth.shape[0])
    k = int(binning.pair_rank.shape[0])
    c = 512  # pair_gradients_to_splats reduce_chunk default
    splat_sorted = np.sort(np.asarray(binning.pair_rank))
    offsets_core = np.minimum(
        np.concatenate([[0], np.cumsum(np.asarray(binning.rank_counts))]), k
    ).astype(np.int64)
    # Replicate _run_reduce's r0 derivation exactly.
    npad = cdiv(n + 1, c) * c
    boundaries = np.full((npad + c,), np.iinfo(np.int32).max, np.int64)
    boundaries[: n + 1] = offsets_core
    starts = np.arange(k // c) * c
    r0 = np.clip(np.searchsorted(boundaries, starts, side="right") - 1, 0, npad - 1)
    b = r0 // c
    ids = splat_sorted.reshape(k // c, c)
    lo = (b * c)[:, None]
    assert ((ids >= lo) & (ids < lo + 2 * c)).all(), (
        "splat id outside its run-reduce window — a gradient would be "
        "silently dropped"
    )


def test_axes_u32_with_center_pack_close(scene, camera):
    # pack_center_u32 is lossy by design (pallas-internal), so the combined
    # bench knob set is gated at the TestPackCenter tolerances instead of
    # exact agreement: the axis lattice must not widen the center-quant
    # error band.
    from unitygaussiansplatting_tpu.models.renderer import render

    base_cfg = RasterizeConfig(pair_multiplier=16.0, pack_axes_u32=True,
                               pack_color_rgba8=True)
    packed_cfg = RasterizeConfig(pair_multiplier=16.0, pack_axes_u32=True,
                                 pack_color_rgba8=True, pack_center_u32=True)
    base = render(scene, camera, config=base_cfg, backend="pallas")
    packed = render(scene, camera, config=packed_cfg, backend="pallas")
    d = np.abs(np.asarray(packed) - np.asarray(base))
    assert d.max() < 0.05, d.max()
    assert d.mean() < 5e-4, d.mean()
    assert (d > 1e-2).mean() < 1e-3


def test_axes_u32_grads_finite_and_close(scene, camera):
    import jax

    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    raw = sphere_scene(n=600, seed=2)

    def loss(r, cfg):
        return jnp.mean(render(r.activate(), camera, config=cfg, backend="pallas"))

    g0 = jax.grad(lambda r: loss(r, RasterizeConfig()))(raw)
    g1 = jax.grad(lambda r: loss(r, RasterizeConfig(pack_axes_u32=True)))(raw)
    for f in ("means", "log_scales", "opacity_logits", "sh0"):
        a, b = np.asarray(getattr(g0, f)), np.asarray(getattr(g1, f))
        assert np.isfinite(b).all(), f
        rel = np.abs(b - a).max() / max(np.abs(a).max(), 1e-12)
        assert rel < 0.05, (f, rel)  # straight-through: small lattice skew only
