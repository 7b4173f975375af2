"""Adaptive density control tests (host-side split/clone/prune)."""

import numpy as np
import pytest

from unitygaussiansplatting_tpu.models.densify import (
    densify,
    pad_to_capacity,
    prune,
    reset_opacity,
)
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


@pytest.fixture()
def raw():
    return sphere_scene(n=300, seed=4)


class TestPrune:
    def test_prunes_transparent(self, raw):
        import dataclasses

        raw2 = dataclasses.replace(raw, opacity_logits=raw.opacity_logits.copy())
        raw2.opacity_logits[:50] = -15.0  # ~0 opacity
        out = prune(raw2)
        assert out.num_splats == 250

    def test_prunes_huge(self, raw):
        import dataclasses

        raw2 = dataclasses.replace(raw, log_scales=raw.log_scales.copy())
        raw2.log_scales[:10] = 3.0
        out = prune(raw2, max_world_scale=1.0)
        assert out.num_splats == 290


class TestDensify:
    def test_clone_small(self, raw):
        grads = np.zeros((raw.num_splats, 3), np.float32)
        grads[:20] = 1.0  # hot
        # Make hot splats small -> cloned.
        raw.log_scales[:20] = np.log(0.001)
        out = densify(raw, grads, grad_threshold=0.5, scale_threshold=0.01)
        assert out.num_splats == raw.num_splats + 20

    def test_split_large(self, raw):
        grads = np.zeros((raw.num_splats, 3), np.float32)
        grads[:15] = 1.0
        raw.log_scales[:15] = np.log(0.5)  # big -> split into 2, parent removed
        out = densify(raw, grads, grad_threshold=0.5, scale_threshold=0.01)
        assert out.num_splats == raw.num_splats + 15  # +2 children -1 parent
        # Children are smaller than parents.
        assert np.exp(out.log_scales).max() < 0.5

    def test_cold_unchanged(self, raw):
        grads = np.zeros((raw.num_splats, 3), np.float32)
        out = densify(raw, grads)
        assert out.num_splats == raw.num_splats


class TestMisc:
    def test_reset_opacity(self, raw):
        out = reset_opacity(raw, ceiling=0.01)
        op = 1 / (1 + np.exp(-np.asarray(out.opacity_logits)))
        assert op.max() <= 0.011

    def test_pad_to_capacity_renders_same(self, raw):
        from unitygaussiansplatting_tpu.models.renderer import render
        from unitygaussiansplatting_tpu.utils.config import RasterizeConfig

        cam = Camera.look_at(
            eye=[0, 0, -2.6], target=[0, 0, 0], up=[0, 1, 0],
            fov_y_deg=45.0, width=96, height=64,
        )
        cfg = RasterizeConfig(tile_h=8, chunk_size=32, max_pairs_per_tile=1024)
        img_a = render(raw.activate(), cam, config=cfg)
        padded = pad_to_capacity(raw, 512)
        assert padded.num_splats == 512
        img_b = render(padded.activate(), cam, config=cfg)
        np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-5)
