"""Training tests: loss functions and end-to-end fitting."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.models.trainer import (
    fit,
    photometric_loss,
    ssim,
)
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


@pytest.fixture(scope="module")
def camera():
    return Camera.look_at(
        eye=[0, 0.3, -2.8], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=64, height=48,
    )


# Small static work caps keep the CPU-autodiff train steps fast.
LEAN = RasterizeConfig(tile_h=8, chunk_size=32, max_pairs_per_tile=512)


class TestSSIM:
    def test_identical_images(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        assert float(ssim(img, img)) > 0.999

    def test_different_images(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        assert float(ssim(a, b)) < 0.5

    def test_loss_zero_at_target(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        assert float(photometric_loss(img, img)) < 1e-6


class TestFit:
    def test_fit_recovers_target(self, camera):
        # Render a target from one cloud, fit a perturbed cloud toward it.
        settings = RenderSettings(sh_order=0)
        config = LEAN
        target_raw = sphere_scene(n=120, seed=7, sh_bands=False)
        rt = render(target_raw.activate(), camera, settings, config)
        target = rt[..., :3]

        import dataclasses

        rng = np.random.default_rng(8)
        start = dataclasses.replace(
            target_raw,
            sh0=target_raw.sh0 + 0.7 * rng.normal(size=target_raw.sh0.shape).astype(np.float32),
            opacity_logits=target_raw.opacity_logits * 0.5,
        )
        fitted, losses = fit(
            start, camera, target, steps=130,
            settings=settings, config=config, ssim_weight=0.0,
        )
        assert losses[-1] < losses[0] * 0.5, f"loss {losses[0]} -> {losses[-1]}"

    def test_fit_moves_positions(self, camera):
        settings = RenderSettings(sh_order=0)
        config = LEAN
        target_raw = sphere_scene(n=80, seed=9, sh_bands=False)
        rt = render(target_raw.activate(), camera, settings, config)
        target = rt[..., :3]

        import dataclasses

        start = dataclasses.replace(
            target_raw, means=target_raw.means + np.float32(0.05)
        )
        import optax

        fitted, losses = fit(
            start, camera, target, steps=50,
            optimizer=optax.adam(2e-3),
            settings=settings, config=config, ssim_weight=0.0,
        )
        d_before = np.abs(np.asarray(start.means) - np.asarray(target_raw.means)).mean()
        d_after = np.abs(np.asarray(fitted.means) - np.asarray(target_raw.means)).mean()
        assert losses[-1] < losses[0]
        assert d_after < d_before  # positions moved toward the target


def test_train_step_pallas_backend(camera):
    # Training through the hand-written Pallas forward + backward kernels
    # (interpret mode on CPU): loss decreases like the XLA backend.
    import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
    from unitygaussiansplatting_tpu.models.trainer import (
        default_optimizer,
        make_train_step,
    )
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    truth = sphere_scene(n=300, seed=7).activate()
    target = np.asarray(
        render(truth, camera, RenderSettings(sh_order=0), RasterizeConfig(chunk_size=32))[..., :3]
    )
    raw = sphere_scene(n=200, seed=8)
    opt = default_optimizer(lr_means=1e-3, lr_rest=1e-2)
    step = make_train_step(
        camera, opt, settings=RenderSettings(sh_order=0),
        config=RasterizeConfig(chunk_size=32), backend="pallas", ssim_weight=0.0,
    )
    opt_state = opt.init(raw)
    rpal.INTERPRET = True
    try:
        losses = []
        for _ in range(8):
            loss, raw, opt_state = step(raw, opt_state, target)
            losses.append(float(loss))
    finally:
        rpal.INTERPRET = False
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_official_optimizer_trains():
    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.trainer import fit, official_3dgs_optimizer
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    raw = sphere_scene(n=128, seed=4)
    cam = Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=64, height=32,
    )
    target = jnp.full((32, 64, 3), 0.25)
    opt = official_3dgs_optimizer(scene_extent=2.0, total_steps=40)
    _, losses = fit(raw, cam, target, steps=40, optimizer=opt)
    assert losses[-1] < losses[0]
