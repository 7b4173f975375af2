"""Full training loop: multi-view + density control + orbax checkpoints.

Round-1 VERDICT item 9: trainer, densify/prune/opacity-reset and
pad_to_capacity composed into a demonstrated training run with durable
checkpointing — the capability ladder of SURVEY.md §7 stages 4-5.
"""

import numpy as np
import pytest

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.models.training_loop import (
    TrainLoopConfig,
    load_checkpoint,
    psnr_of,
    save_checkpoint,
    train,
)
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

SETTINGS = RenderSettings(sh_order=0)
CONFIG = RasterizeConfig(tile_h=8, chunk_size=32, max_pairs_per_tile=1024)


def _cams_targets(k=3, w=96, h=64):
    truth = sphere_scene(n=500, seed=0).activate()
    cams = []
    for i in range(k):
        a = 2 * np.pi * i / k
        cams.append(
            Camera.look_at(
                [3.0 * np.sin(a), 0.5, -3.0 * np.cos(a)], [0, 0, 0], [0, 1, 0],
                45.0, w, h,
            )
        )
    targets = [np.asarray(render(truth, c, SETTINGS, CONFIG)[..., :3]) for c in cams]
    return cams, targets


def test_full_training_loop_improves_and_densifies(tmp_path):
    cams, targets = _cams_targets()
    import optax

    init = sphere_scene(n=220, seed=9)
    loop = TrainLoopConfig(
        steps=120,
        densify_every=50,
        densify_from=30,
        densify_until=80,
        grad_threshold=5e-5,
        capacity_step=256,
        checkpoint_dir=str(tmp_path),
        checkpoint_every=60,
        ssim_weight=0.0,  # pure L1: cheap and monotone enough at toy scale
    )
    p0 = psnr_of(init, cams[0], targets[0], SETTINGS, CONFIG)
    # Toy-scale learning rates (the 3DGS defaults are tuned for real scenes
    # over tens of thousands of steps).
    trained, hist = train(
        init, cams, targets, loop, SETTINGS, CONFIG,
        optimizer=optax.adam(8e-3),
    )
    p1 = psnr_of(trained, cams[0], targets[0], SETTINGS, CONFIG)

    assert p1 > p0 + 0.5, f"PSNR did not improve: {p0:.2f} -> {p1:.2f}"
    # Density control ran and changed the live count sensibly.
    assert len(hist["counts"]) >= 2
    counts = [c for _, c in hist["counts"]]
    assert all(0 < c <= 10 * counts[0] for c in counts)
    assert any(e[1] == "densify+prune" for e in hist["events"])
    # Loss trend: end lower than start (averaged over a window).
    losses = hist["losses"]
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    # Checkpoints exist and restore losslessly.
    restored, step = load_checkpoint(str(tmp_path / "ckpt_final"))
    assert step == loop.steps
    for k in trained.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(restored, k)), np.asarray(getattr(trained, k)), err_msg=k
        )


def test_checkpoint_roundtrip(tmp_path):
    raw = sphere_scene(n=64, seed=3)
    save_checkpoint(str(tmp_path / "c1"), raw, 7)
    back, step = load_checkpoint(str(tmp_path / "c1"))
    assert step == 7
    for k in raw.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(back, k)), np.asarray(getattr(raw, k)), err_msg=k
        )


def test_optimizer_state_survives_densify():
    # The lr schedule and Adam moments must carry across densification
    # (the official trainer's cat_tensors_to_optimizer): the schedule count
    # keeps ticking and surviving splats keep nonzero moments.
    import jax.numpy as jnp
    import numpy as np

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.trainer import official_3dgs_optimizer
    from unitygaussiansplatting_tpu.models.training_loop import TrainLoopConfig, train
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    raw = sphere_scene(n=200, seed=7)
    cam = Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=64, height=48,
    )
    # Target differing from the render so gradients are substantial and
    # densification triggers.
    target = jnp.full((48, 64, 3), 0.8)
    loop = TrainLoopConfig(
        steps=12, densify_every=5, densify_from=1, grad_threshold=1e-7,
        capacity_step=256,
    )
    opt = official_3dgs_optimizer(scene_extent=1.5, total_steps=12)
    out, hist = train(
        raw, [cam], [target], loop,
        RenderSettings(sh_order=1), RasterizeConfig(tile_h=8, chunk_size=32),
        optimizer=opt,
    )
    assert np.isfinite(hist["losses"]).all()
    assert any(e[1] == "densify+prune" for e in hist["events"])


def test_overflow_recovery_grows_budget():
    """VERDICT r3 item 5: an undersized pair budget is GROWN mid-training
    (budget_grow event + re-jit) instead of silently truncating frames."""
    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.models.renderer import render_with_stats
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig

    cams, targets = _cams_targets(k=2, w=128, h=96)
    init = sphere_scene(n=1200, seed=9)
    # Deliberately undersized: demand is ~2k pairs at this scale while the
    # 0.4 multiplier yields pair_budget's 1024 floor, so the first budget
    # check must fire and grow it.
    config = RasterizeConfig(
        tile_h=8, chunk_size=32, max_pairs_per_tile=1024, pair_multiplier=0.4
    )
    loop = TrainLoopConfig(
        steps=40,
        densify_every=15,
        densify_from=5,
        grad_threshold=5e-5,
        capacity_step=256,
        budget_check_every=8,
        ssim_weight=0.0,
    )
    import optax

    trained, hist = train(
        init, cams, targets, loop, SETTINGS, config, optimizer=optax.adam(8e-3)
    )
    grows = [e for e in hist["events"] if e[1] == "budget_grow"]
    assert grows, f"no budget_grow event: {hist['events']}"
    new_mult = grows[-1][2]["new_multiplier"]
    assert new_mult > config.pair_multiplier
    # Rendering with the grown budget no longer truncates.
    grown = RasterizeConfig(
        tile_h=8, chunk_size=32, max_pairs_per_tile=1024,
        pair_multiplier=new_mult,
    )
    _, stats = render_with_stats(trained.activate(), cams[0], SETTINGS, grown)
    assert not bool(stats.overflowed)
    # And training still converged despite the mid-run re-jit.
    losses = hist["losses"]
    assert np.mean(losses[-8:]) < np.mean(losses[:8])


def test_no_opacity_reset_on_final_step():
    # A reset landing exactly on the last step returns a cratered cloud
    # (r5 demo: 34.8 -> 8.5 dB); the loop must skip it.
    import jax.numpy as jnp
    import numpy as np

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.models.training_loop import (
        TrainLoopConfig,
        train,
    )
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    cam = Camera.look_at(eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                         fov_y_deg=45.0, width=64, height=48)
    settings = RenderSettings(sh_order=0)
    config = RasterizeConfig(tile_h=8, chunk_size=32)
    truth = sphere_scene(n=300, seed=0).activate()
    target = np.asarray(render(truth, cam, settings, config)[..., :3])
    raw = sphere_scene(n=200, seed=1)
    loop = TrainLoopConfig(steps=6, densify_every=0, budget_check_every=0,
                           opacity_reset_every=3)
    trained, hist = train(raw, [cam], [jnp.asarray(target)], loop, settings, config)
    resets = [e for e in hist["events"] if e[1] == "opacity_reset"]
    assert [s for s, *_ in resets] == [3], resets  # step 6 (final) skipped
