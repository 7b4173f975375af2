"""Demo: full 3DGS training — multi-view fit with density control + checkpoints.

    python examples/train_full.py [out_dir]

Synthesizes a ground-truth splat scene, renders a ring of training views,
then trains a smaller randomly-initialized cloud against them with the full
loop (Adam, L1 + D-SSIM, periodic densify/prune, orbax checkpoints) and
reports PSNR before/after.  The reference has no training at all
(SURVEY.md §0) — this is the capability the TPU build adds on top of its
feature set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.models.training_loop import (
    TrainLoopConfig,
    load_checkpoint,
    psnr_of,
    train,
)
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


def ring_cameras(k: int, radius: float = 3.0, width: int = 160, height: int = 120):
    cams = []
    for i in range(k):
        a = 2 * np.pi * i / k
        eye = [radius * np.sin(a), 0.6, -radius * np.cos(a)]
        cams.append(
            Camera.look_at(eye, [0, 0, 0], [0, 1, 0], 45.0, width, height)
        )
    return cams


def main(out_dir: str = "/tmp/tpu_splat_train"):
    settings = RenderSettings(sh_order=1)
    config = RasterizeConfig()

    truth = sphere_scene(n=3000, seed=0).activate()
    cams = ring_cameras(6)
    targets = [np.asarray(render(truth, c, settings, config)[..., :3]) for c in cams]

    init = sphere_scene(n=800, seed=42)
    loop = TrainLoopConfig(
        steps=300,
        densify_every=80,
        densify_from=40,
        checkpoint_dir=out_dir,
        checkpoint_every=100,
        auto_budget_slack=1.3,  # size the pair budget from measured demand
    )
    # The released 3DGS per-parameter lr recipe, scaled to this scene.
    from unitygaussiansplatting_tpu.models.trainer import official_3dgs_optimizer

    extent = float(np.linalg.norm(np.asarray(truth.means), axis=1).max())
    opt = official_3dgs_optimizer(scene_extent=extent, total_steps=loop.steps)
    p0 = psnr_of(init, cams[0], targets[0], settings, config)
    trained, hist = train(init, cams, targets, loop, settings, config, optimizer=opt)
    p1 = psnr_of(trained, cams[0], targets[0], settings, config)
    print(f"PSNR view0: {p0:.2f} -> {p1:.2f} dB")
    print("splat counts:", hist["counts"])
    print("events:", hist["events"])

    restored, step = load_checkpoint(os.path.join(out_dir, "ckpt_final"))
    p2 = psnr_of(restored, cams[0], targets[0], settings, config)
    print(f"restored checkpoint @step {step}: PSNR {p2:.2f} dB")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/tpu_splat_train"]))
