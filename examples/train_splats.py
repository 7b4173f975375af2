"""Demo: fit a splat cloud to a rendered target image (differentiability demo).

Renders a target from a reference cloud, perturbs the cloud, then optimizes
it back with Adam through the differentiable rasterizer — the capability the
Unity reference lacks entirely.

Usage: python examples/train_splats.py [out_dir]
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.models.trainer import default_optimizer, make_train_step
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.image import psnr, save_png
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_splats"
    os.makedirs(out_dir, exist_ok=True)
    print("devices:", jax.devices())

    camera = Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=256, height=192,
    )
    settings = RenderSettings(sh_order=1)
    config = RasterizeConfig(tile_h=8, chunk_size=64, max_pairs_per_tile=2048)

    target_raw = sphere_scene(n=2000, seed=0)
    target = render(target_raw.activate(), camera, settings, config)[..., :3]
    save_png(os.path.join(out_dir, "target.png"), np.clip(np.asarray(target), 0, 1))

    rng = np.random.default_rng(1)
    start = dataclasses.replace(
        target_raw,
        means=target_raw.means + 0.03 * rng.normal(size=target_raw.means.shape).astype(np.float32),
        sh0=target_raw.sh0 + 0.5 * rng.normal(size=target_raw.sh0.shape).astype(np.float32),
    )
    img0 = render(start.activate(), camera, settings, config)[..., :3]
    save_png(os.path.join(out_dir, "start.png"), np.clip(np.asarray(img0), 0, 1))
    print(f"start PSNR: {psnr(np.asarray(img0), np.asarray(target)):.2f} dB")

    opt = default_optimizer(lr_means=2e-3, lr_rest=5e-3)
    step = make_train_step(camera, opt, settings, config, ssim_weight=0.2)
    opt_state = opt.init(start)
    raw = start
    t0 = time.time()
    for i in range(300):
        loss, raw, opt_state = step(raw, opt_state, target)
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.5f}")
    print(f"300 steps in {time.time()-t0:.1f}s")

    img1 = render(raw.activate(), camera, settings, config)[..., :3]
    save_png(os.path.join(out_dir, "fitted.png"), np.clip(np.asarray(img1), 0, 1))
    print(f"fitted PSNR: {psnr(np.asarray(img1), np.asarray(target)):.2f} dB")


if __name__ == "__main__":
    main()
