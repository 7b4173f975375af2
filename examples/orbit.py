"""Demo: viewer-style camera orbit — render a turntable PNG sequence.

    python examples/orbit.py out_dir [--n 2000000] [--frames 24]
    python examples/orbit.py out_dir --ply scene.ply --frames 60

The offline analog of the reference's interactive viewer camera
(GaussianSplatRenderer.cs `ActivateCamera` + the Unity scene's orbiting
editor camera): one jitted render function is compiled once and replayed
per frame with only the camera pose changing (the pose enters as traced
arrays, so the orbit never recompiles — the TPU equivalent of the
reference's per-frame constant-buffer update).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unitygaussiansplatting_tpu import Camera, RenderSettings
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig
from unitygaussiansplatting_tpu.utils.image import save_png
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--ply", default=None, help="render this file instead of the synthetic scene")
    p.add_argument("--n", type=int, default=200_000, help="synthetic splat count")
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--radius", type=float, default=3.0)
    p.add_argument("--sh-order", type=int, default=3)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.ply:
        from unitygaussiansplatting_tpu.io.bridge import input_splats_to_gaussians
        from unitygaussiansplatting_tpu.io.ply import read_ply

        g = input_splats_to_gaussians(read_ply(args.ply)).activate()
        center = np.asarray(g.means).mean(axis=0)
    else:
        g = sphere_scene(n=args.n, seed=0).activate()
        center = np.zeros(3, np.float32)
    g = jax.device_put(g)

    settings = RenderSettings(sh_order=args.sh_order)
    config = RasterizeConfig()
    base = Camera.look_at(
        eye=center + np.asarray([0.0, 0.6, -args.radius], np.float32),
        target=center, up=[0, 1, 0], fov_y_deg=47.0,
        width=args.width, height=args.height,
    )

    # The pose enters through the traced view matrix: one compile, N frames.
    @jax.jit
    def frame(gg, view):
        cam = dataclasses.replace(base, view=view)
        return render(gg, cam, settings, config, backend="pallas")

    def orbit_view(theta: float) -> jnp.ndarray:
        eye = center + args.radius * np.asarray(
            [np.sin(theta), 0.2, -np.cos(theta)], np.float32
        )
        cam = Camera.look_at(
            eye=eye, target=center, up=[0, 1, 0], fov_y_deg=47.0,
            width=args.width, height=args.height,
        )
        return cam.view

    img = jax.block_until_ready(frame(g, orbit_view(0.0)))  # compile
    t0 = time.perf_counter()
    for i in range(args.frames):
        theta = 2.0 * np.pi * i / args.frames
        img = frame(g, orbit_view(theta))
        save_png(os.path.join(args.out_dir, f"orbit_{i:04d}.png"), img)
    dt = (time.perf_counter() - t0) / args.frames * 1e3
    print(f"{args.frames} frames at {dt:.1f} ms/frame (incl. PNG encode) -> {args.out_dir}")


if __name__ == "__main__":
    main()
