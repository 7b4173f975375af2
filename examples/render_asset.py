"""Demo: the complete user story — import a splat file, render it.

    python examples/render_asset.py scene.ply out.png [--quality medium]
    python examples/render_asset.py scene.asset.json out.png --camera 0

Accepts a raw .ply/.spz (imported on the fly) or a saved .asset.json
(previously produced by `python -m unitygaussiansplatting_tpu.io.creator`).
Uses an imported cameras.json camera when available, else an orbit camera
framing the scene bounds.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from unitygaussiansplatting_tpu import Camera, RenderSettings
from unitygaussiansplatting_tpu.io.asset import decode_asset, load_asset
from unitygaussiansplatting_tpu.io.bridge import input_splats_to_gaussians
from unitygaussiansplatting_tpu.io.creator import create_asset
from unitygaussiansplatting_tpu.models.renderer import render_over_background
from unitygaussiansplatting_tpu.utils.image import save_png


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", help=".ply / .spz / .asset.json")
    p.add_argument("output", help="output PNG path")
    p.add_argument("-q", "--quality", default="medium")
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--height", type=int, default=797)
    p.add_argument("--fov", type=float, default=47.0)
    p.add_argument("--camera", type=int, default=None, help="imported camera index")
    p.add_argument("--sh-order", type=int, default=3)
    p.add_argument("--backend", default="pallas", choices=["pallas", "jax", "reference"])
    p.add_argument(
        "--host-decode",
        action="store_true",
        help="decode to float splats on the host instead of rendering from "
        "the compressed blobs on device",
    )
    args = p.parse_args()

    if args.input.endswith(".asset.json"):
        asset = load_asset(args.input)
    else:
        asset = create_asset(args.input, quality=args.quality)
    if args.host_decode:
        cloud = input_splats_to_gaussians(decode_asset(asset))
        print(f"{asset.splat_count} splats, {asset.total_bytes() / 1e6:.1f} MB asset (host decode)")
    else:
        # Device-side per-frame decode from the quantized blobs — the
        # reference's LoadSplatData path (1.3 GB VRAM story, readme.md:84).
        from unitygaussiansplatting_tpu.io.device_asset import device_asset_from_asset

        cloud = device_asset_from_asset(asset)
        print(
            f"{asset.splat_count} splats, {asset.total_bytes() / 1e6:.1f} MB asset, "
            f"{cloud.device_bytes() / 1e6:.1f} MB device-resident"
        )

    if args.camera is not None and asset.cameras:
        cam = Camera.from_camera_info(
            asset.cameras[args.camera], args.width, args.height, args.fov
        )
    else:
        center = (asset.bounds_min + asset.bounds_max) / 2
        extent = float(np.linalg.norm(asset.bounds_max - asset.bounds_min))
        eye = center + np.array([0.0, 0.25 * extent, -0.9 * extent], np.float32)
        cam = Camera.look_at(eye, center, [0, 1, 0], args.fov, args.width, args.height)

    img = render_over_background(
        cloud, cam, jnp.zeros(3),
        settings=RenderSettings(sh_order=args.sh_order), backend=args.backend,
    )
    save_png(args.output, np.clip(np.asarray(img[..., :3]), 0, 1))
    print("wrote", args.output)


if __name__ == "__main__":
    main()
