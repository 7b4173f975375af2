"""At-scale preset ladder vs the reference's recorded numbers (VERDICT r4 #6).

2M-splat captured-statistics scene through the FULL creator path (PLY ->
Morton reorder -> k-means SH clustering on chip -> quantize/BC7) per
quality preset; render PSNR of the decoded asset vs the lossless render at
the reference's headline resolution.  Writes docs/preset_ladder_r5.json,
gated by tests/test_preset_goldens.py against GaussianSplatAssetCreator
.cs:195-223 (VeryLow 32.27 / Low 35.17 / Medium 47.46 / High 57.77 dB).
"""
import gc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu"):
        sys.modules.pop(m)

import jax
import numpy as np

from unitygaussiansplatting_tpu.io.asset import decode_asset
from unitygaussiansplatting_tpu.io.bridge import (
    gaussians_to_input_splats,
    input_splats_to_gaussians,
)
from unitygaussiansplatting_tpu.io.creator import create_asset
from unitygaussiansplatting_tpu.io.ply import write_ply
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import captured_scene

N = 2_000_000
cam = Camera.look_at(eye=[6.5, 2.2, -8.0], target=[0, 0.3, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=1200, height=797)
cfg = RasterizeConfig(pair_multiplier=3.0)
settings = RenderSettings(sh_order=3)

splats = gaussians_to_input_splats(captured_scene(n=N, seed=3).activate())
ref_img = np.asarray(render(input_splats_to_gaussians(splats), cam, settings,
                            cfg, backend="pallas"))[..., :3]


def psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


out = {"presets": {}, "scene": f"captured_scene n={N} seed=3",
       "render": "1200x797 SH3 pallas vs lossless render",
       "provenance": "tools/tpu_jobs/923 run live on the v5e (r5)"}
with tempfile.TemporaryDirectory() as td:
    ply = os.path.join(td, "scene.ply")
    write_ply(ply, splats)
    for quality in ("very_low", "low", "medium", "high", "very_high"):
        t0 = time.time()
        asset = create_asset(ply, quality=quality, import_cameras=False,
                             cluster_iters=256, seed=0)
        enc_s = time.time() - t0
        g = input_splats_to_gaussians(decode_asset(asset))
        img = np.asarray(render(g, cam, settings, cfg,
                                backend="pallas"))[..., :3]
        p = psnr(img, ref_img)
        raw_bytes = splats.count * 248  # reference export struct size
        out["presets"][quality] = {
            "psnr_db": round(p, 2),
            "asset_bytes": asset.total_bytes(),
            "compression_x": round(raw_bytes / asset.total_bytes(), 2),
            "import_s": round(enc_s, 1),
        }
        print(f"{quality}: {p:.2f} dB, {asset.total_bytes()} B "
              f"({raw_bytes / asset.total_bytes():.2f}x), import {enc_s:.0f}s",
              flush=True)
        del asset, g, img
        gc.collect()

with open("/root/repo/docs/preset_ladder_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
del splats, ref_img
gc.collect(); jax.clear_caches(); gc.collect()
print("923 done", flush=True)
