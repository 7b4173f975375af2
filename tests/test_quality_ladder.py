"""End-to-end preset quality ladder (render PSNR vs lossless render).

The reference records a PSNR per quality preset (GaussianSplatAssetCreator
.cs:195-223: VeryLow 32.27 … High 57.77, measured on its own scene).  This
is the small-scale CI analog on the capture-statistics synthetic scene:
asserts the ladder is ordered and each preset clears a floor far below its
measured large-scale value (tools/tpu_jobs/460: Medium 48.99 / Low 47.85 /
VeryLow 41.16 dB at 2M splats) but far above a broken-codec render.
"""

import numpy as np
import pytest

from unitygaussiansplatting_tpu.io.asset import decode_asset, encode_asset
from unitygaussiansplatting_tpu.io.bridge import (
    gaussians_to_input_splats,
    input_splats_to_gaussians,
)
from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import captured_scene


def _psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def ladder():
    n = 20_000
    splats = gaussians_to_input_splats(captured_scene(n=n, seed=3).activate())
    cam = Camera.look_at(
        eye=[6.5, 2.2, -8.0], target=[0, 0.3, 0], up=[0, 1, 0],
        fov_y_deg=47.0, width=256, height=160,
    )
    cfg = RasterizeConfig(pair_multiplier=3.0)
    settings = RenderSettings(sh_order=3)
    ref = np.asarray(render(input_splats_to_gaussians(splats), cam, settings, cfg))

    out = {}
    for quality in ("very_low", "low", "medium", "high"):
        preset = F.QUALITY_PRESETS[quality]
        sh_indices = sh_table = None
        if F.is_cluster_format(preset.sh):
            from unitygaussiansplatting_tpu.io.kmeans import cluster_sh

            k = F.SH_CLUSTER_COUNT[preset.sh]
            table, idx = cluster_sh(splats.sh, k=k, seed=0, iters=64)
            sh_table, sh_indices = np.asarray(table), np.asarray(idx)
        asset = encode_asset(
            splats,
            pos_format=preset.pos,
            scale_format=preset.scale,
            color_format=preset.color,
            sh_format=preset.sh,
            sh_indices=sh_indices,
            sh_table=sh_table,
        )
        g = input_splats_to_gaussians(decode_asset(asset))
        img = np.asarray(render(g, cam, settings, cfg))
        # Marginal (per-splat) size: subtract the fixed cluster-table cost,
        # which at 20k splats would dominate and invert the ordering that
        # holds at the presets' design scale (millions of splats).
        table_bytes = (
            F.SH_CLUSTER_COUNT[preset.sh] * 48 * 2
            if F.is_cluster_format(preset.sh)
            else 0
        )
        out[quality] = (
            _psnr(img[..., :3], ref[..., :3]),
            asset.total_bytes() - table_bytes,
        )
    return out, splats.count


def test_ladder_is_ordered(ladder):
    psnr, _ = ladder[0], ladder[1]
    vals = {q: p for q, (p, _) in ladder[0].items()}
    # 1 dB slack: clustering randomness can locally flip near-equal rungs.
    assert vals["high"] >= vals["medium"] - 1.0, vals
    assert vals["medium"] >= vals["low"] - 1.0, vals
    assert vals["low"] >= vals["very_low"] - 1.0, vals


def test_ladder_floors(ladder):
    vals = {q: p for q, (p, _) in ladder[0].items()}
    # Floors ~10 dB under the measured 2M-scale numbers: a silently broken
    # codec (wrong chunk dequant, bad BC7 packing, SH table corruption)
    # lands in the teens.
    assert vals["very_low"] > 28.0, vals
    assert vals["low"] > 32.0, vals
    assert vals["medium"] > 35.0, vals
    assert vals["high"] > 40.0, vals


def test_ladder_sizes_shrink(ladder):
    # Marginal (table-subtracted) per-splat storage must strictly shrink
    # down the ladder; ratios in the reference's recorded neighborhoods
    # (18.62x / 14.01x / 5.14x / 2.94x) — generous brackets.
    sizes = {q: s for q, (_, s) in ladder[0].items()}
    n = ladder[1]
    raw = n * 248
    assert sizes["very_low"] < sizes["low"] < sizes["medium"] < sizes["high"]
    assert raw / sizes["very_low"] > 14.0
    assert raw / sizes["medium"] > 4.0
