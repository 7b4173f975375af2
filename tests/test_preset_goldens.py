"""Per-preset goldens through the FULL creator import path (VERDICT r4 #6).

The reference records a PSNR per quality preset on its own scene
(GaussianSplatAssetCreator.cs:195-223: VeryLow 32.27 / Low 35.17 / Medium
47.46 / High 57.77 dB).  Two gates here:

1. Committed golden per preset: the PLY -> create_asset(quality) ->
   decode -> render image is pinned with the validator's reference
   thresholds (<= 50 diff pixels, GaussianSplatValidator.cs:118) — codec,
   Morton reorder, clustering and BC7 drift all trip it.
2. At-scale PSNR floors vs the reference's recorded preset values:
   docs/preset_ladder_r5.json (measured on the real chip at 2M splats via
   tools/tpu_jobs/923) must clear reference_value - 1 dB per preset.

Regenerate goldens after an INTENTIONAL renderer/codec change:

    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      python tests/test_preset_goldens.py --regen
"""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
LADDER_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "preset_ladder_r5.json",
)
# GaussianSplatAssetCreator.cs:195-223 (BASELINE.md).
REFERENCE_PRESET_PSNR = {
    "very_low": 32.27,
    "low": 35.17,
    "medium": 47.46,
    "high": 57.77,
}
PRESETS = ("very_low", "low", "medium", "high", "very_high")


def render_preset(quality: str) -> np.ndarray:
    """The full import user story: scene -> PLY bytes -> creator -> render."""
    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.io.asset import decode_asset
    from unitygaussiansplatting_tpu.io.bridge import (
        gaussians_to_input_splats,
        input_splats_to_gaussians,
    )
    from unitygaussiansplatting_tpu.io.creator import create_asset
    from unitygaussiansplatting_tpu.io.ply import write_ply
    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.renderer import render_over_background
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import captured_scene

    splats = gaussians_to_input_splats(captured_scene(n=20_000, seed=3).activate())
    cam = Camera.look_at(
        eye=[6.5, 2.2, -8.0], target=[0, 0.3, 0], up=[0, 1, 0],
        fov_y_deg=47.0, width=256, height=160,
    )
    with tempfile.TemporaryDirectory() as td:
        ply = os.path.join(td, "scene.ply")
        write_ply(ply, splats)
        asset = create_asset(
            ply, quality=quality, import_cameras=False,
            cluster_iters=64, seed=0,
        )
    g = input_splats_to_gaussians(decode_asset(asset))
    img = render_over_background(
        g, cam, jnp.zeros(3), RenderSettings(sh_order=3),
        RasterizeConfig(pair_multiplier=3.0),
    )
    return np.asarray(img)


def _golden_path(quality: str) -> str:
    return os.path.join(GOLDEN_DIR, f"preset_{quality}.png")


@pytest.mark.parametrize("quality", PRESETS)
def test_preset_render_matches_committed_golden(quality, tmp_path):
    from unitygaussiansplatting_tpu.utils.image import load_png
    from unitygaussiansplatting_tpu.validate import validate_image

    img = render_preset(quality)
    got8 = np.floor(np.clip(img[..., :3], 0, 1) * 255.0 + 0.5) / 255.0
    res = validate_image(
        got8, load_png(_golden_path(quality)),
        name=f"preset_{quality}", dump_folder=str(tmp_path),
    )
    assert res.passed, str(res)


def test_at_scale_ladder_clears_reference_recorded_values():
    # The committed record from the real-chip 2M-splat ladder run
    # (tools/tpu_jobs/923): every preset must clear the reference's recorded
    # PSNR - 1 dB at comparable scale.
    if not os.path.exists(LADDER_JSON):
        pytest.skip("docs/preset_ladder_r5.json not generated yet "
                    "(run tools/tpu_jobs/923 on the chip)")
    with open(LADDER_JSON) as f:
        ladder = json.load(f)
    for quality, floor in REFERENCE_PRESET_PSNR.items():
        got = ladder["presets"][quality]["psnr_db"]
        assert got >= floor - 1.0, (
            f"{quality}: measured {got} dB < reference {floor} - 1"
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        from unitygaussiansplatting_tpu.utils.image import save_png

        for q in PRESETS:
            img = render_preset(q)
            save_png(_golden_path(q), img[..., :3])
            print(f"wrote {_golden_path(q)}")
    else:
        print(__doc__)
