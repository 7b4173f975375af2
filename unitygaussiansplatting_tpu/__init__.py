"""tpu-splat: a TPU-native differentiable 3D Gaussian splatting framework.

Built from scratch in JAX/Pallas with the capabilities of
aras-p/UnityGaussianSplatting (see SURVEY.md at the repo root), plus
differentiability and multi-chip sharding the reference lacks by design.

Quick start::

    from unitygaussiansplatting_tpu import Camera, render
    from unitygaussiansplatting_tpu.io.creator import create_asset
    from unitygaussiansplatting_tpu.io.asset import decode_asset
    from unitygaussiansplatting_tpu.io.bridge import input_splats_to_gaussians

    asset = create_asset("scene.ply", quality="medium")
    cloud = input_splats_to_gaussians(decode_asset(asset))
    cam = Camera.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0], 45, 1200, 797)
    image = render(cloud, cam, backend="pallas")  # (H, W, 4) premult RGBA
"""

from .models.camera import Camera
from .models.gaussians import Gaussians, RawGaussians, deactivate
from .models.renderer import (
    GaussianSplatRenderer,
    RenderStats,
    check_overflow,
    render,
    render_multi,
    render_over_background,
    render_with_stats,
    suggest_pair_multiplier,
)
from .utils.config import RasterizeConfig, RenderSettings

__version__ = "0.2.0"

__all__ = [
    "Camera",
    "Gaussians",
    "RawGaussians",
    "deactivate",
    "GaussianSplatRenderer",
    "RenderStats",
    "check_overflow",
    "render",
    "render_multi",
    "render_over_background",
    "render_with_stats",
    "suggest_pair_multiplier",
    "RasterizeConfig",
    "RenderSettings",
    "__version__",
]
