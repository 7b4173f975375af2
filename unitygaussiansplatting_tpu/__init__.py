"""tpu-splat: a TPU-native differentiable 3D Gaussian splatting framework.

Built from scratch in JAX/Pallas with the capabilities of
aras-p/UnityGaussianSplatting (see SURVEY.md at the repo root), plus
differentiability and multi-chip sharding the reference lacks by design.
"""

from .models.camera import Camera
from .models.gaussians import Gaussians, RawGaussians
from .utils.config import RasterizeConfig, RenderSettings

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Gaussians",
    "RawGaussians",
    "RasterizeConfig",
    "RenderSettings",
    "__version__",
]
