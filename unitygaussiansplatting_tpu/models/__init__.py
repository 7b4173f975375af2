"""Data models: gaussian clouds, cameras, renderer orchestration."""

from .camera import Camera
from .gaussians import Gaussians, RawGaussians, deactivate

__all__ = ["Camera", "Gaussians", "RawGaussians", "deactivate"]
