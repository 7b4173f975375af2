"""Utilities: configuration, synthetic scenes, imaging, profiling."""

from .config import RasterizeConfig, RenderSettings

__all__ = ["RasterizeConfig", "RenderSettings"]
