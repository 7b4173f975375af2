"""Render orchestration: project -> sort/bin -> rasterize -> composite.

The TPU-side analog of the reference's CPU orchestration layer
(package/Runtime/GaussianSplatRenderer.cs:108-169 ``SortAndRenderSplats`` and
:579-639 CalcViewData/SortPoints): instead of recording command buffers, it
builds one jittable function over the whole frame and lets XLA schedule it.

Two rasterizer backends share identical semantics:
- ``backend="jax"``: pure-XLA tile pipeline (differentiable via autodiff),
- ``backend="reference"``: the O(N*H*W) oracle scan (tests/small scenes).
- ``backend="pallas"``: hand-written TPU kernel (fastest; custom VJP).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import composite as composite_ops
from ..ops.binning import bin_splats
from ..ops.projection import project_splats
from ..ops.rasterize_ref import rasterize_reference
from ..ops.rasterize_tiles import rasterize_tiles_jax
from ..utils.config import RasterizeConfig, RenderSettings
from .camera import Camera
from .gaussians import Gaussians


def render(
    gaussians: Gaussians,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    model: jnp.ndarray | None = None,
    kill_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render a splat cloud; returns (H, W, 4) premultiplied linear RGBA.

    The alpha channel is the accumulated coverage (1 - final transmittance),
    matching the reference's offscreen RT before its composite pass.
    """
    proj = project_splats(gaussians, camera, settings, model=model, kill_mask=kill_mask)
    if backend == "reference":
        return rasterize_reference(proj, camera.width, camera.height, config)
    if backend == "jax":
        binning = bin_splats(proj, camera.width, camera.height, config)
        return rasterize_tiles_jax(
            proj, binning, camera.width, camera.height, config
        )
    if backend == "pallas":
        from ..ops.rasterize_pallas import rasterize_tiles_pallas

        binning = bin_splats(proj, camera.width, camera.height, config)
        return rasterize_tiles_pallas(
            proj, binning, camera.width, camera.height, config
        )
    raise ValueError(f"unknown backend {backend!r}")


def render_over_background(
    gaussians: Gaussians,
    camera: Camera,
    background: jnp.ndarray,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    convert_gamma: bool = False,
) -> jnp.ndarray:
    """Full frame: splat RT composited over a background color/image.

    Mirrors GaussianSplatRenderSystem.OnPreCullCamera's RT + composite pass
    (GaussianSplatRenderer.cs:187-211).
    """
    rt = render(gaussians, camera, settings, config, backend)
    return composite_ops.composite_over(rt, background, convert_gamma=convert_gamma)


@partial(jax.jit, static_argnames=("backend",))
def _render_jit(gaussians, camera, settings, config, backend):
    return render(gaussians, camera, settings, config, backend)


@dataclasses.dataclass
class GaussianSplatRenderer:
    """Stateful convenience wrapper mirroring the reference's component API.

    Owns a cloud plus display settings (GaussianSplatRenderer.cs:215-251) and
    memoizes the jitted frame function.  The functional `render` above is the
    primary API; this class exists for interactive/driver use.
    """

    gaussians: Gaussians
    settings: RenderSettings = RenderSettings()
    config: RasterizeConfig = RasterizeConfig()
    backend: str = "jax"

    def render_frame(self, camera: Camera) -> jnp.ndarray:
        return _render_jit(self.gaussians, camera, self.settings, self.config, self.backend)
