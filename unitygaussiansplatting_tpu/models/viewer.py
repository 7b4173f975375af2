"""Interactive-viewer frame loop with frame-coherent reuse.

The reference amortizes sorting across frames with ``m_SortNthFrame``
(GaussianSplatRenderer.cs:238-239 sorts only every Nth frame, keeping a
slightly stale depth order between sorts at some popping-artifact cost).
That trick has NO sound analog in this pipeline, and the reasoning is a
design fact worth keeping explicit:

- The reference's sort produces only per-splat *order*; tile/pixel
  membership is recomputed every frame by the hardware rasterizer, so a
  stale order still yields a fresh (just mis-ordered) image.
- Here membership and order ride ONE fused key sort
  (ops/pair_expand.bin_and_prepare): the sorted pair fields carry absolute
  pixel-space geometry, so reusing any stale prep reproduces the stale
  *image* bit-for-bit rather than a fresh image with stale order.
- Rebuilding fresh fields under a stale pair permutation needs K-sized
  gathers (~8 ns/index: ~190 ms for one (K,) row at bicycle scale, x10
  field rows, or a 42x lane-padded (K, 16) row gather) — strictly worse
  than re-running the ~210 ms fused sort.  Measured laws in CLAUDE.md;
  banked in docs/architecture.md.

What frame coherence DOES buy on TPU is exactness-preserving reuse:
identical (scene, camera, settings) frames are free, and an interactive
viewer spends most wall-clock time with an idle camera.  ViewerSession
implements that: a one-deep memo of the last frame keyed on the traced
inputs' content, returning the cached image without touching the chip.
Everything else (any pose/settings/scene delta) is a full fresh frame from
the one pre-compiled jitted function — pose and display settings enter as
traced arrays, so motion never recompiles (the analog of the reference's
per-frame constant-buffer update).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import RasterizeConfig, RenderSettings
from .camera import Camera
from .renderer import render


@dataclasses.dataclass
class ViewerStats:
    frames: int = 0
    rendered: int = 0
    reused: int = 0


class ViewerSession:
    """Viewer-style frame loop: one compile, cached identical frames.

    >>> sess = ViewerSession(gaussians, base_camera, backend="pallas")
    >>> img = sess.frame(view=cam.view)                   # full render
    >>> img = sess.frame(view=cam.view)                   # cache hit, free
    >>> img = sess.frame(view=cam2.view, opacity_scale=2) # full render
    """

    def __init__(
        self,
        gaussians,
        camera: Camera,
        settings: RenderSettings = RenderSettings(),
        config: RasterizeConfig = RasterizeConfig(),
        backend: str = "pallas",
    ):
        self._g = gaussians
        self._camera = camera
        self._settings = settings
        self.stats = ViewerStats()
        self._cache_key: bytes | None = None
        self._cache_img: jnp.ndarray | None = None

        @jax.jit
        def _frame(g, view, splat_scale, opacity_scale):
            cam = dataclasses.replace(camera, view=view)
            s = dataclasses.replace(
                settings, splat_scale=splat_scale, opacity_scale=opacity_scale
            )
            return render(g, cam, s, config, backend=backend)

        self._fn = _frame

    def _key(self, view, splat_scale, opacity_scale) -> bytes:
        return (
            np.asarray(view, np.float32).tobytes()
            + np.float32(splat_scale).tobytes()
            + np.float32(opacity_scale).tobytes()
        )

    def frame(
        self,
        view: jnp.ndarray | None = None,
        splat_scale: float = 1.0,
        opacity_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Render (or reuse) the frame for this pose + display settings."""
        view = self._camera.view if view is None else view
        self.stats.frames += 1
        key = self._key(view, splat_scale, opacity_scale)
        if key == self._cache_key and self._cache_img is not None:
            self.stats.reused += 1
            return self._cache_img
        img = self._fn(
            self._g,
            jnp.asarray(view, jnp.float32),
            jnp.float32(splat_scale),
            jnp.float32(opacity_scale),
        )
        self.stats.rendered += 1
        self._cache_key = key
        self._cache_img = img
        return img

    def invalidate(self) -> None:
        """Drop the frame cache (call after editing the splat cloud)."""
        self._cache_key = None
        self._cache_img = None

    def update_gaussians(self, gaussians) -> None:
        """Swap the scene (edits/training step); invalidates the cache."""
        self._g = gaussians
        self.invalidate()
