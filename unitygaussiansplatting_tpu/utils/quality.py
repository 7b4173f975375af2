"""Quality probes for the lossy perf pack knobs.

The pack knobs in :class:`utils.config.RasterizeConfig` trade measured
image quality for sort-operand count; their caveats are scene-dependent
(e.g. ``pack_color_rgba8`` hard-saturates shaded rgb at 2.0 where the
reference's f16 SplatViewData preserves highlights,
SplatUtilities.compute:247-248).  These helpers measure the actual exposure
of a scene+camera to each caveat so the knobs can be enabled on evidence
instead of hope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.camera import Camera
from ..ops.projection import project_splats
from ..utils.config import RenderSettings


def rgba8_clip_fraction(
    gaussians,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
) -> dict:
    """Fraction of on-screen shaded color values outside rgba8's [0, 2] range.

    Returns ``{"clipped_high": f, "clipped_low": f, "max_color": f}`` over
    the valid (on-screen) splats' SH-shaded rgb.  ``clipped_low`` counts
    values below 0 only for completeness — SH shading already clamps at 0
    (GaussianSplatting.hlsl max(res, 0)), so it is 0 unless shading changes.
    A ``clipped_high`` above ~1e-3 means ``pack_color_rgba8`` will visibly
    flatten highlights on this scene; keep the f16 path there.
    """

    @jax.jit
    def probe(g):
        proj = project_splats(g, camera, settings)
        valid = proj.valid
        color = proj.color  # (N, 3) SH-shaded
        w = jnp.where(valid[:, None], 1.0, 0.0)
        total = jnp.maximum(jnp.sum(w) * 3.0, 1.0)
        hi = jnp.sum(jnp.where(valid[:, None] & (color > 2.0), 1.0, 0.0))
        lo = jnp.sum(jnp.where(valid[:, None] & (color < 0.0), 1.0, 0.0))
        mx = jnp.max(jnp.where(valid[:, None], color, -jnp.inf))
        return hi / total, lo / total, mx

    hi, lo, mx = probe(gaussians)
    return {
        "clipped_high": float(hi),
        "clipped_low": float(lo),
        "max_color": float(mx),
    }
