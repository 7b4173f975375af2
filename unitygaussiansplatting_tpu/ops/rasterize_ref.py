"""Reference rasterizer: exact, slow, differentiable. The test oracle.

Replicates the reference's draw semantics — global depth sort then
front-to-back "under" compositing of screen-space quads
(package/Shaders/RenderGaussianSplats.shader:35-108 with blend
OneMinusDstAlpha/One) — as a single ``lax.scan`` over splats carrying the
per-pixel transmittance.  O(N * H * W): use for small scenes and golden tests
only; the production path is the tile rasterizer (rasterize_tiles.py), which
must match this to float tolerance.

Per-pixel math mirrors the fragment shader exactly: the splat is evaluated in
its eigen-axis coordinates (qx, qy), alpha = exp(-(qx^2+qy^2)) * opacity =
exp(-0.5 d^T Sigma2D^-1 d) * opacity (axes have length sqrt(2*lambda)),
clipped to the |q| <= 2 quad and discarded below 1/255
(RenderGaussianSplats.shader:54-55,81-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import RasterizeConfig
from .projection import ProjectedSplats


def _pixel_centers(width: int, height: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    return jnp.meshgrid(xs, ys, indexing="xy")  # (H, W) each


def splat_alpha_map(
    center: jnp.ndarray,
    axis1: jnp.ndarray,
    axis2: jnp.ndarray,
    opacity: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    config: RasterizeConfig,
) -> jnp.ndarray:
    """Alpha of one splat at every pixel center; (H, W).

    Quad-clipped Gaussian falloff, identical to the fragment shader
    (RenderGaussianSplats.shader:79-104).
    """
    dx = px - center[0]
    dy = py - center[1]
    # Eigen-axis coordinates: axes are orthogonal with |axis|^2 = 2*lambda.
    a1_sq = jnp.maximum(axis1 @ axis1, 1e-12)
    a2_sq = jnp.maximum(axis2 @ axis2, 1e-12)
    # Reciprocal-multiply form (axis/|axis|^2 divided once per splat, not per
    # pixel) — must match tile_common.chunk_alphas and the Pallas kernels
    # term-for-term so all backends stay bit-identical.
    qx = dx * (axis1[0] / a1_sq) + dy * (axis1[1] / a1_sq)
    qy = dx * (axis2[0] / a2_sq) + dy * (axis2[1] / a2_sq)
    # Reference quad coords span [-2, 2] and power = -(qx^2 + qy^2)
    # (RenderGaussianSplats.shader:54-55,81) = -0.5 d^T Sigma^-1 d.
    power = -(qx * qx + qy * qy)
    alpha = jnp.exp(power) * opacity
    alpha = jnp.clip(alpha, 0.0, config.alpha_max)
    keep = alpha >= config.alpha_discard
    if config.quad_clip:
        keep &= (jnp.abs(qx) <= 2.0) & (jnp.abs(qy) <= 2.0)
    return jnp.where(keep, alpha, 0.0)


def rasterize_reference(
    proj: ProjectedSplats,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
) -> jnp.ndarray:
    """Composite all splats front-to-back; returns (H, W, 4) premultiplied RGBA.

    The output matches the reference's offscreen splat render target before the
    composite pass: rgb = sum of T_i * alpha_i * color_i, a = 1 - T_final
    (RenderGaussianSplats.shader blend + GaussianComposite.shader semantics).
    """
    from .tile_common import quantize_view_fp16

    proj = quantize_view_fp16(proj, config)
    px, py = _pixel_centers(width, height)

    # Framework-wide canonical compositing order: quantized depth key, ties
    # broken by splat index (stable) — identical to the tile pipelines'
    # fused sort key (binning.depth_key_bits).
    from .binning import depth_key_bits, quantize_depth, tile_grid

    tiles_x, tiles_y = tile_grid(width, height, config)
    db = depth_key_bits(tiles_x * tiles_y)
    dq = quantize_depth(proj.depth, db)
    order = jnp.argsort(
        jnp.where(proj.valid, dq, jnp.uint32(0xFFFFFFFF)), stable=True
    )
    centers = proj.center[order]
    axis1 = proj.axis1[order]
    axis2 = proj.axis2[order]
    colors = proj.color[order]
    opac = jnp.where(proj.valid, proj.opacity, 0.0)[order]

    def step(carry, splat):
        accum, transmittance = carry
        center, a1, a2, color, op = splat
        alpha = splat_alpha_map(center, a1, a2, op, px, py, config)
        contrib = transmittance * alpha
        accum = accum + contrib[..., None] * jnp.concatenate(
            [color, jnp.ones((1,), color.dtype)]
        )
        transmittance = transmittance * (1.0 - alpha)
        return (accum, transmittance), None

    accum0 = jnp.zeros((height, width, 4), jnp.float32)
    t0 = jnp.ones((height, width), jnp.float32)
    (accum, _), _ = jax.lax.scan(step, (accum0, t0), (centers, axis1, axis2, colors, opac))
    return accum
