"""Shared per-tile compositing math for the XLA and Pallas rasterizer paths.

The TPU-native inner loop: instead of blending one splat at a time (the
reference's hardware blend, RenderGaussianSplats.shader:10-12), a *chunk* of C
depth-ordered splats is processed together —

- alpha of all C splats at all tile pixels: one (C, P) VPU evaluation,
- per-pixel transmittance prefix within the chunk: cumulative product along C,
- color accumulation: a (P, C) x (C, 3) matmul on the MXU.

Both rasterize_tiles_jax (pure XLA) and the Pallas kernel call these
functions, so the two paths are bit-compatible by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import RasterizeConfig


def _f16_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round f32 through f16, flushing f16-subnormals (|x| < 2^-14) to zero.

    The flush keeps the value set exactly {normal f16} ∪ {0}, so the
    expansion kernel can re-derive the 16-bit pattern from the f32 bits with
    integer ops alone (Mosaic has no f32->f16 conversion); sub-2^-14 alphas,
    axis components and colors are visually nil (alpha_discard is 1/255).
    """
    r = x.astype(jnp.float16).astype(jnp.float32)
    return jnp.where(jnp.abs(r) < 6.103515625e-05, 0.0, r)


def _unorm8_round(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Round to the k/scale 8-bit lattice with straight-through gradients.

    round() has zero gradient a.e., which would sever training through the
    quantized color path; the straight-through estimator keeps the
    quantizer an identity for the backward pass (standard practice for
    trained quantization).
    """
    q = jnp.round(jnp.clip(x, 0.0, 255.0 / scale) * scale) / scale
    return x + jax.lax.stop_gradient(q - x)


# pack_axes_u32 lattice: screen-axis pair as (theta 12-bit, log2|a1| 10-bit,
# log2|a2| 10-bit).  The axes come from decompose_covariance2d, which
# guarantees a2 = |a2| * perp(a1_hat) with a FIXED handedness (axis2 =
# len2 * (v.y, -v.x)), so one angle + two lengths reconstructs both axes
# exactly orthogonal.  Length range [0.4469.., 4096] px is pinned by the
# decomposition itself (MIN_LAMBDA=0.1 -> len >= sqrt(0.2); MAX_AXIS_LEN).
_AX32_LO = -1.3219281  # log2(0.4), just under the sqrt(2*MIN_LAMBDA) floor
_AX32_STEP = (12.0 - _AX32_LO) / 1023.0  # to log2(MAX_AXIS_LEN)
_AX32_TWO_PI = 6.2831853071795864769


def axes_u32_codes(axis1: jnp.ndarray, axis2: jnp.ndarray):
    """(theta, n1, n2) integer codes (f32-exact values) of the axis pair."""
    a1x, a1y = axis1[..., 0], axis1[..., 1]
    n1 = jnp.sqrt(jnp.maximum(a1x * a1x + a1y * a1y, 1e-12))
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(axis2 * axis2, axis=-1), 1e-12))
    theta = jnp.arctan2(a1y, a1x)  # [-pi, pi]
    tc = jnp.round((theta + 3.14159265358979324) * (4096.0 / _AX32_TWO_PI))
    tc = jnp.where(tc >= 4096.0, 0.0, tc)  # theta == +pi wraps to -pi
    nc = lambda n: jnp.clip(
        jnp.round((jnp.log2(jnp.clip(n, 0.4, 4096.0)) - _AX32_LO) / _AX32_STEP),
        0.0, 1023.0,
    )
    scrub = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
    return scrub(tc), scrub(nc(n1)), scrub(nc(n2))


def decode_axes_u32(tc: jnp.ndarray, n1c: jnp.ndarray, n2c: jnp.ndarray):
    """Inverse of :func:`axes_u32_codes`; returns (a1x, a1y, a2x, a2y)."""
    theta = tc * (_AX32_TWO_PI / 4096.0) - 3.14159265358979324
    ct, st = jnp.cos(theta), jnp.sin(theta)
    n1 = jnp.exp2(_AX32_LO + n1c * _AX32_STEP)
    n2 = jnp.exp2(_AX32_LO + n2c * _AX32_STEP)
    return n1 * ct, n1 * st, n2 * st, -n2 * ct


def quantize_view_fp16(proj, config: RasterizeConfig):
    """Round projected color+opacity through fp16 when configured.

    Mirrors the reference's packed SplatViewData exactly (f32tof16 of color
    and opacity, SplatUtilities.compute:247-248).  Idempotent; called at the
    entry of every rasterizer path so all three backends see identical
    values (the fused pipeline then carries the f16 bits losslessly as
    packed u32 sort payloads).  With ``pack_color_rgba8`` the lattice is
    RGBA8 instead (rgb over [0, 2], opacity over [0, 1]) so the fused sort
    carries color+opacity in one u32.
    """
    if getattr(config, "pack_color_rgba8", False):
        proj = proj._replace(
            color=_unorm8_round(proj.color, 127.5),
            opacity=_unorm8_round(proj.opacity, 255.0),
        )
    elif config.pack_color_f16:
        proj = proj._replace(
            color=_f16_round(proj.color),
            opacity=_f16_round(proj.opacity),
        )
    if getattr(config, "pack_axes_u32", False):
        # One-u32 axis lattice (supersedes pack_axes_f16): straight-through
        # gradients like the color lattices.
        tc, n1c, n2c = axes_u32_codes(proj.axis1, proj.axis2)
        a1x, a1y, a2x, a2y = decode_axes_u32(tc, n1c, n2c)
        a1 = jnp.stack([a1x, a1y], axis=-1)
        a2 = jnp.stack([a2x, a2y], axis=-1)
        proj = proj._replace(
            axis1=proj.axis1 + jax.lax.stop_gradient(a1 - proj.axis1),
            axis2=proj.axis2 + jax.lax.stop_gradient(a2 - proj.axis2),
        )
    elif config.pack_axes_f16:
        proj = proj._replace(
            axis1=_f16_round(proj.axis1),
            axis2=_f16_round(proj.axis2),
        )
    return proj


def chunk_alphas(
    center: jnp.ndarray,  # (C, 2)
    axis1: jnp.ndarray,  # (C, 2)
    axis2: jnp.ndarray,  # (C, 2)
    opacity: jnp.ndarray,  # (C,)
    px: jnp.ndarray,  # (P,) pixel-center x
    py: jnp.ndarray,  # (P,) pixel-center y
    config: RasterizeConfig,
) -> jnp.ndarray:
    """Quad-clipped Gaussian alpha for C splats at P pixels; (C, P).

    Identical math to the fragment shader (RenderGaussianSplats.shader:79-104)
    and to rasterize_ref.splat_alpha_map, vectorized over the chunk.
    """
    dx = px[None, :] - center[:, 0:1]  # (C, P)
    dy = py[None, :] - center[:, 1:2]
    a1_sq = jnp.maximum(jnp.sum(axis1 * axis1, axis=-1, keepdims=True), 1e-12)
    a2_sq = jnp.maximum(jnp.sum(axis2 * axis2, axis=-1, keepdims=True), 1e-12)
    # Reciprocal-multiply form: the divide happens at per-splat (C, 1) scale,
    # the (C, P) work is pure FMA — a VPU divide costs ~10x an FMA and the
    # Pallas kernels use the identical term order (backends must agree).
    qx = dx * (axis1[:, 0:1] / a1_sq) + dy * (axis1[:, 1:2] / a1_sq)
    qy = dx * (axis2[:, 0:1] / a2_sq) + dy * (axis2[:, 1:2] / a2_sq)
    power = -(qx * qx + qy * qy)
    alpha = jnp.exp(power) * opacity[:, None]
    alpha = jnp.clip(alpha, 0.0, config.alpha_max)
    keep = alpha >= config.alpha_discard
    if config.quad_clip:
        keep &= (jnp.abs(qx) <= 2.0) & (jnp.abs(qy) <= 2.0)
    return jnp.where(keep, alpha, 0.0)


def composite_chunk(
    transmittance: jnp.ndarray,  # (P,) running per-pixel transmittance
    alphas: jnp.ndarray,  # (C, P) chunk alphas, depth-ordered along C
    colors: jnp.ndarray,  # (C, 3)
):
    """Fold one chunk into the running composite.

    Returns (rgb_contrib (P, 3), alpha_contrib (P,), new_transmittance (P,)).

    Front-to-back "under" compositing: weight of splat i is
    ``T_in * prod_{j<i}(1 - a_j) * a_i`` — the exclusive prefix product is a
    cumprod along the chunk axis, and the color sum is a single MXU matmul.
    """
    one_minus = 1.0 - alphas
    cum = jnp.cumprod(one_minus, axis=0)  # inclusive prefix (C, P)
    excl = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    w = excl * alphas * transmittance[None, :]  # (C, P)
    # Full precision: the TPU-default single-bf16-pass matmul rounds the
    # blend weights (~0.4% relative), visibly diverging from the Pallas
    # kernel's exact f32 VPU accumulation.
    rgb = jnp.dot(
        w.T, colors, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, 3)
    alpha_contrib = jnp.sum(w, axis=0)
    new_t = transmittance * cum[-1]
    return rgb, alpha_contrib, new_t
