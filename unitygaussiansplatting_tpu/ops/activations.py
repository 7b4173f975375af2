"""Scalar activation / warp functions shared between import and render.

TPU-native equivalents of the reference's scalar math helpers
(package/Runtime/GaussianUtils.cs:9-38 and
package/Shaders/GaussianSplatting.hlsl:5-11).  Pure jnp, elementwise,
differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.2820948  # matches GaussianUtils.cs:16


def sigmoid(v: jnp.ndarray) -> jnp.ndarray:
    """Logistic sigmoid (GaussianUtils.cs:9-12); raw PLY opacity -> [0,1]."""
    return 1.0 / (1.0 + jnp.exp(-v))


def inv_sigmoid(v: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Logit; used by PLY export (SplatUtilities.compute:541-544)."""
    v = jnp.clip(v, eps, 1.0 - eps)
    return jnp.log(v / (1.0 - v))


def sh0_to_color(dc0: jnp.ndarray) -> jnp.ndarray:
    """DC spherical-harmonic coefficient -> base color (GaussianUtils.cs:14-18)."""
    return dc0 * SH_C0 + 0.5


def color_to_sh0(col: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`sh0_to_color` for export."""
    return (col - 0.5) / SH_C0


def linear_scale(log_scale: jnp.ndarray) -> jnp.ndarray:
    """Raw PLY log-scale -> linear scale (GaussianUtils.cs:20-23)."""
    return jnp.abs(jnp.exp(log_scale))


def square_centered01(x: jnp.ndarray) -> jnp.ndarray:
    """Opacity warp applied before chunk quantization (GaussianUtils.cs:25-30).

    Signed square around 0.5; spends more precision near 0 and 1.
    """
    x = x - 0.5
    x = x * x * jnp.sign(x)
    return x * 2.0 + 0.5


def inv_square_centered01(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse warp applied at decode time (GaussianSplatting.hlsl:5-11)."""
    x = x - 0.5
    x = x * 0.5
    x = jnp.sqrt(jnp.abs(x)) * jnp.sign(x)
    return x + 0.5
