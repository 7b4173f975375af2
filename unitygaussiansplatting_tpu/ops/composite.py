"""Final compositing of the splat render target over a background.

Equivalent of the reference's fullscreen composite pass
(package/Shaders/GaussianComposite.shader:35-39): un-premultiply, optional
gamma->linear conversion, then standard alpha blend over the scene.
"""

from __future__ import annotations

import jax.numpy as jnp


def gamma_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB gamma -> linear, Unity's approximate polynomial form.

    Unity's GammaToLinearSpace (used by GaussianComposite.shader:38) uses the
    polynomial approximation rather than the exact piecewise sRGB curve.
    """
    return c * (c * (c * 0.305306011 + 0.682171111) + 0.012522878)


def linear_to_gamma(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB gamma (Unity LinearToGammaSpace approximation)."""
    c = jnp.maximum(c, 0.0)
    return jnp.maximum(1.055 * jnp.power(c, 0.416666667) - 0.055, 0.0)


def composite_over(
    splat_rt: jnp.ndarray,
    background: jnp.ndarray,
    convert_gamma: bool = False,
) -> jnp.ndarray:
    """Blend the premultiplied splat RGBA image over a background.

    Args:
      splat_rt: (H, W, 4) premultiplied output of the rasterizer.
      background: (H, W, 3) or (3,) background color.
      convert_gamma: apply the reference's gamma->linear conversion of the
        un-premultiplied splat color before blending (matches Unity's
        linear-space pipeline).  Off by default: a pure-linear renderer skips
        it.
    """
    rgb = splat_rt[..., :3]
    alpha = splat_rt[..., 3:4]
    if convert_gamma:
        straight = rgb / jnp.maximum(alpha, 1e-8)
        rgb = gamma_to_linear(straight) * alpha
    return rgb + (1.0 - alpha) * jnp.broadcast_to(background, splat_rt.shape[:-1] + (3,))
