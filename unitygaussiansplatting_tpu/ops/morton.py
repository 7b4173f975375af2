"""Morton (Z-order) encodings used for splat locality.

TPU-native equivalents of the reference's Morton helpers:
- 3D 21-bit-per-axis encode used to reorder splats for chunk locality
  (package/Runtime/GaussianUtils.cs:79-95),
- 2D 16x16 encode/decode used for the color-texture swizzle
  (package/Shaders/GaussianSplatting.hlsl:113-127).

Implemented on uint32 pairs rather than uint64 (JAX's default x32 world); the
3D code returns (hi, lo) uint32 words that sort lexicographically.  numpy
variants are provided for the import pipeline where uint64 is available.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _part1by2_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x ^ (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x ^ (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x ^ (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x ^ (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x ^ (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_encode3_np(v: np.ndarray) -> np.ndarray:
    """(N, 3) uint 21-bit coords -> (N,) uint64 Morton codes (GaussianUtils.cs:92-95)."""
    return (
        (_part1by2_np(v[..., 2]) << np.uint64(2))
        | (_part1by2_np(v[..., 1]) << np.uint64(1))
        | _part1by2_np(v[..., 0])
    )


def morton_order_np(positions: np.ndarray) -> np.ndarray:
    """Return the permutation sorting splats into 3D Morton order.

    Mirrors the import-time reorder (GaussianSplatAssetCreator.cs:384-429):
    positions normalized to the scene bounds, scaled to 21-bit integer coords,
    Morton-encoded, argsorted.
    """
    pmin = positions.min(axis=0)
    pmax = positions.max(axis=0)
    extent = np.maximum(pmax - pmin, 1e-12)
    scaled = (positions - pmin) / extent * float((1 << 21) - 1)
    coords = scaled.astype(np.uint64)
    codes = morton_encode3_np(coords)
    return np.argsort(codes, kind="stable")


def encode_morton2d_16x16(c: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) coords in [0,16) -> interleaved 8-bit Morton code (hlsl:113-119)."""
    x = c[..., 0].astype(jnp.uint32)
    y = c[..., 1].astype(jnp.uint32)
    t = ((y & 0xF) << 8) | (x & 0xF)
    t = (t ^ (t << 2)) & 0x3333
    t = (t ^ (t << 1)) & 0x5555
    return (t | (t >> 7)) & 0xFF


def decode_morton2d_16x16(t: jnp.ndarray) -> jnp.ndarray:
    """8-bit Morton code -> (..., 2) coords in [0,16) (hlsl:120-127)."""
    t = t.astype(jnp.uint32)
    t = (t & 0xFF) | ((t & 0xFE) << 7)
    t = t & 0x5555
    t = (t ^ (t >> 1)) & 0x3333
    t = (t ^ (t >> 2)) & 0x0F0F
    return jnp.stack([t & 0xF, t >> 8], axis=-1)


def splat_index_to_texel(idx: jnp.ndarray, tex_width: int = 2048) -> jnp.ndarray:
    """Splat index -> (..., 2) texel coords in the Morton-swizzled color texture.

    (GaussianSplatting.hlsl:183-194.)  16x16 Morton blocks tiled row-major
    across a ``tex_width``-wide texture.
    """
    idx = idx.astype(jnp.uint32)
    xy = decode_morton2d_16x16(idx)
    width = tex_width // 16
    block = idx >> 8
    x = (block % width) * 16 + xy[..., 0]
    y = (block // width) * 16 + xy[..., 1]
    return jnp.stack([x, y], axis=-1)
