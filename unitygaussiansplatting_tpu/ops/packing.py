"""Bit-packed vector codecs for the quantized asset format.

TPU-native equivalents of the reference's packed decoders/encoders
(package/Shaders/GaussianSplatting.hlsl:261-304) and the asset creator's
encoders (package/Editor/GaussianSplatAssetCreator.cs:705-725).  Everything is
vectorized jnp on uint32 words — on TPU these are plain VPU integer ops, and
the same functions run inside Pallas kernels for fused decode.

All codecs map [0,1] floats <-> fixed-point fields; encode uses the
reference's convention ``(uint)(x * (scale + 0.5))`` which rounds to nearest
for in-range values.
"""

from __future__ import annotations

import jax.numpy as jnp


def _enc(x: jnp.ndarray, maxv: float) -> jnp.ndarray:
    return jnp.clip(x * (maxv + 0.5), 0.0, maxv).astype(jnp.uint32)


def encode_11_10_11(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) floats in [0,1] -> uint32 (GaussianSplatAssetCreator.cs:705-711)."""
    x = _enc(v[..., 0], 2047.0)
    y = _enc(v[..., 1], 1023.0)
    z = _enc(v[..., 2], 2047.0)
    return x | (y << 11) | (z << 21)


def decode_11_10_11(enc: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> (..., 3) floats in [0,1] (GaussianSplatting.hlsl:277-283)."""
    return jnp.stack(
        [
            (enc & 2047).astype(jnp.float32) / 2047.0,
            ((enc >> 11) & 1023).astype(jnp.float32) / 1023.0,
            ((enc >> 21) & 2047).astype(jnp.float32) / 2047.0,
        ],
        axis=-1,
    )


def encode_6_5_5(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) floats in [0,1] -> uint16-in-uint32 (AssetCreator.cs:713-719)."""
    x = _enc(v[..., 0], 63.0)
    y = _enc(v[..., 1], 31.0)
    z = _enc(v[..., 2], 31.0)
    return x | (y << 6) | (z << 11)


def decode_6_5_5(enc: jnp.ndarray) -> jnp.ndarray:
    """uint -> (..., 3) floats in [0,1] (GaussianSplatting.hlsl:261-267)."""
    return jnp.stack(
        [
            (enc & 63).astype(jnp.float32) / 63.0,
            ((enc >> 6) & 31).astype(jnp.float32) / 31.0,
            ((enc >> 11) & 31).astype(jnp.float32) / 31.0,
        ],
        axis=-1,
    )


def encode_5_6_5(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) floats in [0,1] -> uint16 bits, SH Norm6 layout (cs:931-940 analog)."""
    x = _enc(v[..., 0], 31.0)
    y = _enc(v[..., 1], 63.0)
    z = _enc(v[..., 2], 31.0)
    return x | (y << 5) | (z << 11)


def decode_5_6_5(enc: jnp.ndarray) -> jnp.ndarray:
    """uint -> (..., 3) floats in [0,1] (GaussianSplatting.hlsl:269-275)."""
    return jnp.stack(
        [
            (enc & 31).astype(jnp.float32) / 31.0,
            ((enc >> 5) & 63).astype(jnp.float32) / 63.0,
            ((enc >> 11) & 31).astype(jnp.float32) / 31.0,
        ],
        axis=-1,
    )


def encode_16_16_16(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) floats in [0,1] -> (..., 2) uint32 words, 48-bit Norm16."""
    x = _enc(v[..., 0], 65535.0)
    y = _enc(v[..., 1], 65535.0)
    z = _enc(v[..., 2], 65535.0)
    return jnp.stack([x | (y << 16), z], axis=-1)


def decode_16_16_16(enc: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) uint32 words -> (..., 3) floats (GaussianSplatting.hlsl:285-291)."""
    w0 = enc[..., 0]
    w1 = enc[..., 1]
    return jnp.stack(
        [
            (w0 & 65535).astype(jnp.float32) / 65535.0,
            ((w0 >> 16) & 65535).astype(jnp.float32) / 65535.0,
            (w1 & 65535).astype(jnp.float32) / 65535.0,
        ],
        axis=-1,
    )


def encode_10_10_10_2(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) floats in [0,1] -> uint32, the rotation codec (hlsl:301-304)."""
    x = _enc(v[..., 0], 1023.0)
    y = _enc(v[..., 1], 1023.0)
    z = _enc(v[..., 2], 1023.0)
    w = _enc(v[..., 3], 3.0)
    return x | (y << 10) | (z << 20) | (w << 30)


def decode_10_10_10_2(enc: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> (..., 4) floats in [0,1] (GaussianSplatting.hlsl:293-300)."""
    return jnp.stack(
        [
            (enc & 1023).astype(jnp.float32) / 1023.0,
            ((enc >> 10) & 1023).astype(jnp.float32) / 1023.0,
            ((enc >> 20) & 1023).astype(jnp.float32) / 1023.0,
            ((enc >> 30) & 3).astype(jnp.float32) / 3.0,
        ],
        axis=-1,
    )


def f32_to_f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """float32 -> uint32 holding the IEEE fp16 bit pattern (f32tof16 analog)."""
    return x.astype(jnp.float16).view(jnp.uint16).astype(jnp.uint32)


def f16_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """uint holding fp16 bits -> float32 (f16tof32 analog)."""
    return (bits & 0xFFFF).astype(jnp.uint16).view(jnp.float16).astype(jnp.float32)


def float_to_sortable_uint(f: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving float32 -> uint32 map used for radix sort keys.

    The stereopsis trick (SplatUtilities.compute:51-57): flip all bits of
    negatives, flip just the sign bit of positives.
    """
    fu = f.view(jnp.uint32) if f.dtype == jnp.float32 else f.astype(jnp.float32).view(jnp.uint32)
    mask = (jnp.where(fu >> 31 != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))) | jnp.uint32(
        0x80000000
    )
    return fu ^ mask


def sortable_uint_to_float(u: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`float_to_sortable_uint`."""
    mask = jnp.where(u >> 31 != 0, jnp.uint32(0x80000000), jnp.uint32(0xFFFFFFFF))
    return (u ^ mask).view(jnp.float32)
