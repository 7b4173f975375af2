"""Quaternion math for splat orientation.

TPU-native reimplementation of the quaternion utilities the reference keeps in
HLSL/C# (reference: package/Shaders/GaussianSplatting.hlsl:13-53,219-259 and
package/Runtime/GaussianUtils.cs:40-76).  All functions are pure jnp, operate on
arrays whose last axis is the quaternion axis, and vectorize over any leading
batch dims so XLA maps them onto the VPU.

Convention: quaternions are stored ``(x, y, z, w)`` — the same layout the
reference uses after ``NormalizeSwizzleRotation`` converts PLY's wxyz storage
(GaussianUtils.cs:40-43).
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT2 = 1.4142135623730951


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions along the last axis.

    Norm floored *inside* the sqrt: linalg.norm's VJP divides by the norm,
    so a zero quaternion would emit NaN gradients even with a max() outside.
    """
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), eps * eps)
    )
    return q / norm


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for xyzw quaternions (GaussianSplatting.hlsl:19-22)."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse (conjugate / |q|^2) of xyzw quaternions (hlsl:24-27)."""
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    conj = q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)
    return conj / norm2


def quat_rotate_vector(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors by xyzw quaternions (hlsl:13-17)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> (..., 3, 3) rotation matrix (hlsl:36-44)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize_swizzle_rotation(wxyz: jnp.ndarray) -> jnp.ndarray:
    """PLY-order (w,x,y,z) -> normalized (x,y,z,w) (GaussianUtils.cs:40-43)."""
    q = quat_normalize(wxyz)
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def pack_smallest3(q: jnp.ndarray) -> jnp.ndarray:
    """Pack xyzw quaternion into "smallest three" (..., 4) in [0,1].

    The three smallest components land in xyz mapped to 0..1, and w holds
    ``largest_index / 3`` (GaussianUtils.cs:46-76).  Branchless reformulation of
    the reference's component swizzles so it vectorizes.
    """
    absq = jnp.abs(q)
    # argmax with reference tie-breaking: strictly-greater comparisons walking
    # x->y->z->w keep the EARLIEST index on ties, matching the C# if-chain.
    idx = jnp.argmax(absq, axis=-1)

    # Gather the three non-largest components in the reference's swizzle order:
    # index 0 -> (y,z,w), 1 -> (x,z,w), 2 -> (x,y,w), 3 -> (x,y,z).
    order = jnp.asarray(
        [[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], dtype=jnp.int32
    )  # (4, 3)
    three_idx = order[idx]  # (..., 3)
    three = jnp.take_along_axis(q, three_idx, axis=-1)
    largest = jnp.take_along_axis(q, idx[..., None], axis=-1)

    sign = jnp.where(largest >= 0, 1.0, -1.0)
    three = three * sign  # -1/sqrt2 .. +1/sqrt2
    three = three * _SQRT2 * 0.5 + 0.5  # 0..1
    return jnp.concatenate([three, idx[..., None].astype(q.dtype) / 3.0], axis=-1)


def unpack_smallest3(pq: jnp.ndarray) -> jnp.ndarray:
    """Decode "smallest three" [0,1]^4 back to an xyzw quaternion.

    Mirrors ``DecodeRotation`` (GaussianSplatting.hlsl:219-229): w stores
    ``index/3`` which is rounded back to the index of the largest component.
    """
    idx = jnp.round(pq[..., 3] * 3.0).astype(jnp.int32)
    three = pq[..., :3] * _SQRT2 - (1.0 / _SQRT2)
    # 1e-24 floor: sqrt'(0) = inf would leak NaN into gradients when the
    # three stored components already have unit norm (quantization can land
    # exactly there); shifts the decoded value by at most 1e-12.
    largest = jnp.sqrt(jnp.maximum(1e-24, 1.0 - jnp.sum(three * three, axis=-1)))

    a, b, c = three[..., 0], three[..., 1], three[..., 2]
    # Inverse of the pack swizzle: place `largest` at position idx and keep
    # (a, b, c) in order in the remaining slots.  Per-component selects
    # instead of a stacked candidate table + take_along_axis: the 4x4
    # candidate stack lowered to cross-lane interleaves on TPU (~79 ms at
    # 6.1M splats in the device-asset decode; the selects are ~free).
    x = jnp.where(idx == 0, largest, a)
    y = jnp.where(idx == 1, largest, jnp.where(idx == 0, a, b))
    z = jnp.where(idx == 2, largest, jnp.where(idx <= 1, b, c))
    w = jnp.where(idx == 3, largest, c)
    return jnp.stack([x, y, z, w], axis=-1)
