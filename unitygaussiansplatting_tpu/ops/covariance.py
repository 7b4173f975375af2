"""3D covariance construction and EWA screen-space projection.

TPU-native reimplementation of the covariance math in the reference's shader
library (package/Shaders/GaussianSplatting.hlsl:29-108) and the 2x2
eigen-decomposition used for screen-space splat axes
(package/Shaders/SplatUtilities.compute:107-162, the antimatter15/splat
variant).  All functions are vectorized over leading batch dims; the hot path
is batched over all N splats at once so XLA fuses the chain into a handful of
VPU kernels (and a Pallas fusion can swap in underneath without changing the
semantics).

Camera convention (differs from Unity; see models/camera.py): view space is
right-handed with the camera looking down +Z, so ``view_pos[..., 2]`` is the
positive depth.  Pixel space is y-down.  The reference's Unity-specific y-flips
(SplatUtilities.compute:136,156 ``diagVec.y = -diagVec.y``) are therefore folded
into a single off-diagonal sign flip applied when converting the EWA covariance
to pixel space — see :func:`ewa_project`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quaternion import quat_to_rotation_matrix

# Low-pass filter added to the screen-space covariance diagonal so every splat
# is at least ~1px (GaussianSplatting.hlsl:86-88; same constant as the official
# 3DGS rasterizer).
COV2D_LOWPASS = 0.3
# View-space position clamp factor for off-screen splats (hlsl:61-68).
CLAMP_FACTOR = 1.3
# Minimum minor eigenvalue / maximum axis length in the screen-axis
# decomposition (SplatUtilities.compute:154-158).
MIN_LAMBDA = 0.1
MAX_AXIS_LEN = 4096.0


def covariance3d(rot_xyzw: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Rotation quaternion + linear scale -> 3D covariance, packed 6-vector.

    Sigma = (R S)(R S)^T packed as ``(xx, xy, xz, yy, yz, zz)``
    (GaussianSplatting.hlsl:29-53).
    """
    r = quat_to_rotation_matrix(rot_xyzw)  # (..., 3, 3)
    m = r * scale[..., None, :]  # R @ diag(s)
    # Sigma = M M^T, expanded elementwise: tiny per-splat matmuls would waste
    # the MXU; as mul+add chains the whole thing fuses on the VPU at full f32.
    m0, m1, m2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    return jnp.stack(
        [
            jnp.sum(m0 * m0, axis=-1),
            jnp.sum(m0 * m1, axis=-1),
            jnp.sum(m0 * m2, axis=-1),
            jnp.sum(m1 * m1, axis=-1),
            jnp.sum(m1 * m2, axis=-1),
            jnp.sum(m2 * m2, axis=-1),
        ],
        axis=-1,
    )


def cov3d_to_matrix(cov6: jnp.ndarray) -> jnp.ndarray:
    """Packed 6-vector -> symmetric (..., 3, 3) matrix."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(cov6, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def ewa_project(
    view_pos: jnp.ndarray,
    cov6: jnp.ndarray,
    view_rot: jnp.ndarray,
    focal: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
) -> jnp.ndarray:
    """EWA splatting: 3D covariance -> 2D pixel-space covariance.

    Implements "EWA Splatting" (Zwicker et al. 2002) eq. 31 exactly as the
    reference does (GaussianSplatting.hlsl:56-90): clamp the view-space position
    to 1.3x the frustum tangent, build the 2x3 perspective Jacobian with a
    single focal length, fold in the world->view rotation, and add the 0.3
    low-pass to the diagonal.  Returns ``(cxx, cxy, cyy)`` in *pixel* space
    (y-down), i.e. with the off-diagonal sign flipped relative to the y-up
    NDC-space result — this replaces the reference's per-axis y negation
    downstream.

    Args:
      view_pos: (..., 3) positions in view space, z = depth > 0 in front.
      cov6: (..., 6) packed 3D covariance in world space.
      view_rot: (..., 3, 3) or (3, 3) world->view rotation (top-left of V).
      focal: pixel focal length, ``W / (2 * tan_fovx)`` (hlsl:70).
      tan_fovx / tan_fovy: tangents of the half field-of-view angles.
    """
    z = view_pos[..., 2]
    lim_x = CLAMP_FACTOR * tan_fovx
    lim_y = CLAMP_FACTOR * tan_fovy
    tx = jnp.clip(view_pos[..., 0] / z, -lim_x, lim_x) * z
    ty = jnp.clip(view_pos[..., 1] / z, -lim_y, lim_y) * z

    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    # J = [[f/z, 0, -f*tx/z^2], [0, f/z, -f*ty/z^2]]  (hlsl:72-76)
    j00 = focal * inv_z
    j02 = -focal * tx * inv_z2
    j12 = -focal * ty * inv_z2

    # T = J @ W where W is world->view rotation (hlsl:77-78).
    w = jnp.broadcast_to(view_rot, view_pos.shape[:-1] + (3, 3))
    t0 = j00[..., None] * w[..., 0, :] + j02[..., None] * w[..., 2, :]
    t1 = j00[..., None] * w[..., 1, :] + j12[..., None] * w[..., 2, :]

    # cov2d = T V T^T expanded elementwise (full f32 on the VPU; per-splat
    # einsum would lower to tiny reduced-precision dots).
    vxx, vxy, vxz, vyy, vyz, vzz = jnp.moveaxis(cov6, -1, 0)

    def _quad(a, b):
        return (
            a[..., 0] * (vxx * b[..., 0] + vxy * b[..., 1] + vxz * b[..., 2])
            + a[..., 1] * (vxy * b[..., 0] + vyy * b[..., 1] + vyz * b[..., 2])
            + a[..., 2] * (vxz * b[..., 0] + vyz * b[..., 1] + vzz * b[..., 2])
        )

    cxx = _quad(t0, t0) + COV2D_LOWPASS
    cyy = _quad(t1, t1) + COV2D_LOWPASS
    cxy = _quad(t0, t1)

    # y-up NDC -> y-down pixel space: conjugate by diag(1, -1).
    return jnp.stack([cxx, -cxy, cyy], axis=-1)


def conic(cov2d: jnp.ndarray) -> jnp.ndarray:
    """2D covariance ``(cxx, cxy, cyy)`` -> conic ``(a, b, c)`` = inverse/det.

    (GaussianSplatting.hlsl:92-96.)  The Gaussian power at pixel offset d is
    then ``-0.5*(a dx^2 + c dy^2) + b dx dy`` (hlsl:105-108).
    """
    cxx, cxy, cyy = jnp.moveaxis(cov2d, -1, 0)
    det = cxx * cyy - cxy * cxy
    inv_det = 1.0 / det
    return jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)


def gaussian_power(conic_abc: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Log-density of the screen Gaussian at pixel offset d (hlsl:105-108)."""
    a, b, c = jnp.moveaxis(conic_abc, -1, 0)
    dx, dy = d[..., 0], d[..., 1]
    return -0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy


class ScreenAxes(NamedTuple):
    axis1: jnp.ndarray  # (..., 2) major axis, length sqrt(2*lambda1) px
    axis2: jnp.ndarray  # (..., 2) minor axis, length sqrt(2*lambda2) px


def decompose_covariance2d(cov2d: jnp.ndarray) -> ScreenAxes:
    """Eigen-decompose a 2D covariance into screen-space splat axes.

    The antimatter15/splat closed form used by the reference
    (SplatUtilities.compute:147-159): eigenvalues from trace/det, minor
    eigenvalue floored at 0.1, axis length ``min(sqrt(2*lambda), 4096)``.
    Because :func:`ewa_project` already returns pixel-space (y-down)
    covariance, the reference's extra ``diagVec.y = -diagVec.y`` flip is not
    repeated here.
    """
    cxx, cxy, cyy = jnp.moveaxis(cov2d, -1, 0)
    mid = 0.5 * (cxx + cyy)
    # sqrt has an infinite derivative at 0: a perfectly isotropic covariance
    # (cxx == cyy, cxy == 0 — every capacity-padding splat is one) would put
    # NaN into the *gradient* of every upstream parameter even though its
    # pixel contribution is zero (0 x NaN).  The 1e-24 floor moves the
    # derivative to a finite value while shifting radius by at most 1e-12 px².
    radius = jnp.sqrt(
        jnp.maximum(jnp.square((cxx - cyy) * 0.5) + jnp.square(cxy), 1e-24)
    )
    lam1 = mid + radius
    lam2 = jnp.maximum(mid - radius, MIN_LAMBDA)
    vec = jnp.stack([cxy, lam1 - cxx], axis=-1)
    # Same guard for the norm (jnp.linalg.norm's VJP divides by the norm).
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(vec * vec, axis=-1, keepdims=True), 1e-30)
    )
    # When cov2d is already diagonal lam1-cxx and cxy are both ~0; fall back to
    # the x axis (the reference gets this for free from normalize() of a zero
    # vector being undefined-but-unused since lam1 == cxx).
    vec = jnp.where(norm > 1e-12, vec / jnp.maximum(norm, 1e-12), jnp.asarray([1.0, 0.0]))
    len1 = jnp.minimum(jnp.sqrt(2.0 * lam1), MAX_AXIS_LEN)
    len2 = jnp.minimum(jnp.sqrt(2.0 * lam2), MAX_AXIS_LEN)
    axis1 = len1[..., None] * vec
    axis2 = len2[..., None] * jnp.stack([vec[..., 1], -vec[..., 0]], axis=-1)
    return ScreenAxes(axis1, axis2)


def project_covariance_planar(
    rot_xyzw: jnp.ndarray,  # (N, 4)
    scale: jnp.ndarray,  # (N, 3)
    splat_scale2: jnp.ndarray,  # () cov scale factor
    view_pos: jnp.ndarray,  # (N, 3)
    view_rot: jnp.ndarray,  # (3, 3) world->view rotation
    focal: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
) -> tuple[ScreenAxes, jnp.ndarray]:
    """Fused covariance3d -> ewa_project -> decompose on PLANAR columns.

    Same arithmetic as the three separate functions (term-for-term), but
    every intermediate is an (N,) column and each output field is stacked
    exactly once — the (N, 3, 3)/(N, 3) intermediates of the composable
    API cost ~8 ns/element in cross-lane assembly on TPU (CLAUDE.md r3
    decode lesson; measured here: the three-stage chain is 30.2 ms unfused
    at 6.1M splats where the byte bound is ~2 ms, tools/tpu_jobs/930).
    Returns (ScreenAxes, cov2d (N, 3) pixel-space).
    """
    x = rot_xyzw[..., 0]
    y = rot_xyzw[..., 1]
    z = rot_xyzw[..., 2]
    w = rot_xyzw[..., 3]
    s0 = scale[..., 0]
    s1 = scale[..., 1]
    s2 = scale[..., 2]
    # R rows (GaussianSplatting.hlsl:36-44), as 9 columns.
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    # M = R diag(s); Sigma = M M^T entries, scaled by splat_scale^2.
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    vxx = (m00 * m00 + m01 * m01 + m02 * m02) * splat_scale2
    vxy = (m00 * m10 + m01 * m11 + m02 * m12) * splat_scale2
    vxz = (m00 * m20 + m01 * m21 + m02 * m22) * splat_scale2
    vyy = (m10 * m10 + m11 * m11 + m12 * m12) * splat_scale2
    vyz = (m10 * m20 + m11 * m21 + m12 * m22) * splat_scale2
    vzz = (m20 * m20 + m21 * m21 + m22 * m22) * splat_scale2

    # EWA Jacobian fold (ewa_project, term-for-term).
    zc = view_pos[..., 2]
    lim_x = CLAMP_FACTOR * tan_fovx
    lim_y = CLAMP_FACTOR * tan_fovy
    tx = jnp.clip(view_pos[..., 0] / zc, -lim_x, lim_x) * zc
    ty = jnp.clip(view_pos[..., 1] / zc, -lim_y, lim_y) * zc
    inv_z = 1.0 / zc
    inv_z2 = inv_z * inv_z
    j00 = focal * inv_z
    j02 = -focal * tx * inv_z2
    j12 = -focal * ty * inv_z2
    t00 = j00 * view_rot[0, 0] + j02 * view_rot[2, 0]
    t01 = j00 * view_rot[0, 1] + j02 * view_rot[2, 1]
    t02 = j00 * view_rot[0, 2] + j02 * view_rot[2, 2]
    t10 = j00 * view_rot[1, 0] + j12 * view_rot[2, 0]
    t11 = j00 * view_rot[1, 1] + j12 * view_rot[2, 1]
    t12 = j00 * view_rot[1, 2] + j12 * view_rot[2, 2]

    def _quad(a0, a1, a2, b0, b1, b2):
        return (
            a0 * (vxx * b0 + vxy * b1 + vxz * b2)
            + a1 * (vxy * b0 + vyy * b1 + vyz * b2)
            + a2 * (vxz * b0 + vyz * b1 + vzz * b2)
        )

    cxx = _quad(t00, t01, t02, t00, t01, t02) + COV2D_LOWPASS
    cyy = _quad(t10, t11, t12, t10, t11, t12) + COV2D_LOWPASS
    cxy = -_quad(t00, t01, t02, t10, t11, t12)  # y-up NDC -> y-down pixels

    # decompose_covariance2d, column form.
    mid = 0.5 * (cxx + cyy)
    radius = jnp.sqrt(
        jnp.maximum(jnp.square((cxx - cyy) * 0.5) + jnp.square(cxy), 1e-24)
    )
    lam1 = mid + radius
    lam2 = jnp.maximum(mid - radius, MIN_LAMBDA)
    vx = cxy
    vy = lam1 - cxx
    norm = jnp.sqrt(jnp.maximum(vx * vx + vy * vy, 1e-30))
    ok = norm > 1e-12
    nrm = jnp.maximum(norm, 1e-12)  # division, matching decompose_covariance2d
    vxn = jnp.where(ok, vx / nrm, 1.0)
    vyn = jnp.where(ok, vy / nrm, 0.0)
    len1 = jnp.minimum(jnp.sqrt(2.0 * lam1), MAX_AXIS_LEN)
    len2 = jnp.minimum(jnp.sqrt(2.0 * lam2), MAX_AXIS_LEN)
    axis1 = jnp.stack([len1 * vxn, len1 * vyn], axis=-1)
    axis2 = jnp.stack([len2 * vyn, -(len2 * vxn)], axis=-1)
    cov2d = jnp.stack([cxx, cxy, cyy], axis=-1)
    return ScreenAxes(axis1, axis2), cov2d
