"""Spherical-harmonics shading, degrees 0-3.

TPU-native equivalent of the reference's SH evaluation
(package/Shaders/GaussianSplatting.hlsl:130-179).  Vectorized over splats;
`sh_order` is a static Python int so each order compiles to a specialized
kernel (the analog of the reference's uniform-branching shader).

Layout: ``sh`` is (..., 15, 3) — bands 1..3 interleaved RGB, matching the
reference's canonical interleaved order after import reshuffling
(package/Editor/Utils/GaussianFileReader.cs:185-208).  The DC term is carried
separately as a precomputed base color (``sh0 * SH_C0 + 0.5``,
GaussianUtils.cs:14-18).
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

SH_C1 = 0.4886025
SH_C2 = (1.0925484, -1.0925484, 0.3153916, -1.0925484, 0.5462742)
SH_C3 = (-0.5900436, 2.8906114, -0.4570458, 0.3731763, -0.4570458, 1.4453057, -0.5900436)

# Coefficient index ranges of bands 1..3 within the 15-coefficient layout.
BAND_SLICES = (slice(0, 3), slice(3, 8), slice(8, 15))


def shade_sh(
    base_color: jnp.ndarray,
    sh: jnp.ndarray | None,
    view_dir: jnp.ndarray,
    sh_order: int,
    only_sh: bool = False,
) -> jnp.ndarray:
    """Evaluate view-dependent color from SH coefficients.

    Args:
      base_color: (..., 3) precomputed DC color (sh0*C0 + 0.5).
      sh: (..., 15, 3) band 1..3 coefficients, or None when sh_order == 0.
      view_dir: (..., 3) normalized direction from camera to splat in object
        space.  The reference passes camera->splat negated then flips it again
        inside ShadeSH (hlsl:139-141); here the caller passes splat-minus-camera
        directly and no flip happens.
      sh_order: static int in [0, 3].
      only_sh: debug mode replacing the DC term with 0.5 (hlsl:146-148).

    Returns (..., 3) color, clamped to >= 0 (hlsl:178).
    """
    if not 0 <= sh_order <= 3:
        raise ValueError(f"sh_order must be in [0, 3], got {sh_order}")

    if isinstance(sh, tuple):
        # Planar fast path: sh as 3 channel columns of (..., 15) — the
        # device-asset decode keeps SH planar because assembling the
        # (N, 15, 3) interleave costs ~85 ms at 6.1M splats on TPU
        # (CLAUDE.md layout rules); same formulas, same term order, one
        # stack at the end.
        return _shade_sh_planar(base_color, sh, view_dir, sh_order, only_sh)

    res = jnp.where(only_sh, 0.5, base_color) if only_sh else base_color
    if sh_order >= 1:
        assert sh is not None
        x = view_dir[..., 0:1]
        y = view_dir[..., 1:2]
        z = view_dir[..., 2:3]
        res = res + SH_C1 * (-sh[..., 0, :] * y + sh[..., 1, :] * z - sh[..., 2, :] * x)
        if sh_order >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = res + (
                (SH_C2[0] * xy) * sh[..., 3, :]
                + (SH_C2[1] * yz) * sh[..., 4, :]
                + (SH_C2[2] * (2 * zz - xx - yy)) * sh[..., 5, :]
                + (SH_C2[3] * xz) * sh[..., 6, :]
                + (SH_C2[4] * (xx - yy)) * sh[..., 7, :]
            )
            if sh_order >= 3:
                res = res + (
                    (SH_C3[0] * y * (3 * xx - yy)) * sh[..., 8, :]
                    + (SH_C3[1] * xy * z) * sh[..., 9, :]
                    + (SH_C3[2] * y * (4 * zz - xx - yy)) * sh[..., 10, :]
                    + (SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy)) * sh[..., 11, :]
                    + (SH_C3[4] * x * (4 * zz - xx - yy)) * sh[..., 12, :]
                    + (SH_C3[5] * z * (xx - yy)) * sh[..., 13, :]
                    + (SH_C3[6] * x * (xx - 3 * yy)) * sh[..., 14, :]
                )
    return jnp.maximum(res, 0.0)


def _shade_sh_planar(base_color, sh_cols, view_dir, sh_order: int, only_sh: bool):
    """shade_sh on planar SH channels: sh_cols = 3 x (..., 15) arrays.

    Term order matches the array path exactly (same fp rounding per
    element); the only stack is the final (..., 3) color.
    """
    x = view_dir[..., 0]
    y = view_dir[..., 1]
    z = view_dir[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = []
    for ch in range(3):
        s = sh_cols[ch]
        res = (
            jnp.full_like(x, 0.5) if only_sh else base_color[..., ch]
        )
        if sh_order >= 1:
            res = res + SH_C1 * (-s[..., 0] * y + s[..., 1] * z - s[..., 2] * x)
            if sh_order >= 2:
                res = res + (
                    (SH_C2[0] * xy) * s[..., 3]
                    + (SH_C2[1] * yz) * s[..., 4]
                    + (SH_C2[2] * (2 * zz - xx - yy)) * s[..., 5]
                    + (SH_C2[3] * xz) * s[..., 6]
                    + (SH_C2[4] * (xx - yy)) * s[..., 7]
                )
                if sh_order >= 3:
                    res = res + (
                        (SH_C3[0] * y * (3 * xx - yy)) * s[..., 8]
                        + (SH_C3[1] * xy * z) * s[..., 9]
                        + (SH_C3[2] * y * (4 * zz - xx - yy)) * s[..., 10]
                        + (SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy)) * s[..., 11]
                        + (SH_C3[4] * x * (4 * zz - xx - yy)) * s[..., 12]
                        + (SH_C3[5] * z * (xx - yy)) * s[..., 13]
                        + (SH_C3[6] * x * (xx - 3 * yy)) * s[..., 14]
                    )
        out.append(res)
    return jnp.maximum(jnp.stack(out, axis=-1), 0.0)


def sh_basis(d: jnp.ndarray) -> jnp.ndarray:
    """The 15 band-1..3 basis functions at directions d; (..., 15).

    Defined so that ``shade_sh(base, sh, d, 3) == base + sum_k basis_k(d) *
    sh_k`` (before the clamp) — i.e. exactly the polynomial forms of
    GaussianSplatting.hlsl:150-175 in this module's no-flip direction
    convention.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return jnp.stack(
        [
            -SH_C1 * y,
            SH_C1 * z,
            -SH_C1 * x,
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
            SH_C3[0] * y * (3 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4 * zz - xx - yy),
            SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            SH_C3[4] * x * (4 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3 * yy),
        ],
        axis=-1,
    )


# Fixed, well-conditioned sample directions used to build per-band rotation
# matrices by projection (enough directions to invert each band's basis).
_SAMPLE_DIRS = np.array(
    [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.0, 1.0, 1.0],
        [1.0, 1.0, 1.0],
        [1.0, -1.0, 0.0],
        [0.3, -0.8, 0.5],
        [-0.7, 0.2, 0.6],
        [0.9, 0.3, -0.4],
        [-0.2, -0.5, -0.8],
        [0.5, 0.9, -0.1],
        [-0.9, -0.3, 0.2],
        [0.1, 0.6, 0.9],
    ],
    dtype=np.float64,
)
_SAMPLE_DIRS /= np.linalg.norm(_SAMPLE_DIRS, axis=1, keepdims=True)


def _band_sample_matrices():
    """Precompute pinv of the per-band basis matrix at the sample dirs."""
    basis = np.asarray(sh_basis(jnp.asarray(_SAMPLE_DIRS, jnp.float32)), np.float64)
    out = []
    for sl in BAND_SLICES:
        y = basis[:, sl]  # (S, 2l+1)
        out.append((np.linalg.pinv(y), sl))
    return out


_BAND_PINV = None


def rotate_sh(sh: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH coefficients by a 3x3 rotation matrix; (..., 15, 3).

    Equivalent of the reference's RotateSH
    (package/Shaders/SphericalHarmonics.hlsl:24-210, used by the export bake
    SplatUtilities.compute:549-609), built by projection instead of the
    hand-unrolled recurrences: for each band, solve for the matrix that maps
    coefficients so that shading the rotated splat at direction d equals
    shading the original at R^-1 d.  Exact for band-limited functions.
    """
    global _BAND_PINV
    if _BAND_PINV is None:
        _BAND_PINV = _band_sample_matrices()
    # R^-1 d_i = R^T d_i = d_i @ R (rows are directions).
    inv_dirs = jnp.asarray(_SAMPLE_DIRS, jnp.float32) @ jnp.asarray(rot, jnp.float32)
    basis_rot = sh_basis(inv_dirs)  # (S, 15)
    out = []
    for pinv, sl in _BAND_PINV:
        m = jnp.asarray(pinv, jnp.float32) @ basis_rot[:, sl]  # (2l+1, 2l+1)
        out.append(jnp.einsum("mk,...kc->...mc", m, sh[..., sl, :]))
    return jnp.concatenate(out, axis=-2)
