"""Export and merge operations on splat clouds.

Equivalents of the reference's export kernel + editor plumbing:
``CSExportData`` with optional world-transform bake incl. SH rotation
(package/Shaders/SplatUtilities.compute:616-673,549-609), the PLY writer with
deleted/cut filtering (package/Editor/GaussianSplatRendererEditor.cs:394-445),
and multi-renderer merging (GaussianSplatRendererEditor.cs:169-235 +
``CSCopySplats`` compute:686-758).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import Gaussians
from ..ops.quaternion import quat_mul, quat_normalize
from ..ops.sh import rotate_sh


def _matrix_to_quat_np(m: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> xyzw quaternion (host-side, for the bake)."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s, 0.25 * s]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1e-12, 1.0 + m[i, i] - m[j, j] - m[k, k])) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (m[j, i] + m[i, j]) / s
    q[k] = (m[k, i] + m[i, k]) / s
    q[3] = (m[k, j] - m[j, k]) / s
    return q


def bake_transform(g: Gaussians, matrix) -> Gaussians:
    """Bake an object->world transform into the cloud.

    Mirrors the export kernel's world-space bake (compute:645-658): positions
    through the full matrix, orientations composed with the rotation part,
    scales multiplied by the axis lengths, SH rotated to the new frame.
    Non-uniform scale is approximated per-axis like the reference.
    """
    m = np.asarray(matrix, np.float32)
    rot3 = m[:3, :3]
    axis_scales = np.linalg.norm(rot3, axis=0)  # length of each basis column
    rot_pure = rot3 / axis_scales[None, :]
    q = _matrix_to_quat_np(rot_pure).astype(np.float32)

    means = g.means @ jnp.asarray(rot3).T + jnp.asarray(m[:3, 3])
    rotations = quat_normalize(
        quat_mul(jnp.broadcast_to(jnp.asarray(q), g.rotations.shape), g.rotations)
    )
    scales = g.scales * jnp.asarray(axis_scales)
    sh = rotate_sh(g.sh, jnp.asarray(rot_pure))
    return dataclasses.replace(g, means=means, rotations=rotations, scales=scales, sh=sh)


def export_gaussians(
    g: Gaussians,
    deleted: jnp.ndarray | None = None,
    kill_mask: jnp.ndarray | None = None,
    bake_matrix=None,
) -> Gaussians:
    """Filter deleted/cut splats and optionally bake a world transform.

    The result feeds io.bridge.gaussians_to_input_splats + io.ply.write_ply —
    the analog of EditExportData + ExportPlyFile.
    """
    keep = jnp.ones((g.num_splats,), bool)
    if deleted is not None:
        keep &= ~deleted
    if kill_mask is not None:
        keep &= ~kill_mask
    idx = np.flatnonzero(np.asarray(keep))
    filtered = Gaussians(
        means=g.means[idx],
        rotations=g.rotations[idx],
        scales=g.scales[idx],
        opacities=g.opacities[idx],
        base_color=g.base_color[idx],
        sh=g.sh[idx],
    )
    if bake_matrix is not None:
        filtered = bake_transform(filtered, bake_matrix)
    return filtered


def merge_gaussians(clouds: list[Gaussians], matrices: list | None = None) -> Gaussians:
    """Concatenate clouds, optionally baking each one's transform first
    (MergeSplatObjects, GaussianSplatRendererEditor.cs:169-235)."""
    if matrices is not None:
        clouds = [
            bake_transform(g, m) if m is not None else g
            for g, m in zip(clouds, matrices)
        ]
    return Gaussians(
        means=jnp.concatenate([g.means for g in clouds]),
        rotations=jnp.concatenate([g.rotations for g in clouds]),
        scales=jnp.concatenate([g.scales for g in clouds]),
        opacities=jnp.concatenate([g.opacities for g in clouds]),
        base_color=jnp.concatenate([g.base_color for g in clouds]),
        sh=jnp.concatenate([g.sh for g in clouds]),
    )
