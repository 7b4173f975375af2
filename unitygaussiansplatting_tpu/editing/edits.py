"""Selection and in-place edit operations on a splat cloud.

TPU-native equivalents of the reference's GPU edit kernels and the renderer's
Edit* API (package/Runtime/GaussianSplatRenderer.cs:788-1075,
package/Shaders/SplatUtilities.compute:266-521).  The reference mutates GPU
buffers with atomic bit ops; here edits are pure functions over boolean masks
and the Gaussians pytree — jit-able, shardable along the splat axis, and
trivially undoable by keeping the previous pytree.

The reference only supports translate/rotate/scale on uncompressed Float32
assets (compute:445,469,510); here they work on any loaded cloud since edits
operate on the decoded representation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.camera import Camera
from ..models.gaussians import Gaussians
from ..ops.quaternion import quat_mul, quat_normalize, quat_rotate_vector


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EditState:
    """Selection + deletion bits (the reference's _SplatSelectedBits /
    _SplatDeletedBits word buffers, as bool arrays)."""

    selected: jnp.ndarray  # (N,) bool
    deleted: jnp.ndarray  # (N,) bool

    @staticmethod
    def empty(n: int) -> "EditState":
        return EditState(jnp.zeros((n,), bool), jnp.zeros((n,), bool))


def select_rect(
    state: EditState,
    g: Gaussians,
    camera: Camera,
    rect_min,
    rect_max,
    subtract: bool = False,
    kill_mask: jnp.ndarray | None = None,
) -> EditState:
    """Rectangle selection in pixel coords (CSSelectionUpdate, compute:393-423).

    add mode ORs bits in; subtract mode ANDs them out.  Splats behind the
    camera or cut by cutouts never change.
    """
    view_pos = g.means @ camera.view[:3, :3].T + camera.view[:3, 3]
    in_front = view_pos[..., 2] > 0
    pix = camera.view_to_pixel(view_pos)
    rect_min = jnp.asarray(rect_min)
    rect_max = jnp.asarray(rect_max)
    inside = (
        in_front
        & (pix[:, 0] >= rect_min[0])
        & (pix[:, 0] <= rect_max[0])
        & (pix[:, 1] >= rect_min[1])
        & (pix[:, 1] <= rect_max[1])
    )
    if kill_mask is not None:
        inside &= ~kill_mask
    if subtract:
        return dataclasses.replace(state, selected=state.selected & ~inside)
    return dataclasses.replace(state, selected=state.selected | inside)


def select_all(state: EditState) -> EditState:
    return dataclasses.replace(state, selected=jnp.ones_like(state.selected))


def invert_selection(state: EditState) -> EditState:
    """CSInvertSelection (compute:340-352); deleted splats stay unselected."""
    return dataclasses.replace(state, selected=(~state.selected) & (~state.deleted))


def clear_selection(state: EditState) -> EditState:
    return dataclasses.replace(state, selected=jnp.zeros_like(state.selected))


def delete_selected(state: EditState) -> EditState:
    """EditDeleteSelected (GaussianSplatRenderer.cs:862-870)."""
    return EditState(
        selected=jnp.zeros_like(state.selected),
        deleted=state.deleted | state.selected,
    )


def translate_selection(g: Gaussians, state: EditState, delta) -> Gaussians:
    """CSTranslateSelection (compute:435-452)."""
    delta = jnp.asarray(delta)
    means = jnp.where(state.selected[:, None], g.means + delta, g.means)
    return dataclasses.replace(g, means=means)


def rotate_selection(
    g: Gaussians, state: EditState, rot_xyzw, center
) -> Gaussians:
    """CSRotateSelection (compute:459-497): rotate positions about the
    selection center and compose the rotation into splat orientations.

    The reference composes ``q * delta`` and tags it '@TODO: correct
    rotation'; the correct world-frame composition is ``delta * q``, used
    here (a world rotation applied after the splat's own orientation).
    SH coefficients are not rotated (matching the reference's TODO; the
    export path does rotate SH when baking transforms).
    """
    rot = quat_normalize(jnp.asarray(rot_xyzw, jnp.float32))
    center = jnp.asarray(center)
    sel = state.selected
    moved = quat_rotate_vector(g.means - center, rot) + center
    means = jnp.where(sel[:, None], moved, g.means)
    rotated = quat_mul(jnp.broadcast_to(rot, g.rotations.shape), g.rotations)
    rotations = jnp.where(sel[:, None], rotated, g.rotations)
    return dataclasses.replace(g, means=means, rotations=rotations)


def scale_selection(g: Gaussians, state: EditState, factor, center) -> Gaussians:
    """CSScaleSelection (compute:500-521): scale positions about the center.

    Like the reference, splat scales themselves are left unchanged
    (compute:499 '@TODO: maybe scale the splat scale itself too?').
    """
    factor = jnp.asarray(factor)
    center = jnp.asarray(center)
    moved = (g.means - center) * factor + center
    means = jnp.where(state.selected[:, None], moved, g.means)
    return dataclasses.replace(g, means=means)


class EditSummary(NamedTuple):
    selected_count: jnp.ndarray
    deleted_count: jnp.ndarray
    cut_count: jnp.ndarray
    selected_bounds_min: jnp.ndarray  # (3,)
    selected_bounds_max: jnp.ndarray


def edit_summary(
    g: Gaussians, state: EditState, kill_mask: jnp.ndarray | None = None
) -> EditSummary:
    """Counts + selection bounds (CSUpdateEditData, compute:266-315 — the
    popcounts and atomic sortable-uint bounds become plain reductions)."""
    sel = state.selected & ~state.deleted
    n_cut = (
        jnp.sum(kill_mask & ~state.deleted) if kill_mask is not None else jnp.int32(0)
    )
    big = jnp.float32(jnp.inf)
    bmin = jnp.min(jnp.where(sel[:, None], g.means, big), axis=0)
    bmax = jnp.max(jnp.where(sel[:, None], g.means, -big), axis=0)
    return EditSummary(
        selected_count=jnp.sum(sel),
        deleted_count=jnp.sum(state.deleted),
        cut_count=n_cut,
        selected_bounds_min=bmin,
        selected_bounds_max=bmax,
    )
