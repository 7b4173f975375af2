"""Cutout volumes: ellipsoid/box regions that hide splats.

TPU-native equivalent of the reference's GaussianCutout component
(package/Runtime/GaussianCutout.cs:20-40) and the ``IsSplatCut`` kernel test
(package/Shaders/SplatUtilities.compute:164-187), vectorized over splats.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class CutoutType(enum.IntEnum):
    ELLIPSOID = 0
    BOX = 1


@dataclasses.dataclass(frozen=True)
class Cutout:
    """One cutout volume: a world->local matrix mapping the unit shape."""

    mat: jnp.ndarray  # (4, 4) world(object)->cutout-local
    type: CutoutType = CutoutType.ELLIPSOID
    invert: bool = False


def _inside(c: Cutout, pos: jnp.ndarray) -> jnp.ndarray:
    local = pos @ c.mat[:3, :3].T + c.mat[:3, 3]
    if c.type == CutoutType.ELLIPSOID:
        return jnp.sum(local * local, axis=-1) <= 1.0
    return jnp.all(jnp.abs(local) <= 1.0, axis=-1)


def cutout_kill_mask(cutouts: list[Cutout], pos: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool: True where a splat should be hidden.

    Reproduces the kernel's sequential semantics (compute:164-187): the first
    cutout *containing* a splat decides via its invert flag; a splat inside
    no cutout is cut iff any non-inverted cutout exists.
    """
    n = pos.shape[0]
    if not cutouts:
        return jnp.zeros((n,), bool)
    decided = jnp.zeros((n,), bool)
    result = jnp.zeros((n,), bool)
    any_normal = any(not c.invert for c in cutouts)
    for c in cutouts:
        inside = _inside(c, pos)
        first_hit = inside & (~decided)
        result = jnp.where(first_hit, bool(c.invert), result)
        decided = decided | inside
    result = jnp.where(decided, result, bool(any_normal))
    return result
