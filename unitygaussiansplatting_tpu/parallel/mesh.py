"""Device mesh and sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.4); this module provides
what its design lacks: a ``jax.sharding.Mesh`` over a TPU slice with named
axes for the two data axes of the renderer —

- ``"splats"``: the N-splat arrays shard along axis 0 (projection is
  pointwise over splats, the chip-level analog of the reference's
  1024-thread groups, SplatUtilities.compute:2),
- screen tiles shard over the same devices for compositing
  (owner-computes tiles replace single-GPU hardware blending).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

SPLAT_AXIS = "splats"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "splats"."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (SPLAT_AXIS,))


def splat_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an (N, ...) array along the splat axis."""
    return NamedSharding(mesh, PartitionSpec(SPLAT_AXIS))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (T, ...) tile-major array along the same device axis."""
    return NamedSharding(mesh, PartitionSpec(SPLAT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_gaussians(g, mesh: Mesh):
    """Place a Gaussians/RawGaussians pytree with splat-axis sharding.

    Pads are the caller's concern: N should be divisible by the mesh size
    (use utils.pad_to_multiple when importing assets for a pod slice).
    """
    sharding = splat_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), g)
