"""Explicit strip-sharded rendering with shard_map + collectives.

The owner-computes formulation of SURVEY.md §2.4 / §7 stage 5, written with
``jax.shard_map`` and explicit collectives instead of GSPMD constraints
(parallel/render_sharded.py keeps the constraint-based variant):

- each device projects its *splat shard* (pointwise, no comms),
- the compact projected view data is exchanged with one ``all_gather``
  along the mesh (the ~40 B/splat SplatViewData analog — raw parameters
  never move),
- each device then bins, sorts, preps and composites only its own
  horizontal *strip* of screen tiles.  The whole pair pipeline — the sort,
  the gathers, the Pallas kernel — shards by ~1/D because pairs outside
  the strip are culled before expansion.

A viewport is rendered by shifting splat centers by the strip origin and
running the ordinary pipeline at strip size (everything downstream of
projection is translation-covariant), so no kernel changes are needed.

Gradients: reverse-mode of the all_gather produces the reduce-scatter back
to splat owners automatically — the strategy trains as-is.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.camera import Camera
from ..models.gaussians import Gaussians
from ..ops.binning import bin_splats, tile_grid
from ..ops.projection import ProjectedSplats, project_splats
from ..utils.config import RasterizeConfig, RenderSettings
from .mesh import SPLAT_AXIS


def _strip_height(height: int, num_devices: int, config: RasterizeConfig) -> int:
    _, tiles_y = tile_grid(1, height, config)
    rows_per_dev = -(-tiles_y // num_devices)
    return rows_per_dev * config.tile_h


def render_strips_fn(
    mesh: Mesh,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
):
    """Build the jitted strip-sharded renderer for a mesh + camera.

    Returns fn(gaussians_sharded) -> (H, W, 4) image (replicated).  Splat
    arrays must be sharded along the splat axis and divisible by mesh size.
    """
    d = mesh.shape[SPLAT_AXIS]
    strip_h = _strip_height(camera.height, d, config)
    padded_h = strip_h * d

    def per_device(g: Gaussians) -> jnp.ndarray:
        # 1. Project the local splat shard (no communication).
        proj = project_splats(g, camera, settings)
        # 2. Exchange compact view data only.
        proj = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, SPLAT_AXIS, axis=0, tiled=True), proj
        )
        # 3. Shift into this device's strip viewport and rasterize it.
        idx = jax.lax.axis_index(SPLAT_AXIS)
        origin_y = (idx * strip_h).astype(jnp.float32)
        shifted = proj._replace(
            center=proj.center - jnp.stack([jnp.float32(0.0), origin_y])
        )
        if backend == "pallas":
            from ..ops.rasterize_pallas import rasterize_tiles_pallas_diff

            strip = rasterize_tiles_pallas_diff(
                shifted, camera.width, strip_h, config
            )
        else:
            from ..ops.rasterize_tiles import rasterize_tiles_jax

            binning = bin_splats(shifted, camera.width, strip_h, config)
            strip = rasterize_tiles_jax(shifted, binning, camera.width, strip_h, config)
        # 4. Gather strips into the full frame (replicated output).
        strips = jax.lax.all_gather(strip, SPLAT_AXIS, axis=0, tiled=False)
        return strips.reshape(padded_h, camera.width, 4)[: camera.height]

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(PartitionSpec(SPLAT_AXIS),),
        out_specs=PartitionSpec(),
        check_vma=False,
    )
    return jax.jit(fn)


def render_strips(g: Gaussians, mesh: Mesh, camera: Camera, **kw) -> jnp.ndarray:
    return render_strips_fn(mesh, camera, **kw)(g)
