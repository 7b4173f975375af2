"""Mesh-sharded rendering and training steps.

Parallelization strategy (SURVEY.md §2.4 "TPU-native equivalents"):

- **Splat sharding**: RawGaussians/Gaussians arrays are sharded along the
  splat axis; projection is pointwise over splats and runs with zero
  communication.
- **Projected-splat exchange**: compositing needs every projected splat that
  touches a device's tiles.  Round-1 formulation: all-gather the compact
  projected view data (the ~40 B/splat analog of the reference's
  ``SplatViewData``) and let each device bin + composite its own tile shard —
  the collective XLA inserts from the sharding constraints rides the ICI.
  (A conic-AABB-culled all-to-all is the planned refinement, SURVEY §7
  stage 5.)
- **Tile sharding**: the (T, P, 4) tile buffer is sharded over the same
  devices; the final untile into an (H, W, 4) image gathers tiles.
- **Gradients**: splat parameters are *owned* (sharded), so their gradients
  are sharded too — reverse-mode AD of the all-gather yields the
  reduce-scatter automatically; no explicit psum is needed until replicated
  parameters (e.g. cameras) become trainable.

Everything is expressed with ``jax.jit`` + ``with_sharding_constraint``
(GSPMD), so the same code runs on 1 chip, a host's 8 chips, or a pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.camera import Camera
from ..models.gaussians import Gaussians, RawGaussians
from ..ops.binning import bin_splats
from ..ops.projection import project_splats
from ..ops.rasterize_tiles import rasterize_tiles_jax
from ..utils.config import RasterizeConfig, RenderSettings
from .mesh import SPLAT_AXIS


def _constrain(tree, sharding):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), tree
    )


def render_sharded_fn(
    mesh: Mesh,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
):
    """Build the jitted sharded render function for a mesh + camera."""
    shard = NamedSharding(mesh, PartitionSpec(SPLAT_AXIS))
    rep = NamedSharding(mesh, PartitionSpec())

    def fn(g: Gaussians) -> jnp.ndarray:
        # Pointwise projection stays splat-sharded (no comms).
        proj = project_splats(g, camera, settings)
        proj = _constrain(proj, shard)
        # Compact view data is exchanged (all-gather over ICI); the raw
        # parameters never leave their owner device.
        proj = _constrain(proj, rep)
        binning = bin_splats(proj, camera.width, camera.height, config)
        img = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
        return img

    return jax.jit(fn, in_shardings=(shard,), out_shardings=rep)


def render_sharded(g: Gaussians, mesh: Mesh, camera: Camera, **kw) -> jnp.ndarray:
    return render_sharded_fn(mesh, camera, **kw)(g)


def train_step_sharded_fn(
    mesh: Mesh,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    lr: float = 1e-3,
):
    """Jitted (loss, params) SGD step against a target image.

    The minimal end-to-end training step the reference has no analog for:
    forward render, L2 image loss, reverse-mode AD through compositing /
    binning / projection, SGD update on the sharded raw parameters.
    """
    shard = NamedSharding(mesh, PartitionSpec(SPLAT_AXIS))
    rep = NamedSharding(mesh, PartitionSpec())

    def loss_fn(raw: RawGaussians, target: jnp.ndarray) -> jnp.ndarray:
        g = raw.activate()
        proj = project_splats(g, camera, settings)
        proj = _constrain(proj, shard)
        proj = _constrain(proj, rep)
        binning = bin_splats(proj, camera.width, camera.height, config)
        img = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
        return jnp.mean(jnp.square(img - target))

    def step(raw: RawGaussians, target: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(raw, target)
        new = jax.tree_util.tree_map(lambda p, dg: p - lr * dg, raw, grads)
        return loss, new

    return jax.jit(
        step,
        in_shardings=(shard, rep),
        out_shardings=(rep, shard),
        donate_argnums=(0,),
    )


def train_step_sharded(raw: RawGaussians, target, mesh: Mesh, camera: Camera, **kw):
    return train_step_sharded_fn(mesh, camera, **kw)(raw, target)
