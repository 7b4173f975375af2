"""Multi-chip sharding: mesh construction and sharded render/train steps."""

from .mesh import make_mesh, splat_sharding, tile_sharding
from .render_sharded import render_sharded, train_step_sharded
from .strips import render_strips, render_strips_fn

__all__ = [
    "make_mesh",
    "splat_sharding",
    "tile_sharding",
    "render_sharded",
    "train_step_sharded",
    "render_strips",
    "render_strips_fn",
]
