"""Tile-binned front-to-back rasterization (XLA path).

The production replacement for the reference's instanced-quad draw + hardware
blending (RenderGaussianSplats.shader, GaussianSplatRenderer.cs:108-169):
tiles are composited owner-computes, each tile walking its depth-ordered pair
range in chunks (see tile_common.py for the chunk math).  This module is the
pure-XLA implementation — correctness path, autodiff path, and the semantics
the Pallas kernel (rasterize_pallas.py) must match bit-for-bit.

Memory note: the vmapped-over-tiles scan materializes (T, C, P) alphas per
step; fine for test-sized images.  The Pallas kernel streams per-tile and has
no such blow-up — prefer it for large frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import RasterizeConfig
from .binning import TileBinning, cdiv, tile_grid
from .projection import ProjectedSplats
from .tile_common import chunk_alphas, composite_chunk


def gather_pair_data(proj: ProjectedSplats, binning: TileBinning, chunk: int):
    """Gather per-pair splat view data, padded by one chunk of dead slots.

    One dense XLA gather turns the rasterizer's random access into purely
    sequential reads — the TPU analog of the reference's ``_OrderBuffer``
    indirection in the vertex shader (RenderGaussianSplats.shader:38).
    """
    n = proj.depth.shape[0]
    ids = binning.pair_splat
    real = ids < n
    safe = jnp.minimum(ids, n - 1)
    pad = ((0, chunk),)
    center = jnp.pad(proj.center[safe], pad + ((0, 0),))
    axis1 = jnp.pad(proj.axis1[safe], pad + ((0, 0),))
    axis2 = jnp.pad(proj.axis2[safe], pad + ((0, 0),))
    color = jnp.pad(proj.color[safe], pad + ((0, 0),))
    opacity = jnp.pad(jnp.where(real, proj.opacity[safe], 0.0), pad)
    return center, axis1, axis2, color, opacity


def rasterize_tiles_jax(
    proj: ProjectedSplats,
    binning: TileBinning,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
) -> jnp.ndarray:
    """Composite tile-binned splats; returns (H, W, 4) premultiplied RGBA.

    ``config.max_pairs_per_tile`` is the static per-tile work cap (XLA needs a
    static trip count; the Pallas kernel instead loops to the true per-tile
    count).
    """
    from .tile_common import quantize_view_fp16

    proj = quantize_view_fp16(proj, config)
    th, tw = config.tile_h, config.tile_w
    chunk = config.chunk_size
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    p = th * tw
    max_chunks = cdiv(config.max_pairs_per_tile, chunk)

    center, axis1, axis2, color, opacity = gather_pair_data(proj, binning, chunk)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = tile_ids % tiles_x
    ty = tile_ids // tiles_x
    # Pixel-center coordinates of each tile's pixels, flattened row-major.
    ix = jnp.arange(tw, dtype=jnp.float32) + 0.5
    iy = jnp.arange(th, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(
        tx[:, None, None] * tw + ix[None, None, :], (num_tiles, th, tw)
    ).reshape(num_tiles, p)
    py = jnp.broadcast_to(
        ty[:, None, None] * th + iy[None, :, None], (num_tiles, th, tw)
    ).reshape(num_tiles, p)

    starts = binning.tile_starts[:-1]
    counts = binning.tile_starts[1:] - starts

    def tile_body(start, count, pxs, pys):
        def step(carry, i):
            rgb, acc_a, t = carry
            base = start + i * chunk
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, base, chunk, axis=0)
            m = (base + jnp.arange(chunk, dtype=jnp.int32)) < (start + count)
            alphas = chunk_alphas(
                sl(center), sl(axis1), sl(axis2), sl(opacity), pxs, pys, config
            )
            alphas = jnp.where(m[:, None], alphas, 0.0)
            d_rgb, d_a, t = composite_chunk(t, alphas, sl(color))
            return (rgb + d_rgb, acc_a + d_a, t), None

        init = (
            jnp.zeros((p, 3), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.ones((p,), jnp.float32),
        )
        (rgb, acc_a, _), _ = jax.lax.scan(
            step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        return rgb, acc_a

    rgb, acc_a = jax.vmap(tile_body)(starts, counts, px, py)

    # Untile into the padded image, then crop.
    rgba = jnp.concatenate([rgb, acc_a[..., None]], axis=-1)  # (T, P, 4)
    img = rgba.reshape(tiles_y, tiles_x, th, tw, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * th, tiles_x * tw, 4)
    return img[:height, :width]
