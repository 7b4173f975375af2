"""Pallas TPU kernel: tile-binned front-to-back compositing.

The hand-written replacement for the XLA tile rasterizer
(rasterize_tiles.py) — the hot kernel of the whole framework, standing in for
the reference's fragment-shader blending (RenderGaussianSplats.shader:79-108
plus the hardware OneMinusDstAlpha/One blend).  Same math, restructured for
the TPU pipeline model:

- The (splat, tile) pairs produced by binning are padded so every tile owns a
  whole number of C-sized chunks, then laid out as one dense (G, 16, C)
  field-major array (G = total chunks, C = chunk size = lane width).
- The kernel runs on a **1-D grid over chunks** with
  ``PrefetchScalarGridSpec``: a prefetched ``chunk_tile`` map drives the
  *output* BlockSpec, so all chunks of a tile revisit the same (4, P) output
  block, which Pallas keeps resident in VMEM across consecutive grid steps —
  the per-tile compositing state (accumulated premultiplied RGB + coverage)
  never round-trips to HBM mid-tile.  Pair blocks are streamed in by the
  automatic pipeline (double-buffered HBM->VMEM DMA).
- Per chunk: alphas for C splats x P pixels on the VPU, per-pixel
  transmittance via a cumulative product along the chunk axis, color
  accumulation as masked reductions.  Transmittance is recovered exactly from
  the stored coverage (T = 1 - a), so no extra carry buffer is needed.
- Early-out: when a tile's max transmittance has dropped below
  ``transmittance_eps``, remaining chunks of that tile skip all compute
  (``@pl.when``), mirroring the official 3DGS saturation exit.

Why not a kernel-per-tile grid with manual DMA?  Ragged per-tile pair counts
would force dynamic-length DMA loops; padding each tile to chunk multiples
costs at most T*C pairs (<1% at scale) and turns the whole rasterizer into a
shape-static streaming pipeline, which is exactly what the TPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import RasterizeConfig
from .binning import TileBinning, cdiv, tile_grid
from .projection import ProjectedSplats

# Rows in the field-major pair block: cx, cy, a1x, a1y, a2x, a2y, r, g, b,
# opacity (+ padding to 16 for sublane alignment).
_FIELDS = 16


def _pad_tiles_to_chunks(
    proj: ProjectedSplats, binning: TileBinning, num_tiles: int, chunk: int
):
    """Re-layout tile-sorted pairs so each tile's range is chunk-aligned.

    Returns (fields (G, 16, C), chunk_tile (G,), padded_starts (T+1,)) where
    G is the static total chunk budget.  Slots not covered by a real pair
    have opacity 0 (they contribute nothing).
    """
    n = proj.depth.shape[0]
    k = binning.pair_splat.shape[0]
    counts = binning.tile_starts[1:] - binning.tile_starts[:-1]  # (T,)
    # Every tile gets at least one chunk so its output block is always
    # initialized by the kernel's first-chunk zeroing.
    padded_counts = jnp.maximum(cdiv_j(counts, chunk), 1) * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )
    k_pad = k + num_tiles * chunk  # static upper bound on padded total
    g = k_pad // chunk

    # Scatter each real pair to its padded position.
    pair_pos = jnp.arange(k, dtype=jnp.int32)
    tile = jnp.minimum(binning.pair_tile, num_tiles - 1)
    real = binning.pair_tile < num_tiles
    new_pos = padded_starts[tile] + (pair_pos - binning.tile_starts[tile])
    new_pos = jnp.where(real, new_pos, k_pad - 1)  # park sentinels in last slot

    ids = binning.pair_splat
    safe = jnp.minimum(ids, n - 1)
    gath = lambda a: a[safe]
    field_vals = jnp.stack(
        [
            gath(proj.center[:, 0]),
            gath(proj.center[:, 1]),
            gath(proj.axis1[:, 0]),
            gath(proj.axis1[:, 1]),
            gath(proj.axis2[:, 0]),
            gath(proj.axis2[:, 1]),
            gath(proj.color[:, 0]),
            gath(proj.color[:, 1]),
            gath(proj.color[:, 2]),
            jnp.where(real, gath(proj.opacity), 0.0),
        ],
        axis=-1,
    )  # (K, 10)

    dense = jnp.zeros((k_pad, _FIELDS), jnp.float32)
    dense = dense.at[new_pos, :10].set(field_vals, mode="drop")
    # Clear the sentinel parking slot unless a real pair legitimately landed
    # there (it cannot: real padded positions are < padded_total <= k_pad - 1
    # only when budgets are tight; opacity 0 there is the safe default).
    fields = dense.reshape(g, chunk, _FIELDS).transpose(0, 2, 1)  # (G, 16, C)

    # chunk_tile: which tile each chunk belongs to; trailing chunks -> dummy
    # tile index `num_tiles` (extra output block, dropped afterwards).
    chunks_per_tile = padded_counts // chunk
    counts_ext = jnp.concatenate(
        [chunks_per_tile, jnp.asarray([g], jnp.int32)]
    )
    chunk_tile = jnp.repeat(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), counts_ext, total_repeat_length=g
    )
    return fields, chunk_tile, padded_starts


def cdiv_j(a, b):
    return -(-a // b)


def _cumprod_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along axis 0, Mosaic-compatible.

    jnp.cumprod has no Pallas TPU lowering; Hillis-Steele doubling gives the
    exact same result in log2(C) shifted multiplies (7 for C=128).
    """
    c = x.shape[0]
    shift = 1
    while shift < c:
        # lax.slice_in_dim (static slice) — jnp's basic indexing lowers via
        # dynamic_slice, which has no Mosaic rule.
        head = jax.lax.slice_in_dim(x, 0, c - shift, axis=0)
        ones = jnp.ones((shift,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([ones, head], axis=0)
        shift *= 2
    return x


def _kernel(
    chunk_tile_ref,  # (G,) int32, scalar-prefetch
    fields_ref,  # (1, 16, C) VMEM block for this chunk
    out_ref,  # (1, 4, P) VMEM block for this chunk's tile
    *,
    config: RasterizeConfig,
    tiles_x: int,
):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    prev_t = chunk_tile_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, t != prev_t)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    th, tw = config.tile_h, config.tile_w
    p = th * tw

    coverage = out_ref[0, 3, :]  # (P,) accumulated alpha = 1 - transmittance
    transmittance = 1.0 - coverage

    @pl.when(jnp.max(transmittance) >= config.transmittance_eps)
    def _():
        # Pixel-center coordinates of this tile, flattened row-major (th, tw).
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)  # iota must be int
        px = tx * tw + (lane % tw).astype(jnp.float32) + 0.5  # (1, P)
        py = ty * th + (lane // tw).astype(jnp.float32) + 0.5

        col = lambda r: fields_ref[0, r, :][:, None]  # (C, 1) via native ref read
        cx, cy = col(0), col(1)
        a1x, a1y, a2x, a2y = col(2), col(3), col(4), col(5)
        cr, cg, cb, op = col(6), col(7), col(8), col(9)

        dx = px - cx  # (C, P)
        dy = py - cy
        a1_sq = jnp.maximum(a1x * a1x + a1y * a1y, 1e-12)
        a2_sq = jnp.maximum(a2x * a2x + a2y * a2y, 1e-12)
        qx = (dx * a1x + dy * a1y) / a1_sq
        qy = (dx * a2x + dy * a2y) / a2_sq
        power = -(qx * qx + qy * qy)
        alpha = jnp.exp(power) * op
        alpha = jnp.clip(alpha, 0.0, config.alpha_max)
        keep = alpha >= config.alpha_discard
        if config.quad_clip:
            keep &= (jnp.abs(qx) <= 2.0) & (jnp.abs(qy) <= 2.0)
        alpha = jnp.where(keep, alpha, 0.0)

        c = alpha.shape[0]
        one_minus = 1.0 - alpha
        cum = _cumprod_axis0(one_minus)  # (C, P) inclusive prefix product
        head = jax.lax.slice_in_dim(cum, 0, c - 1, axis=0)
        excl = jnp.concatenate([jnp.ones((1, p), cum.dtype), head], axis=0)
        w = excl * alpha * transmittance[None, :]  # (C, P)
        # Chunk transmittance factor = last cumprod row (reduce_prod has no
        # Mosaic rule); lax.slice + reshape avoid jnp's dynamic_slice path.
        total = jnp.reshape(jax.lax.slice_in_dim(cum, c - 1, c, axis=0), (p,))

        out_ref[0, 0, :] += jnp.sum(w * cr, axis=0)
        out_ref[0, 1, :] += jnp.sum(w * cg, axis=0)
        out_ref[0, 2, :] += jnp.sum(w * cb, axis=0)
        out_ref[0, 3, :] = 1.0 - transmittance * total


def rasterize_tiles_pallas(
    proj: ProjectedSplats,
    binning: TileBinning,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Composite tile-binned splats with the Pallas kernel; (H, W, 4) RGBA."""
    th, tw = config.tile_h, config.tile_w
    chunk = config.chunk_size
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    p = th * tw

    fields, chunk_tile, _ = _pad_tiles_to_chunks(proj, binning, num_tiles, chunk)
    g = fields.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, _FIELDS, chunk), lambda i, ct: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, p), lambda i, ct: (ct[i], 0, 0)),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, config=config, tiles_x=tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 4, p), jnp.float32),
        interpret=interpret,
    )(chunk_tile, fields)

    # Untile: (T, 4, P) -> (H, W, 4).
    img = out[:num_tiles].reshape(tiles_y, tiles_x, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * th, tiles_x * tw, 4)
    return img[:height, :width]
