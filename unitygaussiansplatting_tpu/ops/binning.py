"""Depth sorting and screen-tile binning of projected splats.

The reference renders with a global GPU radix sort over view-space depth
followed by hardware alpha blending of instanced quads
(package/Runtime/GpuSorting.cs:142-198, package/Shaders/SplatUtilities.compute:69-82,
RenderGaussianSplats.shader:10-12).  TPUs have no hardware blending, so the
TPU-native formulation is the tile-binned rasterizer of the official 3DGS
CUDA implementation, restructured for static shapes:

1. depth-sort all splats (``jax.lax.sort``; a Pallas radix sort can swap in),
2. duplicate each splat into every screen tile its quad AABB overlaps, into a
   *static* pair budget, using ``jnp.repeat(..., total_repeat_length=K)``,
3. stable-sort pairs by tile id — stability preserves the depth order within
   each tile, so no composite key is needed,
4. per-tile contiguous ranges via ``searchsorted``.

Tiles are ``tile_h x tile_w`` pixels with ``tile_h * tile_w`` a multiple of
128 (the kernels flatten tile pixels to lanes), so the per-tile compositing
kernel runs at full vector utilization; 64x32 is the measured default.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import RasterizeConfig
from .projection import ProjectedSplats


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class TileBinning(NamedTuple):
    """Tile-sorted (splat, tile) pair lists plus per-tile ranges.

    Contains only 1-D arrays: on TPU an (K, small) layout pads the trailing
    dim to the 128-lane tile (a (K, 3) int32 gather output measured 42x
    memory expansion — OOM at bicycle scale), so pairs reference splats by
    *depth rank* with a separate rank->splat table.

    The tile-grid dims are recomputed from (width, height, config) via
    :func:`tile_grid` wherever needed.
    """

    # (K,) int32 identifying the pair's splat, as an index into
    # ``depth_order`` (n = sentinel).  bin_splats produces depth ranks with
    # depth_order the rank->id permutation; the fused pipeline
    # (pair_expand.bin_and_prepare) produces original splat ids with
    # depth_order the identity — consumers must go through ``pair_splat``
    # or ``depth_order`` rather than assuming one convention.
    pair_rank: jnp.ndarray
    pair_tile: jnp.ndarray  # (K,) int32 tile id per pair (num_tiles = sentinel)
    depth_order: jnp.ndarray  # (N,) int32: depth rank -> original splat index
    rank_counts: jnp.ndarray  # (N,) int32: pairs generated per depth rank
    tile_starts: jnp.ndarray  # (T + 1,) int32: pairs of tile t are [s[t], s[t+1])
    num_pairs: jnp.ndarray  # () int32 actual pair count before budget clipping

    @property
    def pair_splat(self) -> jnp.ndarray:
        """(K,) original splat index per pair (n = sentinel); lazy gather."""
        n = self.depth_order.shape[0]
        order_ext = jnp.concatenate(
            [self.depth_order, jnp.asarray([n], jnp.int32)]
        )
        return order_ext[self.pair_rank]


def pair_budget(num_splats: int, config: RasterizeConfig) -> int:
    """Static (splat, tile) pair capacity for a given splat count."""
    k = int(num_splats * config.pair_multiplier)
    return max(cdiv(k, 1024) * 1024, 1024)


def tile_grid(width: int, height: int, config: RasterizeConfig) -> tuple[int, int]:
    return cdiv(width, config.tile_w), cdiv(height, config.tile_h)


def depth_key_bits(num_tiles: int) -> int:
    """Bits of quantized depth available in a fused (tile | depth) 32-bit key.

    The framework-wide compositing order is *quantized* view depth
    (monotone bitcast of the positive f32 depth, top ``db`` bits), ties
    broken by splat index.  The reference sorts the full 32-bit sortable
    float (SplatUtilities.compute:51-57); at >= 12 bits of exponent+mantissa
    the relative depth resolution is <= 2^-5 per octave — indistinguishable
    compositing for real scenes — and the fused key lets one stable K-sort
    replace the reference's separate depth sort entirely.
    """
    tile_vals = num_tiles + 2  # + sentinel tile, exclusive bound
    tb = max(int(tile_vals - 1).bit_length(), 1)
    db = 32 - tb
    if db < 12:
        raise ValueError(f"tile grid too large for fused sort key: {num_tiles} tiles")
    return min(db, 24)


def quantize_depth(depth: jnp.ndarray, bits: int) -> jnp.ndarray:
    """(N,) uint32 monotone depth key in [0, 2^bits) for positive depths."""
    raw = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    raw = jnp.maximum(raw, 0)  # depth <= 0 is culled anyway; clamp for safety
    return (raw >> (32 - bits)).astype(jnp.uint32)


def tile_rects(
    proj: ProjectedSplats,
    width: int,
    height: int,
    config: RasterizeConfig,
):
    """Per-splat tile-rect bounds: (x0, y0, nx, ny, counts, valid).

    Opacity-aware ellipse AABBs when alpha_discard > 0 (output-preserving
    pair reduction — see bin_splats); quad-corner AABBs otherwise.
    """
    tiles_x, tiles_y = tile_grid(width, height, config)
    a1x, a1y = proj.axis1[:, 0], proj.axis1[:, 1]
    a2x, a2y = proj.axis2[:, 0], proj.axis2[:, 1]
    valid = proj.valid
    if config.alpha_discard > 0.0:
        rho = jnp.sqrt(
            jnp.maximum(
                jnp.log(jnp.maximum(proj.opacity, 1e-30) / config.alpha_discard), 0.0
            )
        )
        rx = rho * jnp.sqrt(a1x * a1x + a2x * a2x) * 1.0001 + 0.01
        ry = rho * jnp.sqrt(a1y * a1y + a2y * a2y) * 1.0001 + 0.01
        if config.quad_clip:
            rx = jnp.minimum(rx, 2.0 * (jnp.abs(a1x) + jnp.abs(a2x)) + 0.01)
            ry = jnp.minimum(ry, 2.0 * (jnp.abs(a1y) + jnp.abs(a2y)) + 0.01)
        valid = valid & (proj.opacity >= config.alpha_discard)
    else:
        rx = 2.0 * (jnp.abs(a1x) + jnp.abs(a2x))
        ry = 2.0 * (jnp.abs(a1y) + jnp.abs(a2y))
    cx, cy = proj.center[:, 0], proj.center[:, 1]

    x0 = jnp.clip(jnp.floor((cx - rx) / config.tile_w), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + rx) / config.tile_w) + 1, 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ry) / config.tile_h), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ry) / config.tile_h) + 1, 0, tiles_y).astype(jnp.int32)
    nx = jnp.maximum(x1 - x0, 0)
    ny = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(valid, nx * ny, 0)
    return x0, y0, nx, ny, counts, valid


def slot_demand(proj: ProjectedSplats, width: int, height: int, config) -> jnp.ndarray:
    """Fused-pipeline pair-slot demand: real AABB pairs + one sentinel slot
    per dead or empty splat (pair_expand.bin_and_prepare's budget
    accounting — dead splats keep runs non-empty).  The single source of
    truth for budget sizing and overflow stats.  ``proj`` must already be
    ``tile_common.quantize_view_fp16``-rounded so the bounds see the same
    opacity the pipeline's own bounds see.
    """
    *_, counts, valid = tile_rects(proj, width, height, config)
    # tile_rects zeroes counts for invalid splats, so max(counts, 1) equals
    # "counts for live, 1 sentinel for dead/empty".
    return jnp.sum(jnp.maximum(counts, 1), dtype=jnp.int32)


def bin_splats(
    proj: ProjectedSplats,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
) -> TileBinning:
    """Bin projected splats into depth-ordered per-tile pair lists.

    Splats whose quad AABB misses the screen produce no pairs (the analog of
    the reference's NaN-discard of behind-camera splats plus Unity's clip-space
    quad culling).  If the pair budget overflows, the *deepest* splats lose
    their pairs first — pairs are generated in depth order and truncated at K.

    To render a *viewport* (sub-rectangle) of a frame — e.g. a device's tile
    strip in multi-chip rendering — shift ``proj.center`` by the viewport
    origin and bin/rasterize at the viewport size; the whole pipeline is
    translation-covariant (see parallel/strips.py).
    """
    n = proj.depth.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    k = pair_budget(n, config)

    from .tile_common import quantize_view_fp16

    proj = quantize_view_fp16(proj, config)  # bounds must see rounded opacity
    # Opacity-aware ellipse AABBs (see tile_rects): output-preserving pair
    # reduction vs the reference's fixed +-2 quad (a GPU pays per covered
    # fragment, a TPU per (splat, tile) pair, so tight bounds matter here
    # and not there, RenderGaussianSplats.shader:54-61).
    x0, y0, nx, ny, counts, valid = tile_rects(proj, width, height, config)
    if tiles_x > 511 or tiles_y > 2047:
        raise ValueError(
            f"tile grid {tiles_x}x{tiles_y} exceeds the packed-rect limits "
            "(x0/y0: 11 bits, nx: 9 bits + parity bit)"
        )
    # Per-splat tile rect bit-packed into one word; the *repeat* below
    # carries it directly to pair slots, so the per-pair stage needs no
    # gather at all (a K-sized gather costs ~8 ns/index = ~300 ms at
    # bicycle scale).  Layout: x0[0:11] | y0[11:22] | nx[22:31] | parity[31].
    # The depth-rank parity bit makes adjacent expansion runs distinct even
    # when two consecutive splats share an identical rect, so run starts
    # (and from them the per-pair rank and within-run index) are recoverable
    # from value changes alone.  nx >= 1 for every emitted splat, so the
    # all-zero word is a free sentinel.
    rect_packed = x0 | (y0 << 11) | (jnp.maximum(nx, 1) << 22)

    # Depth-sort the splats by the framework-wide *quantized* depth key
    # (ties broken by index via sort stability — identical order to the
    # fused-key pipeline, see depth_key_bits); invalid and pair-less ones
    # sink to the end so that every live expansion run is non-empty
    # (required by the parity trick) and truncation drops real far pairs
    # last.
    db = depth_key_bits(num_tiles)
    dq = quantize_depth(proj.depth, db)
    sort_key = jnp.where(valid & (counts > 0), dq, jnp.uint32(0xFFFFFFFF))
    _, order, counts_s, rect_s = jax.lax.sort(
        (sort_key, jnp.arange(n, dtype=jnp.int32), counts, rect_packed),
        num_keys=1,
        is_stable=True,
    )

    offsets = jnp.cumsum(counts_s) - counts_s  # exclusive scan
    num_pairs = offsets[-1] + counts_s[-1] if n > 0 else jnp.int32(0)

    # Expand rect words to pair slots.  A sentinel row with a huge count
    # absorbs the slots past `num_pairs`, keeping every shape static.
    parity = (jnp.arange(n, dtype=jnp.int32) & 1) << 31  # rank parity bit
    vals = jnp.concatenate([rect_s | parity, jnp.zeros((1,), jnp.int32)])
    counts_ext = jnp.concatenate([counts_s, jnp.asarray([k], counts_s.dtype)])
    rect_k = jnp.repeat(vals, counts_ext, total_repeat_length=k)

    # Within-run index j = segment iota via a cummax over run starts, and
    # depth rank = run index via a cumsum — scans are ~15x cheaper than
    # K-sized gathers at this scale.
    iota_k = jnp.arange(k, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rect_k[1:] != rect_k[:-1]]
    )
    j = iota_k - jax.lax.cummax(jnp.where(is_start, iota_k, 0))
    slot_rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    is_real = rect_k != 0
    slot_rank = jnp.where(is_real, slot_rank, n)
    snx = jnp.maximum((rect_k >> 22) & 0x1FF, 1)  # sentinel word has nx=0
    # j // snx via reciprocal multiply + exact correction: variable-divisor
    # integer division has no VPU hardware path and dominates otherwise.
    q = jnp.floor(j.astype(jnp.float32) * (1.0 / snx.astype(jnp.float32))).astype(
        jnp.int32
    )
    rem = j - q * snx
    q = jnp.where(rem < 0, q - 1, jnp.where(rem >= snx, q + 1, q))
    rem = j - q * snx
    tx = (rect_k & 0x7FF) + rem
    ty = ((rect_k >> 11) & 0x7FF) + q
    tile_id = jnp.where(is_real, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    # Stable sort by tile id keeps pairs depth-ordered within each tile.
    # The payload is the splat's depth *rank* — consumers gather per-splat
    # data from depth-ordered tables, saving a rank->id indirection here.
    pair_tile, pair_rank = jax.lax.sort(
        (tile_id, slot_rank), num_keys=1, is_stable=True
    )

    tile_starts = jnp.searchsorted(
        pair_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return TileBinning(
        pair_rank=pair_rank,
        pair_tile=pair_tile,
        depth_order=order,
        rank_counts=counts_s,
        tile_starts=tile_starts,
        num_pairs=num_pairs,
    )
