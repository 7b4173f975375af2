"""Pallas TPU kernel: backward pass of tile-binned compositing.

The hand-written VJP of composite_pallas (rasterize_pallas.py) — the
capability the reference lacks entirely (no backward anywhere, SURVEY.md §0)
and the piece XLA autodiff cannot deliver at scale (its transpose of the
per-tile scan materializes lane-padded pair buffers and OOMs at bicycle
size).

Math (standard 3DGS compositing gradients, e.g. Kerbl et al. supplemental):
with per-pair alpha a_i, color c_i, entry transmittance T_i and upstream
gradients D = dL/dC (premultiplied rgb) and dA = dL/dA (coverage):

    dL/dc_i = w_i * D,                    w_i = T_i * a_i
    dL/da_i = D . (T_i c_i - S_i/(1-a_i)) + dA * T_N/(1-a_i)

where S_i is the suffix contribution after i and T_N the final
transmittance.  Only the projection D . S_i is needed, and it is computed
*forward* as D . C_total - prefix_i(u) with u_i = w_i * (D . c_i), using
the saved forward output — so the kernel is a second forward walk with the
same schedule, chunk math and VMEM-resident per-tile state as the forward
kernel (state here: running prefix of u + running transmittance), and a
single in-chunk prefix sum.

Outputs are per-*step* gradient blocks for the 10 view-data fields
(bf16-packed into 5 u32 rows when config.pack_grads_bf16); the XLA-side
glue folds boundary-step duplicates (steps_to_pair_gradients: per-block
takes plus one sanctioned O(num_tiles) scatter-add of the few boundary
extras — tiny, unlike the K-sized segment_sum scatter that measured 286 ms
*per column* at 24M pairs), un-permutes the tile sort with one
payload-carrying sort keyed on splat id, and segment-reduces the contiguous
runs (Pallas run-reduce kernel on the packed path, cumsum differences
otherwise).  Nothing pair-sized is ever scattered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import RasterizeConfig
from .binning import TileBinning, tile_grid
from .rasterize_pallas import _FIELDS, _cumprod_axis0, _unpack_tile


def _cumsum_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 (jnp.cumsum has no Mosaic rule)."""
    c = x.shape[0]
    shift = 1
    while shift < c:
        head = jax.lax.slice_in_dim(x, 0, c - shift, axis=0)
        zeros = jnp.zeros((shift,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([zeros, head], axis=0)
        shift *= 2
    return x


def _bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """bf16 bit pattern (as u32) of an f32, round-to-nearest-even.

    Mosaic-safe manual truncation (bf16 shares the f32 exponent layout, so
    RNE is pure integer arithmetic on the f32 word); matches XLA's
    f32->bf16 convert bit-for-bit on finite values.  ±0 is canonicalized to
    +0 first — the packed-gradient fold relies on "lanes outside a step's
    window pack to u32 zero" so disjoint-window step rows can be folded
    with integer adds.
    """
    x = jnp.where(x == 0.0, 0.0, x)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) >> 16


def _bwd_kernel(
    step_tile_ref,  # (S,) int32, scalar-prefetch
    tile_starts_ref,  # (T + 1,) int32
    first_step_ref,  # (T + 1,) int32
    fields_ref,  # (1, 16, C) pair view data for this step's block
    fwd_ref,  # (1, 4, P) forward output of this tile (premult rgb + coverage)
    dout_ref,  # (1, 4, P) upstream gradient for this tile
    dfields_ref,  # OUT per-step field gradients: (1, 16, C) f32, or
    #              (1, 8, C) u32 bf16-pairs when pack_grads (rows 0-4 used)
    state_ref,  # (1, 4, P) OUT (revisited): row 0 prefix of u, row 3 transmittance
    *,
    config: RasterizeConfig,
    tiles_x: int,
    num_tiles: int,
    pack_grads: bool,
):
    chunk = fields_ref.shape[2]
    i = pl.program_id(0)
    t = _unpack_tile(step_tile_ref, i)
    prev_t = _unpack_tile(step_tile_ref, jnp.maximum(i - 1, 0))
    is_first = jnp.logical_or(i == 0, t != prev_t)

    th, tw = config.tile_h, config.tile_w
    p = th * tw

    @pl.when(is_first)
    def _():
        # rgb prefix = 0, transmittance = 1 (array .at[].set would lower to
        # an unsupported in-kernel scatter).
        state_ref[...] = jnp.concatenate(
            [jnp.zeros((1, 3, p), jnp.float32), jnp.ones((1, 1, p), jnp.float32)],
            axis=1,
        )

    dfields_ref[...] = jnp.zeros_like(dfields_ref)

    t_safe = jnp.minimum(t, num_tiles - 1)
    t_start = tile_starts_ref[t_safe]
    t_end = tile_starts_ref[t_safe + 1]
    block = t_start // chunk + (i - first_step_ref[t_safe])
    lo = jnp.clip(t_start - block * chunk, 0, chunk)
    hi = jnp.clip(t_end - block * chunk, 0, chunk)
    transmittance = state_ref[0, 3, :]
    live = (t < num_tiles) & (hi > lo)

    @pl.when(live & (jnp.max(transmittance) >= config.transmittance_eps))
    def _():
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        lane_px = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        px = tx * tw + (lane_px % tw).astype(jnp.float32) + 0.5
        py = ty * th + (lane_px // tw).astype(jnp.float32) + 0.5

        col = lambda r: fields_ref[0, r, :][:, None]  # (C, 1)
        cx, cy = col(0), col(1)
        a1x, a1y, a2x, a2y = col(2), col(3), col(4), col(5)
        cr, cg, cb, op = col(6), col(7), col(8), col(9)

        dx = px - cx
        dy = py - cy
        v1 = jnp.maximum(a1x * a1x + a1y * a1y, 1e-12)
        v2 = jnp.maximum(a2x * a2x + a2y * a2y, 1e-12)
        inv1 = 1.0 / v1  # (C, 1): all (C, P)-scale divides become FMAs
        inv2 = 1.0 / v2
        # Same term order as the forward kernel (bit-exact alpha replay).
        qx = dx * (a1x / v1) + dy * (a1y / v1)
        qy = dx * (a2x / v2) + dy * (a2y / v2)
        power = -(qx * qx + qy * qy)
        expp = jnp.exp(power)
        alpha_raw = expp * op
        clipped = alpha_raw > config.alpha_max
        alpha = jnp.minimum(alpha_raw, config.alpha_max)
        keep = alpha >= config.alpha_discard
        if config.quad_clip:
            keep &= (jnp.abs(qx) <= 2.0) & (jnp.abs(qy) <= 2.0)
        c = alpha.shape[0]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        keep &= (lane_c >= lo) & (lane_c < hi)
        alpha = jnp.where(keep, alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = _cumprod_axis0(one_minus)
        head = jax.lax.slice_in_dim(cum, 0, c - 1, axis=0)
        excl = jnp.concatenate([jnp.ones((1, p), cum.dtype), head], axis=0)
        t_i = transmittance[None, :] * excl  # (C, P) entry transmittance
        w = t_i * alpha

        # Forward totals and upstream grads for this tile.
        c_tot_r = fwd_ref[0, 0, :]
        c_tot_g = fwd_ref[0, 1, :]
        c_tot_b = fwd_ref[0, 2, :]
        t_final = 1.0 - fwd_ref[0, 3, :]  # (P,)
        d_r = dout_ref[0, 0, :]
        d_g = dout_ref[0, 1, :]
        d_b = dout_ref[0, 2, :]
        d_a = dout_ref[0, 3, :]

        # dL/dalpha only consumes the suffix through D . S_i, so scan the
        # single projected series u_i = w_i * (D . c_i) instead of three
        # per-channel weighted-color series — one Hillis-Steele cumsum where
        # the first version of this kernel ran three.
        e = cr * d_r[None, :] + cg * d_g[None, :] + cb * d_b[None, :]  # D . c_i
        pref_u = state_ref[0, 0, :][None, :] + _cumsum_axis0(w * e)
        d_ctot = d_r * c_tot_r + d_g * c_tot_g + d_b * c_tot_b  # (P,) D . C_tot
        d_suffix = d_ctot[None, :] - pref_u  # (C, P) D . S_i

        inv_om = 1.0 / jnp.maximum(one_minus, 1e-6)
        # dL/dalpha_i per pixel (C, P).
        dalpha = (
            t_i * e
            - d_suffix * inv_om
            + d_a[None, :] * t_final[None, :] * inv_om
        )
        dalpha = jnp.where(keep & (~clipped), dalpha, 0.0)

        # Geometry chain: alpha -> (qx, qy) -> (center, axes).
        gx = dalpha * (-2.0 * qx) * alpha  # dL/dqx
        gy = dalpha * (-2.0 * qy) * alpha
        dexp = dalpha * expp  # dL/dop per pixel (dalpha/dop = exp(power))

        # All ten per-field pixel reductions collapse into four tiny MXU
        # matvecs: the per-pair constants (a*, inv*, cx, cy) factor out of
        # every sum, leaving only sums of gx/gy against [1, pxl, pyl]
        # (tile-local pixel coords, dx = pxl - cxl) and of dexp/w against
        # [1, d_r, d_g, d_b].  Replaces ten (C, P) VPU lane reductions
        # (the kernel's largest op family) with 4 x (8, P)x(C, P) dots on
        # the otherwise-idle MXU.  Precision (Mosaic lowers only DEFAULT
        # and HIGHEST): on the packed-bf16 gradient path the single-pass
        # DEFAULT is used — its ~0.4% per-element lhs rounding sits inside
        # the band the output packing imposes anyway — while the strict
        # f32 path pays HIGHEST to keep the sums at f32 fidelity.  The
        # pixel columns ride doubled (odd integers <= 2*max(th,tw)-1 —
        # bf16-exact below 256, so DEFAULT does not round them) and are
        # halved after the dot.
        lane_one = jnp.ones((1, p), jnp.float32)
        zero_row = jnp.zeros((1, p), jnp.float32)
        px2 = (2 * (lane_px % tw) + 1).astype(jnp.float32)  # 2 * tile-local px
        py2 = (2 * (lane_px // tw) + 1).astype(jnp.float32)
        rhs_geo = jnp.concatenate(
            [lane_one, px2, py2] + [zero_row] * 5, axis=0
        )  # (8, P)
        rhs_cb = jnp.concatenate(
            [lane_one, d_r[None, :], d_g[None, :], d_b[None, :]] + [zero_row] * 4,
            axis=0,
        )  # (8, P)
        dn = (((1,), (1,)), ((), ()))
        prec = (
            jax.lax.Precision.DEFAULT if pack_grads else jax.lax.Precision.HIGHEST
        )
        dot = lambda a, b: jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32, precision=prec
        )  # (8, C)
        sg_x = dot(rhs_geo, gx)
        sg_y = dot(rhs_geo, gy)
        s_de = dot(rhs_cb, dexp)
        s_w = dot(rhs_cb, w)

        raw = lambda r: fields_ref[0, r, :]  # (C,)
        a1xr, a1yr, a2xr, a2yr = raw(2), raw(3), raw(4), raw(5)
        inv1r = 1.0 / jnp.maximum(a1xr * a1xr + a1yr * a1yr, 1e-12)
        inv2r = 1.0 / jnp.maximum(a2xr * a2xr + a2yr * a2yr, 1e-12)
        cxl = raw(0) - tx * tw  # tile-local center (dx = pxl - cxl)
        cyl = raw(1) - ty * th
        sgx, sgy = sg_x[0, :], sg_y[0, :]
        sgx_dx = 0.5 * sg_x[1, :] - cxl * sgx
        sgx_dy = 0.5 * sg_x[2, :] - cyl * sgx
        sgy_dx = 0.5 * sg_y[1, :] - cxl * sgy
        sgy_dy = 0.5 * sg_y[2, :] - cyl * sgy
        sgx_qx = (a1xr * sgx_dx + a1yr * sgx_dy) * inv1r  # sum gx * qx
        sgy_qy = (a2xr * sgy_dx + a2yr * sgy_dy) * inv2r
        rows = [
            -(a1xr * inv1r) * sgx - (a2xr * inv2r) * sgy,  # d cx
            -(a1yr * inv1r) * sgx - (a2yr * inv2r) * sgy,  # d cy
            (sgx_dx - 2.0 * sgx_qx * a1xr) * inv1r,  # d a1x
            (sgx_dy - 2.0 * sgx_qx * a1yr) * inv1r,  # d a1y
            (sgy_dx - 2.0 * sgy_qy * a2xr) * inv2r,  # d a2x
            (sgy_dy - 2.0 * sgy_qy * a2yr) * inv2r,  # d a2y
            # Color gradients: dL/dc_i = sum_px w_i * D.
            s_w[1, :], s_w[2, :], s_w[3, :],
            # Opacity: sum_px dalpha * exp(power).
            s_de[0, :],
        ]
        if pack_grads:
            # Emit bf16 pairs directly: halves the per-step output rows and
            # hands pair_gradients_to_splats its sort payloads pre-packed
            # (the XLA-side pack pass + the (F, K) transpose disappear).
            for j in range(5):
                dfields_ref[0, j, :] = _bf16_bits(rows[2 * j]) | (
                    _bf16_bits(rows[2 * j + 1]) << 16
                )
        else:
            for j, r in enumerate(rows):
                dfields_ref[0, j, :] = r

        # Advance state: prefix of u and transmittance after this chunk.
        last = lambda a: jnp.reshape(jax.lax.slice_in_dim(a, c - 1, c, axis=0), (p,))
        state_ref[0, 0, :] = last(pref_u)
        state_ref[0, 3, :] = transmittance * last(cum)


def composite_pallas_bwd(
    fields: jnp.ndarray,  # (G, 16, C)
    schedule,
    fwd_raw: jnp.ndarray,  # (T + 1, 4, P) forward kernel output
    dout_raw: jnp.ndarray,  # (T + 1, 4, P) upstream grads, tile layout
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel; returns per-step field grads —
    (S, 16, C) f32, or (S, 8, C) u32 bf16-pairs when config.pack_grads_bf16."""
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    th, tw = config.tile_h, config.tile_w
    p = th * tw
    step_tile, tile_starts, first_step = schedule
    s = 2 * step_tile.shape[0]
    chunk = fields.shape[2]
    g = fields.shape[0]
    pack_grads = bool(getattr(config, "pack_grads_bf16", False))
    nf, odt = (8, jnp.uint32) if pack_grads else (_FIELDS, jnp.float32)

    def in_block(i, st, ts, fs):
        t = jnp.minimum(_unpack_tile(st, i), num_tiles - 1)
        block = ts[t] // chunk + (i - fs[t])
        return (jnp.clip(block, 0, g - 1), 0, 0)

    tile_block = lambda i, st, ts, fs: (_unpack_tile(st, i), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, _FIELDS, chunk), in_block),
            pl.BlockSpec((1, 4, p), tile_block),
            pl.BlockSpec((1, 4, p), tile_block),
        ],
        out_specs=(
            pl.BlockSpec((1, nf, chunk), lambda i, st, ts, fs: (i, 0, 0)),
            pl.BlockSpec((1, 4, p), tile_block),
        ),
    )

    dfields_steps, _state = pl.pallas_call(
        functools.partial(
            _bwd_kernel, config=config, tiles_x=tiles_x, num_tiles=num_tiles,
            pack_grads=pack_grads,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s, nf, chunk), odt),
            jax.ShapeDtypeStruct((num_tiles + 1, 4, p), jnp.float32),
        ),
        interpret=interpret
        or __import__(
            "unitygaussiansplatting_tpu.ops.rasterize_pallas", fromlist=["_interp"]
        )._interp(),
    )(step_tile, tile_starts, first_step, fields, fwd_raw, dout_raw)
    return dfields_steps


def steps_to_pair_gradients(
    dfields_steps: jnp.ndarray,  # (S, 16, C)
    binning: TileBinning,
    num_tiles: int,
    chunk: int,
) -> jnp.ndarray:
    """Fold per-step grads to per-pair-block grads (G, 16, C).

    Steps visit blocks in non-decreasing order; a block shared by two tiles
    is visited by two *adjacent* steps with disjoint lane windows, so the
    fold is one add of the following step where it targets the same block.
    """
    k = binning.pair_rank.shape[0]
    g = k // chunk
    s = dfields_steps.shape[0]

    starts = binning.tile_starts[:-1]
    ends = binning.tile_starts[1:]
    counts = ends - starts
    first_block = starts // chunk
    last_block = jnp.where(counts > 0, (ends - 1) // chunk, first_block)
    steps_per_tile = jnp.where(counts > 0, last_block - first_block + 1, 1)
    first_step = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(steps_per_tile).astype(jnp.int32)]
    )

    # block id of each real step (tile-granularity construction).
    spt_ext = jnp.concatenate([steps_per_tile, jnp.asarray([s], jnp.int32)])
    step_tile = jnp.repeat(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), spt_ext, total_repeat_length=s
    )
    iota_s = jnp.arange(s, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), step_tile[1:] != step_tile[:-1]])
    step_rank = iota_s - jax.lax.cummax(jnp.where(is_start, iota_s, 0))
    t_safe = jnp.minimum(step_tile, num_tiles - 1)
    block_of_step = jnp.where(
        step_tile < num_tiles, first_block[t_safe] + step_rank, g
    )

    # Within a tile the visited block strictly increases, so a block is
    # revisited only across a tile transition — at most one "extra" step per
    # transition, <= T + 1 in total.  Fold as: one row-take of each block's
    # first step + a tiny compaction (sort of S keys) and scatter-add of the
    # extra steps.  Replaces a K-sized cumsum + two big takes (~146 ms at
    # bicycle scale) with ~K bytes of takes + an O(T) scatter.  Only the
    # first 10 field rows (5 packed) carry gradients — drop padding first.
    # On the packed-u32 path the adds stay exact: steps sharing a block have
    # disjoint lane windows and the kernel packs out-of-window lanes to u32
    # zero (±0 canonicalized), so every add has a zero operand.
    nf = 5 if dfields_steps.dtype == jnp.uint32 else 10
    dfields_steps = dfields_steps[:, :nf, :]
    blocks = jnp.arange(g, dtype=jnp.int32)
    # method="sort": the scan (binary-search) lowering costs ~40 ms for G
    # queries in an S-length table; the merge-by-sort lowering ~16 ms.
    first = jnp.searchsorted(
        block_of_step, blocks, side="left", method="sort"
    ).astype(jnp.int32)
    first_c = jnp.minimum(first, s - 1)
    has_step = jnp.take(block_of_step, first_c) == blocks
    taken = jnp.take(dfields_steps, first_c, axis=0)
    base = jnp.where(has_step[:, None, None], taken, jnp.zeros_like(taken))

    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), block_of_step[:-1]])
    is_extra = (block_of_step == prev) & (block_of_step < g)
    ecap = min(num_tiles + 2, s)
    keyv = jnp.where(is_extra, 0, 1).astype(jnp.int32)
    k_sorted, pos_sorted = jax.lax.sort((keyv, iota_s), num_keys=1, is_stable=True)
    pos = pos_sorted[:ecap]
    live_e = k_sorted[:ecap] == 0
    blk = jnp.where(live_e, jnp.take(block_of_step, pos), g)
    rows = jnp.take(dfields_steps, pos, axis=0)  # (ecap, 10, C)
    extra = jnp.zeros((g + 1,) + base.shape[1:], base.dtype).at[blk].add(rows)
    return base + extra[:g]  # (G, 10, C)


def _run_reduce_kernel(
    r0_ref,  # (G2,) int32 scalar-prefetch: first splat of each block's window
    splat_ref,  # (1, 1, C) int32 ROW: sorted splat id of each pair
    g0_ref,  # (1, 1, C) u32 bf16-packed grad rows (0, 1)
    g1_ref,  # rows (2, 3)
    g2_ref,  # rows (4, 5)
    g3_ref,  # rows (6, 7)
    g4_ref,  # rows (8, 9)
    out_lo_ref,  # (1, 16, C) f32 partial sums for splats [b*C, b*C + C)
    out_hi_ref,  # (1, 16, C) f32 partial sums for splats [b*C + C, b*C + 2C)
):
    """Segment-reduce contiguous per-splat runs of pair gradients on the MXU.

    The inverse of the expansion kernel's one-hot gather: each grid step
    covers C pairs (sorted by splat id, so runs are contiguous and the C
    pairs reference splats [r0, r0 + 2C) of the aligned window b = r0 // C),
    builds a one-hot from the pairs' OWN splat ids (they rode the grouping
    sort as its key, so they arrive for free — the first version recounted
    run boundaries with a (2C, C) compare+sum that measured ~25 ms of the
    kernel at bicycle scale) and reduces all 16 grad rows for up to 2C
    splats in one (16, C) x (C, 2C) MXU matmul.
    Successive steps of the same window revisit the same two output blocks
    (VMEM-resident, like the compositing kernels' tile state), so runs
    longer than C accumulate across steps without any scatter; the caller
    folds the half-window offset with one shifted add.
    """
    c = splat_ref.shape[2]
    i = pl.program_id(0)
    r0 = r0_ref[i]
    b = r0 // c
    prev_b = r0_ref[jnp.maximum(i - 1, 0)] // c
    is_first = jnp.logical_or(i == 0, b != prev_b)

    @pl.when(is_first)
    def _():
        out_lo_ref[...] = jnp.zeros_like(out_lo_ref)
        out_hi_ref[...] = jnp.zeros_like(out_hi_ref)

    # bf16 -> f32 is a pure bit repack (bf16 is truncated f32): low half is
    # the even row, high half the odd row (pair_gradients_to_splats packing).
    rows = []
    for ref in (g0_ref, g1_ref, g2_ref, g3_ref, g4_ref):
        u = ref[0, :, :]  # (1, C) u32
        rows.append(jax.lax.bitcast_convert_type(u << 16, jnp.float32))
        rows.append(
            jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
        )
    rows.append(jnp.zeros((6, c), jnp.float32))
    g_blk = jnp.concatenate(rows, axis=0)  # (16, C)

    # Window-relative splat index, computed in INT32 (splat ids exceed
    # f32's 2^24 exact range at 30M+ splats; integer subtract/compare has
    # no such cliff).  Ids are always inside [b*C, b*C + 2C): the window
    # covers at most C+1 consecutive splats starting at r0 in [b*C,
    # b*C + C); out-of-budget sentinel ids (== num_splats) land in the
    # padding column of the final window and are sliced off by the caller.
    # LOAD-BEARING INVARIANT (ADVICE r4): an id outside [b*C, b*C + 2C)
    # would produce an all-zero one-hot column and silently DROP that
    # pair's gradient.  The bound holds only because pair_expand gives
    # every splat a non-empty run (counts_slots = max(counts, 1) for dead
    # splats, pair_expand.py "counts_slots"), so consecutive sorted ids
    # never skip a splat and a C-pair window spans <= C+1 distinct ids.
    # tests/test_pallas.py::test_run_window_invariant checks this
    # numerically; revisit it before changing the slot accounting.
    local = splat_ref[0, :, :] - b * c  # (1, C) int32 in [0, 2C)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * c, 1), 0)
    sel = (sub_iota == local).astype(jnp.float32)  # (2C, C) one-hot

    # Default (single-bf16-pass) MXU precision is exact here: the grad rows
    # are bf16-representable by construction and sel is one-hot, so the
    # input rounding is lossless and accumulation happens in f32.
    partials = jax.lax.dot_general(
        g_blk, sel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (16, 2C): per-splat sums of this block's pairs
    out_lo_ref[...] += jax.lax.slice_in_dim(partials, 0, c, axis=1)[None]
    out_hi_ref[...] += jax.lax.slice_in_dim(partials, c, 2 * c, axis=1)[None]


def _run_reduce(
    packed_rows,  # 5 x (K,) u32 bf16-packed grad rows, sorted by splat id
    splat_sorted: jnp.ndarray,  # (K,) int32 sorted splat id per pair
    offsets_core: jnp.ndarray,  # (N + 1,) int32 run starts (clipped to K)
    num_splats: int,
    chunk: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-splat gradient sums (10, N) from splat-sorted packed pair grads."""
    from .binning import cdiv

    c = chunk
    k = packed_rows[0].shape[0]
    g2 = k // c
    n = num_splats
    npad = cdiv(n + 1, c) * c
    nb = npad // c

    boundaries = jnp.full((npad + c,), jnp.iinfo(jnp.int32).max, jnp.int32)
    boundaries = jax.lax.dynamic_update_slice(boundaries, offsets_core, (0,))
    starts = jnp.arange(g2, dtype=jnp.int32) * c
    r0 = jnp.searchsorted(boundaries, starts, side="right").astype(jnp.int32) - 1
    r0 = jnp.clip(r0, 0, npad - 1)

    # (g2, 1, C) row blocks: dense layout ((X, 1) would lane-pad 128x in
    # HBM), with a singleton middle dim because a 2-D (1, C) block fails
    # Mosaic's 8/128 block rule (second-to-last block dim 1 is neither
    # divisible by 8 nor equal to the array's row count — caught on real
    # TPU by tools/tpu_check.py; interpret mode doesn't enforce it).
    data_block = lambda i, r: (i, 0, 0)
    out_block = lambda i, r: (r[i] // c, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g2,),
        in_specs=[pl.BlockSpec((1, 1, c), data_block) for _ in range(6)],
        out_specs=(
            pl.BlockSpec((1, _FIELDS, c), out_block),
            pl.BlockSpec((1, _FIELDS, c), out_block),
        ),
    )
    out_lo, out_hi = pl.pallas_call(
        _run_reduce_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, _FIELDS, c), jnp.float32),
            jax.ShapeDtypeStruct((nb, _FIELDS, c), jnp.float32),
        ),
        interpret=interpret,
    )(
        r0,
        splat_sorted.reshape(g2, 1, c),
        *[u.reshape(g2, 1, c) for u in packed_rows],
    )

    lo = out_lo.transpose(1, 0, 2).reshape(_FIELDS, nb * c)
    hi = out_hi.transpose(1, 0, 2).reshape(_FIELDS, nb * c)
    # out_hi[b] holds splats [b*C + C, b*C + 2C): shift one block right.
    hi_shifted = jnp.concatenate(
        [jnp.zeros((_FIELDS, c), jnp.float32), hi[:, : (nb - 1) * c]], axis=1
    )
    # The grid only visits output blocks up to vb = r0[-1] // c — Pallas
    # leaves HBM of never-visited out blocks UNDEFINED on real TPU
    # (interpret mode zero-fills, hiding this).  Runs are non-empty up to
    # the budget clip, so r0 // c advances by at most one block per grid
    # step and every block <= vb IS visited.  Mask each half at its own
    # validity edge: lo columns are defined through block vb (splats
    # < (vb+1)*C), the shifted hi columns through block vb+1 (splats
    # < (vb+2)*C — block vb's hi half covers them and is valid; masking
    # both halves at (vb+1)*C would zero up to C-1 tail splats whose
    # in-budget pairs landed only in that hi half).  Splats beyond both
    # edges had their runs clipped to K, so their true in-budget gradient
    # is zero.
    vb = r0[-1] // c
    cols = jnp.arange(nb * c, dtype=jnp.int32)
    total = jnp.where(cols < (vb + 1) * c, lo, 0.0) + jnp.where(
        cols < (vb + 2) * c, hi_shifted, 0.0
    )
    return total[:10, :n]


def pair_gradients_to_splats(
    dpairs: jnp.ndarray,  # (G, F, C) f32 — or (G, F/2, C) u32 bf16-pairs,
    #                       pre-packed by the backward kernel — tile-sorted
    binning: TileBinning,
    counts_by_rank: jnp.ndarray,  # (N,) pairs per depth rank
    num_splats: int,
    identity_order: bool = False,  # True when depth_order is the identity
    pack_bf16: bool = False,  # config.pack_grads_bf16
    reduce_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Reduce per-pair grads to per-splat grads (N, F), original splat order.

    Un-permutes the tile sort (one extra sort to invert the permutation),
    then reduces the contiguous depth-expansion runs — with the Pallas
    run-reduce kernel on the packed path (the XLA cumsum + (N+1)-column
    take costs ~110 ms of minor-axis gather at bicycle scale), cumsum
    differences otherwise.  Nothing pair-sized is scattered (a segment_sum
    scatter-add measured 286 ms *per column* at 24M pairs).
    """
    pre_packed = dpairs.dtype == jnp.uint32
    g, fr, chunk = dpairs.shape
    f = 2 * fr if pre_packed else fr
    k = g * chunk
    flat = dpairs.transpose(1, 0, 2).reshape(fr, k)  # row-major pair data

    # Group pair gradients by splat with ONE payload-carrying stable sort
    # (key = the pair's rank/splat id, the grad rows ride as payloads) —
    # measured ~2x cheaper than inverting the permutation and applying it
    # with a (F, K) column gather (~8 ns per gather index on TPU).  With
    # pack_bf16, adjacent rows ride as one u32 (bf16 pair) — F/2 payloads
    # instead of F at ~0.4% per-pair rounding; the reduction stays f32.
    if pre_packed or (pack_bf16 and f % 2 == 0):
        hb = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        ub = lambda u: jax.lax.bitcast_convert_type(
            u.astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        if pre_packed:
            packed = tuple(flat[i] for i in range(fr))
        else:
            packed = tuple(
                hb(flat[2 * i]) | (hb(flat[2 * i + 1]) << 16) for i in range(f // 2)
            )
        # Grouping only: the per-splat reduction is a commutative sum, so
        # within-run order is free — unstable is ~39 ms cheaper at bicycle
        # scale (tools/tpu_jobs/458; fp-summation order may differ from
        # the stable order at rounding level).
        sorted_ = jax.lax.sort(
            (binning.pair_rank,) + packed, num_keys=1, is_stable=False
        )
        if identity_order and f == 10 and k % reduce_chunk == 0:
            offsets = jnp.minimum(
                jnp.concatenate(
                    [
                        jnp.zeros((1,), jnp.int32),
                        jnp.cumsum(counts_by_rank).astype(jnp.int32),
                    ]
                ),
                k,
            )
            sums = _run_reduce(
                sorted_[1:], sorted_[0], offsets, num_splats, reduce_chunk,
                interpret=interpret,
            )  # (10, N) by splat id
            return sums.T
        rows = []
        for u in sorted_[1:]:
            rows.append(ub(u))
            rows.append(ub(u >> 16))
        by_rank = jnp.stack(rows, axis=0)  # (F, K) grouped by rank
    else:
        sorted_ = jax.lax.sort(
            (binning.pair_rank,) + tuple(flat[i] for i in range(f)),
            num_keys=1,
            is_stable=False,  # grouping for a commutative sum (see above)
        )
        by_rank = jnp.stack(sorted_[1:], axis=0)  # (F, K) grouped by rank

    csum = jnp.cumsum(by_rank, axis=1)
    csum = jnp.concatenate([jnp.zeros((f, 1), csum.dtype), csum], axis=1)
    # Budget truncation can cut the tail ranks' pairs short: clip run bounds
    # to K so truncated ranks sum their surviving pairs and later ranks get
    # empty (zero) runs.
    offsets = jnp.minimum(
        jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_by_rank).astype(jnp.int32)]
        ),
        k,
    )  # (N + 1,)
    # One N+1-index take + adjacent diff (offsets are shared between a run's
    # end and the next run's start) — the two-take version pays the ~18 ns
    # per minor-axis gather index twice (~220 ms at bicycle scale).
    vals = jnp.take(csum, offsets, axis=1)  # (F, N + 1)
    sums = vals[:, 1:] - vals[:, :-1]  # (F, N) by depth rank

    if identity_order:
        # Fused pipeline: generation order is splat-major, ranks ARE splat ids.
        return sums.T
    # Depth order -> original splat order (inverse permute via one N-sort).
    _, inv_order = jax.lax.sort(
        (binning.depth_order, jnp.arange(num_splats, dtype=jnp.int32)), num_keys=1
    )
    return jnp.take(sums, inv_order, axis=1).T  # (N, F)
