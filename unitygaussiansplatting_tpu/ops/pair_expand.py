"""Pallas TPU kernel: (splat, tile) pair expansion with fused field layout.

The TPU-native replacement for the XLA expansion stage of binning
(``jnp.repeat`` + K-sized gathers) *and* the pair-field materialization
(``prepare_pairs``'s 36M-row gather).  The reference has no analog — its
sort payload is just the splat index and the vertex shader does the
indirection per instance (RenderGaussianSplats.shader:38); a TPU pays ~8 ns
per random gather index, so at bicycle scale those stages cost ~1.4 s of
XLA time.  This kernel produces the same arrays in ~tens of ms by turning
every access into contiguous block reads + one MXU selection matmul:

- Pairs are generated in *splat-major* order: splat s with pair-count
  c_s owns the contiguous slot run [boundaries[s], boundaries[s+1]).
- A grid step covers C consecutive slots.  Because every live run is
  non-empty, those slots reference a window of at most C+1 consecutive
  splats starting at r0 = rank(first slot); r0 per step is a tiny XLA
  ``searchsorted`` (K/C queries), prefetched as scalars and used by the
  BlockSpec index maps to fetch two consecutive C-wide blocks of the
  per-splat table (16, N) and boundary array — all sequential HBM reads.
- In-kernel, each slot finds its splat by counting window boundaries
  <= slot id (a (2C, C) compare + sum), builds a one-hot selection matrix,
  and pulls all 16 per-splat field rows at once with a (16, 2C) x (2C, C)
  matmul on the MXU.  The within-run index j (flattened tile-rect offset)
  falls out of the same selection applied to the boundary values.
- Outputs, per pair: the 16 field rows (fields-major (16, K) layout — the
  composite kernels' native layout), the tile id, and the owning splat id.

The depth ordering that the old pipeline obtained from a separate N-sort is
instead folded into the *sort key* downstream (tile << bits | quantized
depth), so no depth-sorted reorder of splat data is ever materialized; see
ops/binning.py:sort_key_bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import RasterizeConfig
from .binning import cdiv

# Table rows: cx, cy, a1x, a1y, a2x, a2y, r, g, b, opacity, x0, y0, nx,
# depth_key, bnd_hi, bnd_lo.  The first 10 match the composite kernels'
# field order; the rest are binning metadata consumed here and by the key
# builder.  The kernel culls a pair to the sentinel tile when NO pixel of
# the tile can pass the keep test, using qcap = rho^2 =
# log(opacity / alpha_discard) recomputed from the selected opacity row:
# qx and qy are affine in pixel coords, so their ranges over the tile rect
# come from interval arithmetic; if min|qx|^2 + min|qy|^2 > qcap (alpha
# discard) or min|qx| > 2 / min|qy| > 2 (quad clip), every pixel fails —
# an output-preserving, anisotropy-exact refinement of the AABB binning
# (the old isotropic circle test kept far-off-minor-axis tiles of thin
# splats that can never pass).
_ROWS = 16
ROW_X0 = 10
ROW_Y0 = 11
ROW_NX = 12
ROW_DEPTH_KEY = 13
# Run-start boundaries ride IN the table as two f32-exact halves
# (hi = bnd >> 12, lo = bnd & 4095; each <= 2^19 so exact in f32): a
# separate (X, 1)-shaped boundary operand lane-pads 128x in HBM (14.9 GB
# at 31.5M splats, tools/tpu_jobs/479), and Mosaic rejects (1, C) blocks.
# The kernel reassembles them in int32 and transposes the row to the
# (C, 1) column the window compare needs (Mosaic relayout, ~free —
# probe tools/tpu_jobs/480).  qcap, which used to occupy row 14, is
# recomputed in-kernel from the selected opacity (row 9) instead.
ROW_BND_HI = 14
ROW_BND_LO = 15


def _f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f16 bit pattern (as u32) of an f16-representable normal-or-zero f32.

    Mosaic has no f32->f16 conversion; for values already rounded by
    tile_common._f16_round (normal f16 or ±0 — no subnormals, no inf/nan)
    the 16-bit pattern is a pure bit-field repack of the f32 word:
    sign, exponent rebias 127->15, top 10 mantissa bits.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (u >> 16) & jnp.uint32(0x8000)
    exp = (u >> 23) & jnp.uint32(0xFF)
    packed = sign | ((exp - 112) << 10) | ((u >> 13) & jnp.uint32(0x3FF))
    return jnp.where(exp >= 113, packed, sign)


def _expand_kernel(
    r0_ref,  # (G,) int32 scalar-prefetch: first splat of each window
    meta_ref,  # (1,) int32 scalar-prefetch: [num_pairs]
    *in_out_refs,  # 2W table blocks (16, C) (rows 14/15 = boundary halves),
    #               then OUT (1, 1, W*C) each: key u32, splat i32, fields
    num_splats: int,
    tiles_x: int,
    num_tiles: int,
    tile_w: int,
    tile_h: int,
    db: int,
    alpha_discard: float,
    pack_axes: bool,
    pack_color: bool,
    quad_clip: bool,
    pack_center: bool,
    pack_rgba8: bool,
    pack_ax32: bool = False,
    windows: int = 1,
):
    w = windows
    tbl_refs = in_out_refs[: 2 * w]  # per-window (lo, hi) pairs
    refs = in_out_refs[2 * w :]
    key_ref, splat_ref = refs[0], refs[1]
    c = key_ref.shape[2] // w
    i = pl.program_id(0)
    num_pairs = meta_ref[0]

    # One step = W windows of C slots, each with its OWN (lo, hi) block pair
    # fetched by the index maps — the per-window math (2C-span rotate,
    # (C, C) compare/one-hot/MXU select) is exactly the W=1 kernel's, so
    # per-slot compute is W-invariant, while the per-STEP machinery
    # (measured ~62 ms of the W=1 kernel's 124 ms at bicycle scale,
    # tools/tpu_jobs/475 no-op probe) is amortized over W windows.  A
    # shared (W+1)-block concat was measured WORSE (tools/tpu_jobs/476:
    # the rebase rotates grow O(W) per window).
    for win in range(w):
        r0j = r0_ref[w * i + win]
        tbl_cat = jnp.concatenate(
            [tbl_refs[2 * win][:, :], tbl_refs[2 * win + 1][:, :]], axis=1
        )  # (16, 2C), rows 14/15 = boundary halves (see ROW_BND_HI)
        _expand_window(
            r0j,
            r0j // c * c,
            tbl_cat,
            2 * c,
            (w * i + win) * c,
            c,
            win,
            num_pairs,
            refs,
            num_splats=num_splats,
            tiles_x=tiles_x,
            num_tiles=num_tiles,
            tile_w=tile_w,
            tile_h=tile_h,
            db=db,
            alpha_discard=alpha_discard,
            pack_axes=pack_axes,
            pack_color=pack_color,
            quad_clip=quad_clip,
            pack_center=pack_center,
            pack_rgba8=pack_rgba8,
            pack_ax32=pack_ax32,
        )


def _expand_window(
    r0,
    lo_first,
    tbl_cat,
    span,
    base,
    c,
    win,
    num_pairs,
    refs,
    *,
    num_splats: int,
    tiles_x: int,
    num_tiles: int,
    tile_w: int,
    tile_h: int,
    db: int,
    alpha_discard: float,
    pack_axes: bool,
    pack_color: bool,
    quad_clip: bool,
    pack_center: bool,
    pack_rgba8: bool,
    pack_ax32: bool = False,
):
    """Expand the C slots [base, base + C) whose splats start at r0."""
    key_ref, splat_ref = refs[0], refs[1]
    d = r0 - lo_first  # in [0, span - C)
    # Rebase the fetched blocks to the exact window [r0, r0 + C) with a
    # dynamic rotate + static slice (Mosaic has no dynamic_slice on arrays).
    tbl = jax.lax.slice_in_dim(
        pltpu.roll(tbl_cat, span - d, axis=1), 0, c, axis=1
    )  # (16, C) = table[:, r0 : r0 + C]
    # Boundaries ride as two f32-exact halves in rows 14/15 (see ROW_BND_HI
    # note): reassemble in int32 and transpose the row into the (C, 1)
    # column the window compare needs.
    bnd_row = tbl[ROW_BND_HI : ROW_BND_HI + 1, :].astype(jnp.int32) * 4096 + tbl[
        ROW_BND_LO : ROW_BND_LO + 1, :
    ].astype(jnp.int32)  # (1, C)
    bnd = jnp.transpose(bnd_row, (1, 0))  # (C, 1) = boundaries[r0 : r0 + C]
    slots = base + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)  # (1, C)

    # Each slot's splat = last window entry whose run starts at or before it:
    # boundaries[< r0] satisfy <= slot by construction of r0 and
    # boundaries[>= r0 + C] never do (every live run is non-empty), so the
    # rebased count is exact: splat = r0 + count - 1.
    cmp = (bnd <= slots).astype(jnp.float32)  # (C, C)
    count = jnp.sum(cmp, axis=0, keepdims=True)  # (1, C) in [1, C]
    local = count - 1.0  # window-relative splat index, f32-exact
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0).astype(jnp.float32)
    sel = (sub_iota == local).astype(jnp.float32)  # (C, C) one-hot

    # Run start of each slot's splat, relative to the block base.  Values
    # clamped into int16 range stay f32-exact; only the selected row (whose
    # true value is within [-num_tiles, C)) survives the one-hot reduce.
    bnd_rel = jnp.clip(bnd - base, -32768, 32767).astype(jnp.float32)
    run_start = jnp.sum(sel * bnd_rel, axis=0, keepdims=True)  # (1, C)
    j = (slots - base).astype(jnp.float32) - run_start  # within-run index

    # All 16 field rows for every slot in one MXU matmul.
    # precision=HIGHEST is load-bearing: Mosaic's default f32 dot runs a
    # single bf16 MXU pass (measured: selecting a 4M-valued f32 errs by up
    # to 8191), which corrupts the integer-valued depth-key/rect rows and
    # px-scale centers.  HIGHEST multi-pass splitting makes the one-hot
    # selection bit-exact.
    fields = jax.lax.dot_general(
        tbl, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, C)

    x0 = fields[ROW_X0, :][None, :]
    y0 = fields[ROW_Y0, :][None, :]
    nx = jnp.maximum(fields[ROW_NX, :][None, :], 1.0)
    # j // nx via reciprocal multiply + exact correction (no VPU int div).
    q = jnp.floor(j * (1.0 / nx))
    rem = j - q * nx
    q = jnp.where(rem < 0, q - 1.0, jnp.where(rem >= nx, q + 1.0, q))
    rem = j - q * nx
    tx = x0 + rem
    ty = y0 + q
    tile_f = ty * tiles_x + tx  # < 2^22, f32-exact

    # Ellipse-interval cull: qx/qy are affine in pixel coords, so their
    # exact ranges over the tile's pixel centers come from corner interval
    # arithmetic; a pair none of whose pixels can pass the alpha/quad keep
    # test goes to the sentinel tile (see ROW_QCAP note).  Margins cover
    # the fp difference between this arithmetic and the composite kernel's
    # per-pixel form.
    cx = fields[0, :][None, :]
    cy = fields[1, :][None, :]
    if pack_ax32:
        # Rows 2/3 carry the (theta*1024 + n1) / n2 axis codes (see
        # bin_and_prepare); decode to components in-kernel — cos/sin/exp2
        # all have Mosaic lowerings, and the codes are f32-exact ints.
        from .tile_common import _AX32_LO, _AX32_STEP, _AX32_TWO_PI

        row_a = fields[2, :][None, :]
        row_b = fields[3, :][None, :]
        tcv = jnp.floor(row_a * (1.0 / 1024.0))  # exact: row_a < 2^22
        n1cv = row_a - tcv * 1024.0
        theta = tcv * (_AX32_TWO_PI / 4096.0) - 3.14159265358979324
        ct, st = jnp.cos(theta), jnp.sin(theta)
        n1v = jnp.exp2(_AX32_LO + n1cv * _AX32_STEP)
        n2v = jnp.exp2(_AX32_LO + row_b * _AX32_STEP)
        a1x, a1y = n1v * ct, n1v * st
        a2x, a2y = n2v * st, -n2v * ct
    else:
        a1x = fields[2, :][None, :]
        a1y = fields[3, :][None, :]
        a2x = fields[4, :][None, :]
        a2y = fields[5, :][None, :]
    # qcap = rho^2 = log(opacity / alpha_discard), recomputed from the
    # exactly-selected opacity row (same formula the XLA side used when it
    # rode the table; dead splats have opacity 0 -> qcap 0, and their slots
    # are sentineled by the `live` mask regardless).
    op_sel = fields[9, :][None, :]
    if alpha_discard > 0.0:
        qcap = jnp.maximum(
            jnp.log(jnp.maximum(op_sel, 1e-30) / alpha_discard), 0.0
        )
    else:
        qcap = jnp.full_like(op_sel, 1e30)
    inv1 = 1.0 / jnp.maximum(a1x * a1x + a1y * a1y, 1e-12)
    inv2 = 1.0 / jnp.maximum(a2x * a2x + a2y * a2y, 1e-12)
    dx_lo = tx * tile_w + 0.5 - cx  # first pixel center of the tile
    dx_hi = tx * tile_w + (tile_w - 0.5) - cx  # last pixel center
    dy_lo = ty * tile_h + 0.5 - cy
    dy_hi = ty * tile_h + (tile_h - 0.5) - cy

    def min_abs_q(ax, ay, inv):
        # Range of (dx*ax + dy*ay) * inv over the rect (affine, so extreme
        # at corners; per-axis min/max of the product handles signs).
        tx_min = jnp.minimum(dx_lo * ax, dx_hi * ax)
        tx_max = jnp.maximum(dx_lo * ax, dx_hi * ax)
        ty_min = jnp.minimum(dy_lo * ay, dy_hi * ay)
        ty_max = jnp.maximum(dy_lo * ay, dy_hi * ay)
        q_min = (tx_min + ty_min) * inv
        q_max = (tx_max + ty_max) * inv
        return jnp.maximum(jnp.maximum(q_min, -q_max), 0.0)

    mqx = min_abs_q(a1x, a1y, inv1)
    mqy = min_abs_q(a2x, a2y, inv2)
    touches = mqx * mqx + mqy * mqy <= qcap * 1.0002 + 1e-3
    if quad_clip:
        touches &= (mqx <= 2.001) & (mqy <= 2.001)

    live = slots < num_pairs  # (1, C) bool
    # Fused sort key, built in-kernel: (tile << db) | quantized depth —
    # sentinel tile for dead or corner-culled slots (sorts past every real
    # tile range; see binning.depth_key_bits).
    tile_i = jnp.where(live & touches, tile_f.astype(jnp.int32), num_tiles)
    dq_u = (
        jnp.where(live, fields[ROW_DEPTH_KEY, :][None, :], 0.0)
        .astype(jnp.int32)
        .astype(jnp.uint32)
    )
    out_slice = slice(win * c, (win + 1) * c)  # static per unrolled window
    key_ref[:, :, out_slice] = ((tile_i.astype(jnp.uint32) << db) | dq_u)[None]
    splat = r0 + count.astype(jnp.int32) - 1
    splat_ref[:, :, out_slice] = jnp.where(live, splat, num_splats)[None]

    # Field operands, emitted sort-ready (f16 pairs packed into u32 when
    # configured) so no K-sized field buffer or packing pass exists between
    # this kernel and the sort.
    fieldz = jnp.where(live, fields, 0.0)
    row = lambda r: fieldz[r, :][None, :]
    if pack_center:
        # Rotated-frame center offsets, quantized into one u32 (see
        # RasterizeConfig.pack_center_u32).  Basis: â1 = a1/|a1| and its
        # EXACT perpendicular sign-matched to a2 — f16-rounded axes are only
        # ~1e-3 orthogonal, and a non-orthonormal basis would leak an
        # |s1|-scaled error into the minor direction; the exact-perp basis
        # makes decode a pure rotation (reconstruction error = quantization
        # only).  Ranges follow from the ellipse cull's survival guarantee:
        # min|qx| <= sqrt(cap_eff) (and <= 2.001 under quad clip), so
        # |s_i| <= qb*|a_i| + half-rect projection + margins.
        n1 = jnp.sqrt(jnp.maximum(a1x * a1x + a1y * a1y, 1e-12))
        n2 = jnp.sqrt(jnp.maximum(a2x * a2x + a2y * a2y, 1e-12))
        u1x, u1y = a1x / n1, a1y / n1
        sg = jnp.where(a2y * u1x - a2x * u1y >= 0.0, 1.0, -1.0)
        u2x, u2y = -sg * u1y, sg * u1x  # exact perp of â1, aligned with a2
        txf = (tile_i % tiles_x).astype(jnp.float32)
        tyf = (tile_i // tiles_x).astype(jnp.float32)
        dxc = cx - (txf * tile_w + 0.5 * tile_w)
        dyc = cy - (tyf * tile_h + 0.5 * tile_h)
        s1 = dxc * u1x + dyc * u1y
        s2 = dxc * u2x + dyc * u2y
        qb = jnp.sqrt(jnp.maximum(qcap * 1.0002 + 1e-3, 0.0))
        if quad_clip:
            qb = jnp.minimum(qb, 2.001)
        half1 = 0.5 * (jnp.abs(u1x) * tile_w + jnp.abs(u1y) * tile_h)
        half2 = 0.5 * (jnp.abs(u2x) * tile_w + jnp.abs(u2y) * tile_h)
        r1 = qb * n1 + half1 + 0.51
        # + 0.002*r1: |d·perp(â1)| can exceed |d·â2| by ~1e-3*|s1| (basis
        # swap vs the cull's bound).
        r2 = qb * n2 + half2 + 0.51 + 0.002 * r1
        q1 = jnp.clip(jnp.floor(s1 / r1 * 2047.0 + 0.5) + 2048.0, 0.0, 4095.0)
        q2 = jnp.clip(
            jnp.floor(s2 / r2 * 65535.0 + 0.5) + 65536.0, 0.0, 131071.0
        )
        center_u = q1.astype(jnp.int32).astype(jnp.uint32) | (
            q2.astype(jnp.int32).astype(jnp.uint32) << 12
        )
        out = [center_u]
    else:
        out = [row(0), row(1)]
    if pack_ax32:
        # (theta 12 | n1 10 | n2 10): codes are f32-exact ints in rows 2/3.
        zf = lambda x: jnp.where(live, x, 0.0).astype(jnp.int32).astype(jnp.uint32)
        out.append((zf(tcv) << 20) | (zf(n1cv) << 10) | zf(row_b))
    elif pack_axes:
        out.append(_f16_bits(row(2)) | (_f16_bits(row(3)) << 16))
        out.append(_f16_bits(row(4)) | (_f16_bits(row(5)) << 16))
    else:
        out.extend([row(2), row(3), row(4), row(5)])
    if pack_rgba8:
        # Values are already on the 8-bit lattice (quantize_view_fp16), so
        # floor(x*scale + 0.5) recovers the exact code — one u32 carries
        # color + opacity.
        u8 = lambda x, s: jnp.floor(x * s + 0.5).astype(jnp.int32).astype(jnp.uint32)
        out.append(
            u8(row(6), 127.5)
            | (u8(row(7), 127.5) << 8)
            | (u8(row(8), 127.5) << 16)
            | (u8(row(9), 255.0) << 24)
        )
    elif pack_color:
        out.append(_f16_bits(row(6)) | (_f16_bits(row(7)) << 16))
        out.append(_f16_bits(row(8)) | (_f16_bits(row(9)) << 16))
    else:
        out.extend([row(6), row(7), row(8), row(9)])
    for ref, val in zip(refs[2:], out):
        ref[:, :, out_slice] = val[None]


def expand_operands(
    table_t: jnp.ndarray,  # (16, NPAD + C) f32 per-splat field columns
    boundaries: jnp.ndarray,  # (NPAD + C,) int32 run starts, INT32_MAX padded
    num_pairs: jnp.ndarray,  # () int32
    k: int,
    num_splats: int,
    tiles_x: int,
    num_tiles: int,
    db: int,
    chunk: int = 512,
    tile_w: int = 64,  # keep in sync with RasterizeConfig defaults
    tile_h: int = 32,
    pack_axes: bool = False,
    pack_color: bool = False,
    quad_clip: bool = True,
    alpha_discard: float = 1.0 / 255.0,
    pack_center: bool = False,
    pack_rgba8: bool = False,
    pack_ax32: bool = False,
    windows: int = 1,
    interpret: bool = False,
):
    """Run the expansion kernel; returns the (K,)-shaped sort operand tuple
    ``(key u32, splat i32, <center>, <axes>, <colors>)`` — center is one
    quantized u32 when pack_center else two f32 (cx, cy); axes/colors are
    two f16-packed u32 arrays each when the corresponding flag is set, else
    four f32 arrays.

    ``NPAD`` is the splat-dim padding (multiple of C, > num_splats); both
    inputs carry one extra C-block so every window's hi block exists.
    ``windows`` = slot windows of C pairs per grid step (each fetching its
    own lo/hi block pair).
    """
    c = chunk
    w = windows
    g = k // c
    assert g % w == 0, (g, w)
    npad = table_t.shape[1] - c
    assert boundaries.shape[0] == npad + c, (boundaries.shape, npad, c, w)

    # First splat of each window (XLA-side: G queries into the boundary
    # table — the cheap searchsorted direction).
    starts = jnp.arange(g, dtype=jnp.int32) * c
    r0 = (
        jnp.searchsorted(boundaries, starts, side="right").astype(jnp.int32) - 1
    )
    r0 = jnp.clip(r0, 0, npad - 1)
    meta = jnp.asarray(num_pairs, jnp.int32).reshape((1,))

    field_dtypes = (
        [jnp.uint32] if pack_center else [jnp.float32, jnp.float32]
    )
    if pack_ax32:
        field_dtypes += [jnp.uint32]
    elif pack_axes:
        field_dtypes += [jnp.uint32] * 2
    else:
        field_dtypes += [jnp.float32] * 4
    if pack_rgba8:
        field_dtypes += [jnp.uint32]
    else:
        field_dtypes += [jnp.uint32] * 2 if pack_color else [jnp.float32] * 4
    n_field_ops = len(field_dtypes)
    out_block = lambda i, r, m: (i, 0, 0)

    # One step covers W windows of C slots, each with its own (lo, hi)
    # block pair — fewer steps amortize the per-step grid/DMA machinery
    # (measured ~62 ms of the W=1 kernel's 124 ms at bicycle scale,
    # tools/tpu_jobs/475 no-op-kernel probe) at W-invariant per-slot
    # compute.
    tbl_specs = [
        pl.BlockSpec(
            (_ROWS, c),
            lambda i, r, m, j=j, off=off: (0, r[w * i + j] // c + off),
        )
        for j in range(w)
        for off in (0, 1)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g // w,),
        in_specs=tbl_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 1, w * c), out_block) for _ in range(2 + n_field_ops)
        ),
    )

    outs = pl.pallas_call(
        functools.partial(
            _expand_kernel,
            num_splats=num_splats,
            tiles_x=tiles_x,
            num_tiles=num_tiles,
            tile_w=tile_w,
            tile_h=tile_h,
            db=db,
            alpha_discard=alpha_discard,
            pack_axes=pack_axes,
            pack_color=pack_color,
            quad_clip=quad_clip,
            pack_center=pack_center,
            pack_rgba8=pack_rgba8,
            pack_ax32=pack_ax32,
            windows=w,
        ),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((g // w, 1, w * c), dt)
            for dt in [jnp.uint32, jnp.int32] + field_dtypes
        ),
        interpret=interpret,
    )(r0, meta, *([table_t] * (2 * w)))
    return tuple(o.reshape(k) for o in outs)


def bin_and_prepare(
    proj,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool = False,
    need_splat_ids: bool = True,
):
    """Fused binning + pair-field preparation for the Pallas rasterizer.

    Produces the same (binning, fields) the two-stage path (binning.bin_splats
    + the old gather-based prepare) produced, with a different factorization:

    1. XLA: tile rects, per-splat pair counts (dead splats get one sentinel-
       tile pair so runs are never empty), run boundaries (cumsum), quantized
       depth keys, the (16, N) field/metadata table — all N-sized, no sort.
    2. Pallas expansion kernel: per-pair fields + tile id + splat id.
    3. One stable K-sort by the fused key (tile << depth_bits | depth_key)
       with the 10 view-data fields + splat id riding as payloads — replaces
       the reference's separate depth sort (GpuSorting.cs:142-198) *and* the
       pair-field gather in one pass, in per-tile (quantized depth, splat id)
       order.
    4. tile_starts from one searchsorted over the sorted keys.

    Returns (TileBinning, fields (K // chunk_size, 16, chunk_size)).  In the
    returned binning, ``pair_rank`` holds *original splat ids* (generation
    order is splat-major, so ``depth_order`` is the identity) and
    ``num_pairs`` counts slot demand including the one sentinel pair per
    dead splat.

    ``need_splat_ids`` is retained for API compatibility but ignored: with
    the 2-key unstable sort, carrying the splat id as the tie-break key is
    a net perf WIN over dropping it (one extra operand ~27 ms vs the ~39 ms
    stable->unstable saving, tools/tpu_jobs/458-459), so ``pair_rank`` is
    always valid.
    """
    from .binning import (
        depth_key_bits,
        pair_budget,
        quantize_depth,
        tile_grid,
        tile_rects,
        TileBinning,
    )

    from .tile_common import quantize_view_fp16

    proj = quantize_view_fp16(proj, config)
    n = proj.depth.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    if num_tiles >= 32768:
        raise ValueError(
            f"tile grid {tiles_x}x{tiles_y} exceeds the expansion kernel's "
            "int16-exact boundary window"
        )
    k = pair_budget(n, config)
    # Center packing needs the ellipse cull's survival bound; with neither
    # alpha discard nor quad clip the offsets are unbounded — ignore the flag.
    pack_center = bool(getattr(config, "pack_center_u32", False)) and (
        config.alpha_discard > 0.0 or config.quad_clip
    )
    pack_rgba8 = bool(getattr(config, "pack_color_rgba8", False))
    pack_ax32 = bool(getattr(config, "pack_axes_u32", False))
    c = config.expand_chunk
    w = int(getattr(config, "expand_windows", 1))
    if (k // c) % w:
        w = 1  # budget not divisible into W-window steps: plain grid
    assert k % c == 0 and k % config.chunk_size == 0
    db = depth_key_bits(num_tiles)

    x0, y0, nx, ny, counts, valid = tile_rects(proj, width, height, config)

    # The per-splat alpha-discard bound for the kernel's ellipse-interval
    # cull (qcap = rho^2 = log(opacity / alpha_discard)) is recomputed
    # IN-KERNEL from the selected opacity row — its former table row now
    # carries the run boundaries (see ROW_BND_HI).
    live = valid & (counts > 0)
    # Dead splats emit exactly one pair aimed at the sentinel tile: keeps
    # every expansion run non-empty (the kernel's window-coverage invariant)
    # without compacting live splats, at the cost of <= N extra slots that
    # sort to the end and are never composited.
    counts_slots = jnp.where(live, counts, 1)
    x0f = jnp.where(live, x0.astype(jnp.float32), jnp.float32(num_tiles))
    y0f = jnp.where(live, y0.astype(jnp.float32), 0.0)
    nxf = jnp.where(live, nx.astype(jnp.float32), 1.0)
    dq = quantize_depth(proj.depth, db)
    dqf = jnp.where(live, dq, 0).astype(jnp.float32)  # < 2^24: f32-exact

    boundaries_core = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_slots, dtype=jnp.int32)]
    )  # (n + 1,): run starts + total
    num_slots = boundaries_core[-1]
    num_real = jnp.sum(counts, dtype=jnp.int32)

    npad = cdiv(n + 1, c) * c
    boundaries = jnp.full((npad + c,), jnp.iinfo(jnp.int32).max, jnp.int32)
    boundaries = jax.lax.dynamic_update_slice(boundaries, boundaries_core, (0,))

    if pack_ax32:
        # Axis codes instead of components in rows 2/3 (row2 = theta*1024 +
        # n1 <= 2^22, f32-exact; row3 = n2): the kernel decodes per slot
        # after the selection matmul and emits ONE u32 axis operand.
        # Re-encoding the lattice-decoded axes from quantize_view_fp16
        # reproduces the codes exactly (round-trip stable by construction).
        from .tile_common import axes_u32_codes

        tc_, n1c_, n2c_ = axes_u32_codes(proj.axis1, proj.axis2)
        ax_rows = [tc_ * 1024.0 + n1c_, n2c_,
                   jnp.zeros_like(tc_), jnp.zeros_like(tc_)]
    else:
        ax_rows = [proj.axis1[:, 0], proj.axis1[:, 1],
                   proj.axis2[:, 0], proj.axis2[:, 1]]
    table = jnp.stack(
        [
            proj.center[:, 0],
            proj.center[:, 1],
            *ax_rows,
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            jnp.where(live, proj.opacity, 0.0),
            x0f,
            y0f,
            nxf,
            dqf,
        ],
        axis=0,
    )  # (14, n)
    # Dead-splat geometry can be NaN (behind-camera projections); scrub it so
    # sentinel pairs stay finite (they never composite, but NaN poisons
    # nothing-checks and the sort is fed from these columns).
    table = jnp.where(jnp.isfinite(table), table, 0.0)
    # Rows 14/15: run boundaries as two f32-exact halves, full padded width
    # (the INT32_MAX padding splits to 524287/4095 and reassembles exactly,
    # staying > every slot id).  Riding in the table avoids a separate
    # boundary operand whose (X, 1) layout lane-pads 128x in HBM
    # (tools/tpu_jobs/479).
    table_t = jnp.concatenate(
        [
            jnp.pad(table, ((0, 0), (0, npad + c - n))),
            (boundaries >> 12).astype(jnp.float32)[None, :],
            (boundaries & 4095).astype(jnp.float32)[None, :],
        ],
        axis=0,
    )  # (16, npad + c)

    # The kernel emits sort-ready operands (key, splat, packed fields) —
    # no K-sized field buffer or packing pass exists between it and the
    # sort, and each f16-packed operand pair saves ~31 ms of sort time at
    # bicycle scale (measured: stable sort costs 87 ms + ~31 ms/operand at
    # 30.5M elements).
    operands = expand_operands(
        table_t,
        boundaries,
        num_slots,
        k,
        n,
        tiles_x,
        num_tiles,
        db,
        chunk=c,
        tile_w=config.tile_w,
        tile_h=config.tile_h,
        pack_axes=config.pack_axes_f16,
        pack_color=config.pack_color_f16,
        quad_clip=config.quad_clip,
        alpha_discard=config.alpha_discard,
        pack_center=pack_center,
        pack_rgba8=pack_rgba8,
        pack_ax32=pack_ax32,
        windows=w,
        interpret=interpret,
    )

    def unh(u):
        return jax.lax.bitcast_convert_type(
            u.astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)

    # (key, splat) is UNIQUE over meaningful pairs (a splat contributes at
    # most one pair per tile; never-used tail slots beyond num_slots share
    # a sentinel (key, splat) but carry identical zero payloads), so the
    # unstable 2-key sort is bit-identical to the stable 1-key sort at the
    # canonical (fused key, splat id) order — and measured cheaper at
    # bicycle scale (tools/tpu_jobs/458: stable 249 -> 2-key unstable
    # 215 ms).  The forward-only path keeps the splat operand too: +1
    # payload costs ~27 ms but unstable saves ~39, a net win that also
    # makes pair_rank always-valid (no sentinel placeholder).
    del need_splat_ids  # retained for API compatibility; always carried now
    sorted_ = jax.lax.sort(operands, num_keys=2, is_stable=False)
    key_s, splat_s = sorted_[0], sorted_[1]
    rest = list(sorted_[2:])

    tile_bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << db).astype(
        jnp.uint32
    )
    tile_starts = jnp.searchsorted(key_s, tile_bounds, side="left").astype(jnp.int32)

    if pack_center:
        cen_u = rest[0]
        rest = rest[1:]
        cx_s = cy_s = None  # decoded below, after the axes are unpacked
    else:
        cx_s, cy_s = rest[:2]
        rest = rest[2:]
    if pack_ax32:
        from .tile_common import decode_axes_u32

        (axu,) = rest[:1]
        rest = rest[1:]
        axis_rows = list(decode_axes_u32(
            (axu >> 20).astype(jnp.float32),
            ((axu >> 10) & 1023).astype(jnp.float32),
            (axu & 1023).astype(jnp.float32),
        ))
    elif config.pack_axes_f16:
        au1, au2 = rest[:2]
        axis_rows = [unh(au1), unh(au1 >> 16), unh(au2), unh(au2 >> 16)]
        rest = rest[2:]
    else:
        axis_rows = rest[:4]
        rest = rest[4:]
    if pack_rgba8:
        (cu_s,) = rest
        color_rows = [
            (cu_s & 0xFF).astype(jnp.float32) / 127.5,
            ((cu_s >> 8) & 0xFF).astype(jnp.float32) / 127.5,
            ((cu_s >> 16) & 0xFF).astype(jnp.float32) / 127.5,
            (cu_s >> 24).astype(jnp.float32) / 255.0,
        ]
    elif config.pack_color_f16:
        cu1_s, cu2_s = rest
        color_rows = [unh(cu1_s), unh(cu1_s >> 16), unh(cu2_s), unh(cu2_s >> 16)]
    else:
        color_rows = rest
    if pack_center:
        # Decode the rotated-frame center: same basis/range arithmetic as
        # the kernel's encode (exact-perp basis makes it a pure rotation;
        # bit-exactness is not required — the path is lossy by design and
        # ulp-level disagreements only add ~1e-7 relative error).
        a1x_s, a1y_s, a2x_s, a2y_s = axis_rows
        op_s = color_rows[3]
        tile_s = (key_s >> db).astype(jnp.int32)
        n1 = jnp.sqrt(jnp.maximum(a1x_s * a1x_s + a1y_s * a1y_s, 1e-12))
        n2 = jnp.sqrt(jnp.maximum(a2x_s * a2x_s + a2y_s * a2y_s, 1e-12))
        u1x, u1y = a1x_s / n1, a1y_s / n1
        sg = jnp.where(a2y_s * u1x - a2x_s * u1y >= 0.0, 1.0, -1.0)
        u2x, u2y = -sg * u1y, sg * u1x
        qcap_s = jnp.full_like(op_s, 1e30)
        if config.alpha_discard > 0.0:
            qcap_s = jnp.maximum(
                jnp.log(jnp.maximum(op_s, 1e-30) / config.alpha_discard), 0.0
            )
        qb = jnp.sqrt(jnp.maximum(qcap_s * 1.0002 + 1e-3, 0.0))
        if config.quad_clip:
            qb = jnp.minimum(qb, 2.001)
        half1 = 0.5 * (jnp.abs(u1x) * config.tile_w + jnp.abs(u1y) * config.tile_h)
        half2 = 0.5 * (jnp.abs(u2x) * config.tile_w + jnp.abs(u2y) * config.tile_h)
        r1 = qb * n1 + half1 + 0.51
        r2 = qb * n2 + half2 + 0.51 + 0.002 * r1
        s1 = ((cen_u & 0xFFF).astype(jnp.float32) - 2048.0) * (r1 / 2047.0)
        s2 = ((cen_u >> 12).astype(jnp.float32) - 65536.0) * (r2 / 65535.0)
        tcx = (tile_s % tiles_x).astype(jnp.float32) * config.tile_w + 0.5 * config.tile_w
        tcy = (tile_s // tiles_x).astype(jnp.float32) * config.tile_h + 0.5 * config.tile_h
        cx_s = tcx + s1 * u1x + s2 * u2x
        cy_s = tcy + s1 * u1y + s2 * u2y
    field_rows = [cx_s, cy_s] + axis_rows + color_rows

    g2 = k // config.chunk_size
    fields = jnp.concatenate(
        [jnp.stack(field_rows, axis=0), jnp.zeros((6, k), jnp.float32)], axis=0
    ).reshape(_ROWS, g2, config.chunk_size).transpose(1, 0, 2)

    binning = TileBinning(
        pair_rank=splat_s,
        pair_tile=(key_s >> db).astype(jnp.int32),
        depth_order=jnp.arange(n, dtype=jnp.int32),
        rank_counts=counts_slots,
        tile_starts=tile_starts,
        num_pairs=num_slots,
    )
    return binning, fields, num_real
