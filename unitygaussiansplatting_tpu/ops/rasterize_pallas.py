"""Pallas TPU kernel: tile-binned front-to-back compositing.

The hand-written replacement for the XLA tile rasterizer
(rasterize_tiles.py) — the hot kernel of the whole framework, standing in for
the reference's fragment-shader blending (RenderGaussianSplats.shader:79-108
plus the hardware OneMinusDstAlpha/One blend).  Same math, restructured for
the TPU pipeline model:

- Pair view data is materialized once, field-major, in tile-sorted pair
  order: one (16, K) gather by depth rank (the single irreducible random
  access), reshaped to (K/C, 16, C) blocks.  Nothing pair-sized carries a
  small trailing dim — TPU lane padding explodes (K, 3)-shaped buffers 42x.
- The kernel runs a **1-D grid of schedule steps** built at tile granularity
  with ``PrefetchScalarGridSpec``: each step names a pair *block*, the tile
  whose output it feeds, and the lane window [lo, hi) of pairs belonging to
  that tile.  Tile ranges need no chunk alignment — a block straddling two
  tiles is simply visited twice with complementary windows (~T extra steps
  out of ~K/C).  The prefetched tile id drives the *output* BlockSpec, so
  consecutive steps of one tile revisit the same (4, P) block, which Pallas
  keeps resident in VMEM — per-tile compositing state never round-trips to
  HBM mid-tile.
- Per step: alphas for C splats x P pixels on the VPU, per-pixel
  transmittance via a Hillis-Steele cumulative product along the chunk axis
  (Mosaic has no cumprod/reduce_prod lowering), color accumulation as masked
  reductions.  Transmittance is recovered exactly from the stored coverage
  (T = 1 - a), so no extra carry buffer is needed.
- Early-out: when a tile's max transmittance has dropped below
  ``transmittance_eps``, its remaining steps skip all compute (``@pl.when``),
  mirroring the official 3DGS saturation exit.
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

# Test hook: force interpreter mode for all Pallas rasterizer kernels
# (pallas TC kernels have no native CPU path).
INTERPRET = False


def _interp() -> bool:
    """Interpret-mode default: forced by tests or implied by a CPU backend."""
    return INTERPRET or jax.default_backend() == "cpu"


def build_schedule(binning: TileBinning, num_tiles: int, chunk: int):
    """Per-step tile assignment covering every tile's pair range.

    Static length ``K/C + T``: each tile contributes ceil-coverage of its
    range plus at most one boundary overlap; empty tiles contribute one
    masked step that just initializes their output block.

    Only the (S,) ``step_tile`` array is per-step — SMEM is ~1 MB, so the
    block index and lane window are *derived* inside the kernel / index map
    from two (T+1,)-sized tables (``tile_starts`` and the exclusive scan of
    steps-per-tile): ``block = starts[t]//C + (i - first_step[t])``.
    """
    k = binning.pair_rank.shape[0]
    g = k // chunk
    num_steps = g + num_tiles
    # Scalar-prefetch SMEM is ~1 MB total; the packed schedule needs
    # 2 B/step.  Found the hard way at K=70M pairs (31.5M-splat demo,
    # tools/tpu_jobs/479): C=128 needs 1.1 MB and Mosaic refuses.
    if num_steps > 450_000:
        raise ValueError(
            f"composite schedule of {num_steps} steps exceeds the ~1 MB "
            f"SMEM scalar-prefetch budget (K={k}, chunk={chunk}); raise "
            "config.chunk_size (256 halves it) or shard the frame"
        )

    starts = binning.tile_starts[:-1]  # (T,)
    ends = binning.tile_starts[1:]
    counts = ends - starts
    first_block = starts // chunk
    last_block = jnp.where(counts > 0, (ends - 1) // chunk, first_block)
    steps_per_tile = jnp.where(counts > 0, last_block - first_block + 1, 1)

    first_step = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(steps_per_tile).astype(jnp.int32)]
    )  # (T + 1,) exclusive scan; [T] = total real steps
    spt_ext = jnp.concatenate([steps_per_tile, jnp.asarray([num_steps], jnp.int32)])
    step_tile = jnp.repeat(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), spt_ext,
        total_repeat_length=num_steps,
    )
    # SMEM for prefetched operands is ~1 MB; pack two 16-bit tile ids per
    # word so the per-step array fits at bicycle-scale budgets.
    if num_tiles + 1 > 0xFFFF:
        raise ValueError(f"tile count {num_tiles} exceeds the 16-bit schedule packing")
    if num_steps % 2:
        # The pad step is either a dummy tile or a masked-out extra block of
        # the last real tile (its lane window clips empty) — safe either way.
        step_tile = jnp.concatenate([step_tile, step_tile[-1:]])
    st = step_tile.astype(jnp.uint32)
    packed = (st[0::2] | (st[1::2] << 16)).astype(jnp.int32)
    return packed, binning.tile_starts, first_step


def _cumprod_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along axis 0, Mosaic-compatible.

    jnp.cumprod has no Pallas TPU lowering; Hillis-Steele doubling gives the
    exact same result in log2(C) shifted multiplies (7 for C=128).
    """
    c = x.shape[0]
    shift = 1
    while shift < c:
        head = jax.lax.slice_in_dim(x, 0, c - shift, axis=0)
        ones = jnp.ones((shift,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([ones, head], axis=0)
        shift *= 2
    return x


def _unpack_tile(packed_ref, i):
    """Read the 16-bit tile id of step i from the 2-per-word packed array."""
    word = packed_ref[i >> 1]
    return (word >> ((i & 1) * 16)) & 0xFFFF


def _kernel(
    step_tile_ref,  # (ceil(S/2),) int32, scalar-prefetch (2x16-bit tile ids)
    tile_starts_ref,  # (T + 1,) int32, scalar-prefetch
    first_step_ref,  # (T + 1,) int32, scalar-prefetch
    fields_ref,  # (1, 16, C) VMEM block for this step
    out_ref,  # (1, 4, P) VMEM block for this step's tile
    *,
    config: RasterizeConfig,
    tiles_x: int,
    num_tiles: int,
):
    chunk = fields_ref.shape[2]
    i = pl.program_id(0)
    t = _unpack_tile(step_tile_ref, i)
    prev_t = _unpack_tile(step_tile_ref, jnp.maximum(i - 1, 0))
    is_first = jnp.logical_or(i == 0, t != prev_t)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    th, tw = config.tile_h, config.tile_w
    p = th * tw

    coverage = out_ref[0, 3, :]  # (P,) accumulated alpha = 1 - transmittance
    transmittance = 1.0 - coverage
    # Lane window of this step: pairs of tile t inside block
    # ``starts[t]//C + (i - first_step[t])`` (same formula as the in-spec
    # index map).
    t_safe = jnp.minimum(t, num_tiles - 1)
    t_start = tile_starts_ref[t_safe]
    t_end = tile_starts_ref[t_safe + 1]
    block = t_start // chunk + (i - first_step_ref[t_safe])
    lo = jnp.clip(t_start - block * chunk, 0, chunk)
    hi = jnp.clip(t_end - block * chunk, 0, chunk)
    live = (t < num_tiles) & (hi > lo)

    @pl.when((jnp.max(transmittance) >= config.transmittance_eps) & live)
    def _():
        # Pixel-center coordinates of this tile, flattened row-major (th, tw).
        tx = (t % tiles_x).astype(jnp.float32)
        ty = (t // tiles_x).astype(jnp.float32)
        lane_px = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        px = tx * tw + (lane_px % tw).astype(jnp.float32) + 0.5  # (1, P)
        py = ty * th + (lane_px // tw).astype(jnp.float32) + 0.5

        col = lambda r: fields_ref[0, r, :][:, None]  # (C, 1)
        cx, cy = col(0), col(1)
        a1x, a1y, a2x, a2y = col(2), col(3), col(4), col(5)
        cr, cg, cb, op = col(6), col(7), col(8), col(9)

        dx = px - cx  # (C, P)
        dy = py - cy
        a1_sq = jnp.maximum(a1x * a1x + a1y * a1y, 1e-12)
        a2_sq = jnp.maximum(a2x * a2x + a2y * a2y, 1e-12)
        # (C, 1)-scale divides + (C, P) FMAs — same term order as
        # tile_common.chunk_alphas (backend agreement is bit-exact).
        qx = dx * (a1x / a1_sq) + dy * (a1y / a1_sq)
        qy = dx * (a2x / a2_sq) + dy * (a2y / a2_sq)
        power = -(qx * qx + qy * qy)
        alpha = jnp.exp(power) * op
        alpha = jnp.clip(alpha, 0.0, config.alpha_max)
        keep = alpha >= config.alpha_discard
        if config.quad_clip:
            keep &= (jnp.abs(qx) <= 2.0) & (jnp.abs(qy) <= 2.0)
        # Window mask: only lanes [lo, hi) of this block belong to tile t.
        c = alpha.shape[0]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        keep &= (lane_c >= lo) & (lane_c < hi)
        alpha = jnp.where(keep, alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = _cumprod_axis0(one_minus)  # (C, P) inclusive prefix product
        head = jax.lax.slice_in_dim(cum, 0, c - 1, axis=0)
        excl = jnp.concatenate([jnp.ones((1, p), cum.dtype), head], axis=0)
        w = excl * alpha * transmittance[None, :]  # (C, P)
        total = jnp.reshape(jax.lax.slice_in_dim(cum, c - 1, c, axis=0), (p,))

        out_ref[0, 0, :] += jnp.sum(w * cr, axis=0)
        out_ref[0, 1, :] += jnp.sum(w * cg, axis=0)
        out_ref[0, 2, :] += jnp.sum(w * cb, axis=0)
        out_ref[0, 3, :] = 1.0 - transmittance * total


def composite_pallas(
    fields: jnp.ndarray,
    schedule,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool = False,
    return_raw: bool = False,
):
    """Run the Pallas composite over prepared pair blocks + schedule.

    ``fields`` is (K/C, 16, C) pair-block layout from the fused pipeline
    (ops/pair_expand.bin_and_prepare).  ``return_raw`` additionally returns the (T+1, 4, P) tile-layout buffer
    (the backward pass consumes it as the saved forward output)."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    p = th * tw
    step_tile, tile_starts, first_step = schedule
    s = 2 * step_tile.shape[0]
    chunk = fields.shape[2]
    g = fields.shape[0]

    def in_block(i, st, ts, fs):
        t = jnp.minimum(_unpack_tile(st, i), num_tiles - 1)
        block = ts[t] // chunk + (i - fs[t])
        return (jnp.clip(block, 0, g - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, _FIELDS, chunk), in_block),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p), lambda i, st, ts, fs: (_unpack_tile(st, i), 0, 0)
        ),
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, config=config, tiles_x=tiles_x, num_tiles=num_tiles
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, 4, p), jnp.float32),
        interpret=interpret or _interp(),
    )(step_tile, tile_starts, first_step, fields)

    # Untile: (T, 4, P) -> (H, W, 4).
    img = out[:num_tiles].reshape(tiles_y, tiles_x, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * th, tiles_x * tw, 4)
    img = img[:height, :width]
    if return_raw:
        return img, out
    return img


def tile_layout(img: jnp.ndarray, width: int, height: int, config: RasterizeConfig):
    """Inverse of the untile: (H, W, 4) -> (T + 1, 4, P) tile-major buffer."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = tile_grid(width, height, config)
    pad_y = tiles_y * th - height
    pad_x = tiles_x * tw - width
    padded = jnp.pad(img, ((0, pad_y), (0, pad_x), (0, 0)))
    t = padded.reshape(tiles_y, th, tiles_x, tw, 4).transpose(0, 2, 4, 1, 3)
    t = t.reshape(tiles_x * tiles_y, 4, th * tw)
    return jnp.concatenate([t, jnp.zeros((1, 4, th * tw), img.dtype)], axis=0)


def rasterize_tiles_pallas(
    proj: ProjectedSplats,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Bin + composite splats with the fused Pallas pipeline; (H, W, 4) RGBA."""
    from .pair_expand import bin_and_prepare

    tiles_x, tiles_y = tile_grid(width, height, config)
    num_tiles = tiles_x * tiles_y
    binning, fields, _ = bin_and_prepare(
        proj, width, height, config, interpret=interpret or _interp(),
    )
    schedule = build_schedule(binning, num_tiles, config.chunk_size)
    return composite_pallas(fields, schedule, width, height, config, interpret)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, Pallas backward.
#
# The backward is the hand-written VJP kernel in rasterize_pallas_bwd.py
# (second forward walk computing the 3DGS compositing gradients), with an
# XLA-autodiff fallback (config.pallas_backward=False) kept for testing.
# Gradients flow to the projected splat data; binning indices are
# non-differentiable, as in every 3DGS implementation (SURVEY.md §7 hard
# part #3).


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def rasterize_tiles_pallas_diff(
    proj: ProjectedSplats,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
) -> jnp.ndarray:
    """Differentiable (w.r.t. proj) fused Pallas rasterization."""
    return rasterize_tiles_pallas(proj, width, height, config)


def _diff_fwd(proj, width, height, config):
    from .pair_expand import bin_and_prepare

    tiles_x, tiles_y = tile_grid(width, height, config)
    binning, fields, _ = bin_and_prepare(
        proj, width, height, config, interpret=_interp()
    )
    schedule = build_schedule(binning, tiles_x * tiles_y, config.chunk_size)
    out, raw = composite_pallas(
        fields, schedule, width, height, config, return_raw=True
    )
    return out, (proj, binning, fields, raw, schedule)


def _diff_bwd(width, height, config, res, g):
    import numpy as _np

    proj, binning, fields, raw, schedule = res
    n = proj.depth.shape[0]

    if getattr(config, "pallas_backward", True):
        from .rasterize_pallas_bwd import (
            composite_pallas_bwd,
            pair_gradients_to_splats,
            steps_to_pair_gradients,
        )

        tiles_x, tiles_y = tile_grid(width, height, config)
        num_tiles = tiles_x * tiles_y
        dout_raw = tile_layout(g, width, height, config)
        dsteps = composite_pallas_bwd(
            fields, schedule, raw, dout_raw, width, height, config
        )
        dpairs = steps_to_pair_gradients(dsteps, binning, num_tiles, config.chunk_size)
        dsplat = pair_gradients_to_splats(
            dpairs, binning, binning.rank_counts, n, identity_order=True,
            pack_bf16=getattr(config, "pack_grads_bf16", False),
            interpret=_interp(),
        )
        d_proj = ProjectedSplats(
            depth=jnp.zeros_like(proj.depth),
            center=dsplat[:, 0:2],
            axis1=dsplat[:, 2:4],
            axis2=dsplat[:, 4:6],
            conic=jnp.zeros_like(proj.conic),
            color=dsplat[:, 6:9],
            opacity=dsplat[:, 9],
            valid=_np.zeros(proj.valid.shape, jax.dtypes.float0),
        )
    else:
        from .binning import bin_splats
        from .rasterize_tiles import rasterize_tiles_jax

        def f(p):
            b = bin_splats(p, width, height, config)
            return rasterize_tiles_jax(p, b, width, height, config)

        _, vjp = jax.vjp(f, proj)
        (d_proj,) = vjp(g)

    return (d_proj,)


rasterize_tiles_pallas_diff.defvjp(_diff_fwd, _diff_bwd)
