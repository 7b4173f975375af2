"""Culled all-to-all exchange of projected splats (owner-computes strips).

The scalable replacement for strips.py's ``all_gather``: that path
replicates *all* N splats' view data on every device (O(N_total) per-device
memory), which defeats the >8.6M-splat scaling story (the reference is
hard-capped at 8.6M by a 2 GB buffer, GaussianSplatAsset.cs:16; the TPU
design removes the cap by sharding).  Here each splat-owner:

1. projects its shard (no comms),
2. computes, from the same opacity-aware ellipse AABBs the binner uses
   (ops/binning.tile_rects), the contiguous range of tile-row *strips* each
   splat touches,
3. compacts, per destination device, the view data of splats touching that
   strip into a fixed-capacity send buffer (compaction = one single-key
   sort + capped gathers — no scatters),
4. exchanges buffers with one ``jax.lax.all_to_all`` over ICI,

so per-device memory is O(N_local x D x cap_frac) = O(N_total x overlap/D)
instead of O(N_total).  Gradients flow back through the transpose of the
all_to_all and the compaction gathers automatically — the path trains as-is.

Send capacity is static (XLA shapes): splats beyond ``cap`` per (src, dst)
are dropped farthest-last in submission order and the true demand is
returned so callers can detect truncation (same failure-surface contract as
the pair budget, models/renderer.check_overflow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from ..models.camera import Camera
from ..models.gaussians import Gaussians
from ..ops.binning import cdiv, tile_grid, tile_rects
from ..ops.tile_common import quantize_view_fp16
from ..ops.projection import ProjectedSplats, project_splats
from ..utils.config import RasterizeConfig, RenderSettings
from .mesh import SPLAT_AXIS
from .strips import _strip_height


def send_capacity(n_local: int, cap_frac: float) -> int:
    """Static per-(src, dst) send-buffer capacity in splats.

    The single source of truth for truncation detection: a frame is
    truncated iff any entry of the returned ``send_demand`` matrix exceeds
    this (the same contract as RenderStats.num_pairs vs the pair budget).
    """
    return min(max(cdiv(int(n_local * cap_frac), 8) * 8, 8), n_local)


def _compact_for_dest(proj: ProjectedSplats, send_mask: jnp.ndarray, cap: int):
    """Select up to cap masked splats' view data; returns (pytree, demand)."""
    n = send_mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(send_mask, iota, jnp.int32(0x7FFFFFFF))
    order = jax.lax.sort((key,), num_keys=1, is_stable=True)[0]
    picks = jnp.minimum(order[:cap], n - 1)
    demand = jnp.sum(send_mask.astype(jnp.int32))
    live = jnp.arange(cap, dtype=jnp.int32) < demand
    sel = jax.tree_util.tree_map(lambda x: jnp.take(x, picks, axis=0), proj)
    sel = sel._replace(valid=sel.valid & live)
    return sel, demand


def render_strips_culled_fn(
    mesh: Mesh,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    cap_frac: float | None = None,
):
    """Build the jitted culled-exchange strip renderer.

    Returns fn(gaussians_sharded) -> ((H, W, 4) image, send_demand (D, D)).
    ``send_demand[s, d]`` is how many splats source s wanted to send to
    dest d — compare against the static capacity to detect truncation.

    cap_frac: per-destination send capacity as a fraction of the local
    shard size; defaults to min(1, 4/D) (a strip covers ~1/D of the screen
    plus overlap).
    """
    d_count = mesh.shape[SPLAT_AXIS]
    strip_h = _strip_height(camera.height, d_count, config)
    padded_h = strip_h * d_count
    if cap_frac is None:
        cap_frac = min(1.0, 4.0 / d_count)

    def per_device(g: Gaussians) -> tuple[jnp.ndarray, jnp.ndarray]:
        proj = project_splats(g, camera, settings)
        n_l = proj.depth.shape[0]
        cap = send_capacity(n_l, cap_frac)

        # Exact per-destination membership: recompute the rect exactly as
        # the destination's local binning will — shift the centers by the
        # dest strip origin (EXACT in f32: origins are multiples of tile_h
        # and pixel coords are far below 2^24, so the subtraction is a
        # shared-ulp difference with no rounding), then apply the same fp16
        # view quantization + tile_rects at strip height that bin_splats
        # applies to the shifted data it receives.  Bit-for-bit agreement
        # means zero slack: r4 shipped one tile row of slack each way
        # instead, which at one-tile-row strips sent every splat to ~3
        # strips (measured replication 0.43 where the true mean row span
        # was 1.46 — the dryrun's whole scaling story).
        sends = []
        demands = []
        for dst in range(d_count):
            shifted_d = proj._replace(
                center=proj.center
                - jnp.stack([jnp.float32(0.0), jnp.float32(dst * strip_h)])
            )
            *_, counts_d, valid_d = tile_rects(
                quantize_view_fp16(shifted_d, config), camera.width, strip_h, config
            )
            mask = valid_d & (counts_d > 0)
            sel, demand = _compact_for_dest(proj, mask, cap)
            sends.append(sel)
            demands.append(demand)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *sends
        )  # leaves: (D * cap, ...), chunk d destined for device d
        demand_row = jnp.stack(demands)  # (D,)

        # One all-to-all: chunk d of the send buffer goes to device d.
        recv = jax.tree_util.tree_map(
            lambda x: jax.lax.all_to_all(
                x, SPLAT_AXIS, split_axis=0, concat_axis=0, tiled=True
            ),
            stacked,
        )  # leaves: (D * cap, ...) view data of splats touching MY strip
        demand_all = jax.lax.all_gather(demand_row, SPLAT_AXIS, axis=0)  # (D, D)

        idx = jax.lax.axis_index(SPLAT_AXIS)
        origin_y = (idx * strip_h).astype(jnp.float32)
        shifted = recv._replace(
            center=recv.center - jnp.stack([jnp.float32(0.0), origin_y])
        )
        if backend == "pallas":
            from ..ops.rasterize_pallas import rasterize_tiles_pallas_diff

            strip = rasterize_tiles_pallas_diff(
                shifted, camera.width, strip_h, config
            )
        else:
            from ..ops.binning import bin_splats
            from ..ops.rasterize_tiles import rasterize_tiles_jax

            binning = bin_splats(shifted, camera.width, strip_h, config)
            strip = rasterize_tiles_jax(shifted, binning, camera.width, strip_h, config)
        strips = jax.lax.all_gather(strip, SPLAT_AXIS, axis=0, tiled=False)
        return strips.reshape(padded_h, camera.width, 4)[: camera.height], demand_all

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(PartitionSpec(SPLAT_AXIS),),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,
    )
    return jax.jit(fn)


def render_strips_culled(g: Gaussians, mesh: Mesh, camera: Camera, **kw):
    return render_strips_culled_fn(mesh, camera, **kw)(g)
