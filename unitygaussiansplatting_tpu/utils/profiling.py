"""Per-phase timing + render statistics.

The TPU-native analog of the reference's ProfilerMarkers
(package/Runtime/GaussianSplatRenderer.cs:20-22 ``GaussianSplat.{Draw,
Compose,CalcView}`` and :287 ``GaussianSplat.Sort``), which produce the
readme's published phase breakdown (readme.md:84: 4.5 ms draw / 1.1 ms sort /
0.8 ms view calc).  Two mechanisms:

- ``jax.named_scope`` annotations inside the render pipeline label the XLA/
  Pallas ops in ``jax.profiler`` traces (use ``jax.profiler.trace`` around a
  frame and inspect with tensorboard/xprof).
- :func:`render_phases` times each pipeline stage as a separately-jitted,
  blocked call — coarse but dependency-free, and what ``bench.py`` reports.
  Stage boundaries match the frame dataflow, so the sum approximates (and
  slightly exceeds, due to lost fusion) the fused frame time.
"""

from __future__ import annotations

import time
from typing import Any

import jax

from ..ops import rasterize_pallas as _rp
from ..ops.binning import pair_budget, tile_grid
from ..ops.projection import project_splats
from ..utils.config import RasterizeConfig, RenderSettings


def trace_frame(fn, *args, logdir: str = "/tmp/tpu_splat_trace"):
    """Capture a jax.profiler trace of one call (inspect with xprof/TensorBoard).

    The named scopes inside the render path (splat_project / splat_bin /
    splat_rasterize_*) label the ops in the trace — the analog of the
    reference's ProfilerMarker GPU samples.
    """
    out = jax.block_until_ready(fn(*args))  # compile outside the trace
    with jax.profiler.trace(logdir):
        out = jax.block_until_ready(fn(*args))
    return out, logdir


def _time_call(fn, *args, reps: int = 3) -> tuple[float, Any]:
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth, GB/s


def phase_roofline(
    n: int,
    k: int,
    width: int,
    height: int,
    config: RasterizeConfig,
    sh_order: int,
    phases_ms: dict,
) -> dict:
    """Analytical bytes-moved + achieved-vs-peak HBM bandwidth per phase.

    The model counts the HBM traffic each phase MUST move (reads of its
    live inputs + writes of its outputs, assuming perfect on-chip reuse);
    ``pct_of_bound`` is the phase's bandwidth-bound time over its measured
    time — 100% means the phase runs at the HBM roofline, lower means the
    gap is compute, latency, or scheduling.  Two phases are not
    bandwidth-modeled as a single pass:

    - ``bin_prepare``'s sort: ``jax.lax.sort`` is a multi-pass comparison
      sort; the bound models ceil(log2 K) merge passes over all operand
      bytes (each pass reads + writes every operand).  A Pallas radix
      alternative is infeasible on TPU (docs/architecture.md), so this IS
      the primitive's floor-shape.
    - ``kernel_untile`` is VPU-compute-bound (every pair evaluates its
      Gaussian at every pixel of a 2048-px tile); its byte count is tiny
      by design (that's the point of the field-major layout).
    """
    import math

    ops = 2  # key + splat id
    ops += 1 if getattr(config, "pack_center_u32", False) else 2
    if getattr(config, "pack_axes_u32", False):
        ops += 1
    elif config.pack_axes_f16:
        ops += 2
    else:
        ops += 4
    if getattr(config, "pack_color_rgba8", False):
        ops += 1
    elif config.pack_color_f16:
        ops += 2
    else:
        ops += 4

    sh_floats = {0: 0, 1: 9, 2: 24, 3: 45}.get(sh_order, 45)
    splat_in = (3 + 4 + 3 + 1 + 3 + sh_floats) * 4  # means/rot/scale/op/sh0/sh
    proj_bytes = (1 + 2 + 2 + 2 + 3 + 3 + 1 + 1) * 4  # ProjectedSplats rows
    table_bytes = 16 * 4
    p = config.tile_h * config.tile_w
    tiles = (width + config.tile_w - 1) // config.tile_w * (
        (height + config.tile_h - 1) // config.tile_h
    )

    phases = {
        # read raw splats, write ProjectedSplats
        "project": n * (splat_in + proj_bytes),
        # read proj, write the 16-row field table (+boundaries, small)
        "table": n * (proj_bytes + table_bytes),
        # read lo+hi table blocks per step, write the sort operands
        "expand": 2 * n * table_bytes + k * ops * 4,
        # ceil(log2 K) merge passes, each read+write of every operand
        "sort": 2 * math.ceil(math.log2(max(k, 2))) * k * ops * 4,
        # read sorted operands, write the (K/C, 16, C) field blocks
        "post": k * (ops * 4 + 16 * 4),
        # read field blocks once, write the (T+1, 4, P) tile buffer
        "kernel_untile": k * 16 * 4 + (tiles + 1) * 4 * p * 4 * 2,
    }
    # Map onto the measured phase boundaries: bin_prepare covers
    # table+expand+sort+post in the fused pipeline.
    merged = {
        "project": phases["project"],
        "bin_prepare": phases["table"] + phases["expand"] + phases["sort"]
        + phases["post"],
        "schedule": tiles * 4 * 6,
        "kernel_untile": phases["kernel_untile"],
    }
    out = {}
    for name, bytes_ in merged.items():
        ms = phases_ms.get(name)
        if ms is None:
            continue
        gb = bytes_ / 1e9
        bound_ms = gb / V5E_HBM_GBPS * 1e3
        out[name] = {
            "ms": ms,
            "modeled_gb": round(gb, 3),
            "achieved_gbps": round(gb / (ms / 1e3), 1) if ms > 0 else None,
            "hbm_bound_ms": round(bound_ms, 1),
            "pct_of_bound": round(100.0 * bound_ms / ms, 1) if ms > 0 else None,
        }
    if "kernel_untile" in out:
        out["kernel_untile"]["bound"] = "VPU-compute (pair x pixel evals)"
    if "bin_prepare" in out:
        out["bin_prepare"]["bound"] = (
            f"sort: {math.ceil(math.log2(max(k, 2)))} merge passes x "
            f"{ops} operands"
        )
    return out


def render_phases(
    gaussians,
    camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    reps: int = 3,
) -> dict:
    """Time each forward stage of the pallas backend separately.

    Returns ``{"phases_ms": {...}, "num_pairs": int, "pair_budget": int,
    "overflow": bool}``.  Mirrors the reference's sort/view-calc/draw
    breakdown at TPU-pipeline granularity.
    """
    w, h = camera.width, camera.height
    tiles_x, tiles_y = tile_grid(w, h, config)
    num_tiles = tiles_x * tiles_y

    from ..ops.pair_expand import bin_and_prepare

    interpret = _rp._interp()
    phases: dict[str, float] = {}
    if hasattr(gaussians, "pos_q"):  # DeviceAsset: time the on-device decode
        from ..io.device_asset import decode_device

        ms, gaussians = _time_call(jax.jit(decode_device), gaussians, reps=reps)
        phases["decode"] = round(ms, 2)
    ms, proj = _time_call(
        jax.jit(lambda g: project_splats(g, camera, settings)), gaussians, reps=reps
    )
    phases["project"] = round(ms, 2)

    ms, (binning, fields, num_real) = _time_call(
        jax.jit(lambda p: bin_and_prepare(p, w, h, config, interpret=interpret)),
        proj,
        reps=reps,
    )
    phases["bin_prepare"] = round(ms, 2)

    ms, schedule = _time_call(
        jax.jit(lambda b: _rp.build_schedule(b, num_tiles, config.chunk_size)),
        binning,
        reps=reps,
    )
    phases["schedule"] = round(ms, 2)

    ms, _img = _time_call(
        jax.jit(
            lambda f, s: _rp.composite_pallas(
                f, s, w, h, config, interpret=interpret
            )
        ),
        fields,
        schedule,
        reps=reps,
    )
    phases["kernel_untile"] = round(ms, 2)
    phases["total_unfused"] = round(sum(phases.values()), 2)

    n = int(gaussians.means.shape[0])
    budget = pair_budget(n, config)
    num_pairs = int(binning.num_pairs)
    return {
        "phases_ms": phases,
        "num_pairs": num_pairs,
        "num_real_pairs": int(num_real),
        "pair_budget": budget,
        "overflow": num_pairs > budget,
        "roofline": phase_roofline(
            n, budget, w, h, config, settings.sh_order, phases
        ),
    }
