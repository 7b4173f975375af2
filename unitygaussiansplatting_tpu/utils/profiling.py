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
    }
