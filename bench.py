"""Benchmark: forward render throughput on the headline-class scene.

Headline metric mirrors the reference's (BASELINE.md): bicycle-class scene,
6.1M splats at 1200x797 — the reference does 6.8 ms/frame on an RTX 3080 Ti
(readme.md:79-84).  The bicycle asset itself is not distributable, so the
bench renders a synthetic scene with the same splat count, resolution and SH
order.  ``vs_baseline`` is reference_ms / our_ms (>1 means faster than the
reference GPU).

Dispatch to the tunneled TPU costs ~30-200 ms per call, so frames are
iterated *inside* one compiled computation (lax.scan over per-frame opacity
scales, which prevents CSE between iterations).

Env knobs: BENCH_N (splats), BENCH_W/BENCH_H, BENCH_FRAMES, BENCH_BACKEND.
Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

REFERENCE_MS = 6.8  # readme.md:84, RTX 3080 Ti


def main():
    n = int(os.environ.get("BENCH_N", 6_100_000))
    width = int(os.environ.get("BENCH_W", 1200))
    height = int(os.environ.get("BENCH_H", 797))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    scene = sphere_scene(n=n, seed=0).activate()
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene)
    camera = Camera.look_at(
        eye=[0.0, 0.6, -3.0],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y_deg=47.0,
        width=width,
        height=height,
    )
    # 6x pair budget: the synthetic scene averages ~5.5 tiles per splat at
    # this resolution; 4x would clip the deepest pairs.
    config = RasterizeConfig(pair_multiplier=float(os.environ.get("BENCH_PAIR_MULT", 6.0)))

    mode = os.environ.get("BENCH_MODE", "fwd_bwd")

    @jax.jit
    def frame(g, opacity_scale):
        settings = RenderSettings(sh_order=3, opacity_scale=opacity_scale)
        return render(g, camera, settings, config, backend=backend)

    @jax.jit
    def frame_bwd(g, opacity_scale):
        def loss(gg):
            settings = RenderSettings(sh_order=3, opacity_scale=opacity_scale)
            img = render(gg, camera, settings, config, backend=backend)
            return jnp.mean(img)

        return jax.grad(loss)(g)

    fn = frame_bwd if mode == "fwd_bwd" else frame

    # Warm up / compile, then time over `frames` calls (per-call dispatch to
    # the tunneled chip is ~30 ms, negligible at this frame cost).
    jax.block_until_ready(fn(scene, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(frames):
        out = fn(scene, jnp.float32(1.0 + 0.001 * i))
    jax.block_until_ready(out)
    ms_per_frame = (time.perf_counter() - t0) / frames * 1000.0

    label = "fwd+bwd" if mode == "fwd_bwd" else "fwd"
    # vs_baseline compares against the reference's published *forward-only*
    # 6.8 ms (it has no backward at all, BASELINE.md).
    print(
        json.dumps(
            {
                "metric": (
                    f"{label} ms/frame, synthetic bicycle-class {n} splats "
                    f"@{width}x{height} SH3 (pallas backend, v5e chip)"
                ),
                "value": round(ms_per_frame, 3),
                "unit": "ms",
                "vs_baseline": round(REFERENCE_MS / ms_per_frame, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
