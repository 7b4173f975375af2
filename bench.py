"""Benchmark: forward(+backward) render throughput on the headline-class scene.

Headline metric mirrors the reference's (BASELINE.md): bicycle-class scene,
6.1M splats at 1200x797 — the reference does 6.8 ms/frame on an RTX 3080 Ti
(readme.md:79-84).  The bicycle asset itself is not distributable, so the
bench renders a synthetic scene with the same splat count, resolution and SH
order.  ``vs_baseline`` is reference_ms / our_ms (>1 means faster than the
reference GPU).

Termination contract (the driver runs this under a finite ``timeout`` and
parses a JSON line from the output tail — rounds 2 and 3 lost their perf
credit to rc!=0 with nothing parseable, BENCH_r02/r03.json):

- The HEADLINE is measured first and its complete JSON line printed the
  moment it exists; every later extra re-prints the (grown) result line, so
  the last parseable line in the tail is always the most complete result.
- A global watchdog armed BEFORE backend init (BENCH_WATCHDOG_S, default
  1080 s from original process start, surviving re-execs via _BENCH_T0)
  prints the partial result and exits rather than letting the driver's
  timeout kill an unflushed process.
- SIGTERM/SIGINT (what ``timeout`` sends first) dump the partial result too.
- Extras are individually gated on the remaining budget
  (BENCH_DEADLINE_S, default 900 s) with per-extra cost estimates; skipped
  extras are recorded in ``skipped`` instead of overrunning.

The JSON also carries: ``phases`` (per-stage forward breakdown — the analog
of the reference's ProfilerMarker numbers, readme.md:84), ``pairs`` (true
(splat, tile) pair demand vs static budget + overflow flag), and
``extra_metrics`` (fwd-only headline, realistic-capture-statistics scene,
device-resident compressed rendering, full-import pipeline scene).

Dispatch to the tunneled TPU costs ~30-200 ms per call; at current frame
costs that is negligible, so frames are timed as repeated jit calls.

Env knobs: BENCH_N (splats), BENCH_W/BENCH_H, BENCH_FRAMES, BENCH_BACKEND,
BENCH_MODE (fwd|fwd_bwd), BENCH_SKIP_EXTRAS=1 for the quick headline only.
"""

import copy
import json
import os
import signal
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_MS = 6.8  # readme.md:84, RTX 3080 Ti

# Absolute start time, surviving the re-exec in _acquire_backend so the
# watchdog/deadline measure the window the DRIVER sees, not per-exec time.
_T0 = float(os.environ.get("_BENCH_T0") or time.time())
os.environ["_BENCH_T0"] = repr(_T0)
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", 1080))
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 900))


def _elapsed() -> float:
    return time.time() - _T0


def _remaining() -> float:
    return DEADLINE_S - _elapsed()


# Progressively-filled result: printed whenever it grows, and emitted as-is
# by the watchdog / signal handlers so a healthy headline is never discarded
# because a later extra (or its compile) overran the window.
_RESULT: dict = {}
_RESULT_LOCK = threading.Lock()


def _print_result(note: str | None = None) -> None:
    """Print the current result as ONE atomic JSON line (last line wins)."""
    try:
        with _RESULT_LOCK:
            snap = copy.deepcopy(_RESULT)
        if note:
            snap["truncated"] = note
        line = json.dumps(snap)
    except Exception as e:  # never die while trying to report
        line = json.dumps(
            {
                "metric": "fwd+bwd ms/frame (result serialization failed)",
                "value": None,
                "unit": "ms",
                "vs_baseline": 0.0,
                "error": repr(e),
            }
        )
    print(line, flush=True)


def _die_with_partial(reason: str, code: int) -> None:
    with _RESULT_LOCK:
        have_value = _RESULT.get("value") is not None
    if have_value:
        _print_result(note=reason + "; headline metric is complete")
        os._exit(0)
    print(
        json.dumps(
            {
                "metric": "fwd+bwd ms/frame (bench aborted)",
                "value": None,
                "unit": "ms",
                "vs_baseline": 0.0,
                "error": reason,
            }
        ),
        flush=True,
    )
    os._exit(code)


def _arm_watchdog() -> None:
    """Hard upper bound on bench lifetime, armed BEFORE backend init: a
    wedged transport (device init or a dispatch hanging forever) still ends
    in one parseable JSON line instead of the driver's silent rc=124."""
    delay = max(WATCHDOG_S - _elapsed(), 5.0)

    def fire():
        _die_with_partial(
            f"bench watchdog fired at {WATCHDOG_S:.0f}s "
            "(TPU transport wedged or budget misjudged)",
            3,
        )

    t = threading.Timer(delay, fire)
    t.daemon = True
    t.start()


def _install_signal_handlers() -> None:
    """``timeout`` sends SIGTERM before SIGKILL: dump the partial result.
    Best-effort (the main thread may be blocked inside a dispatch); the
    watchdog thread is the reliable path."""

    def handler(signum, frame):
        _die_with_partial(f"terminated by signal {signum}", 3)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass


# Relay ports the tunneled-TPU plugin dials (see /root/.tpu_init.py PORTS);
# probing with a bare TCP connect does NOT create a PJRT client/chip claim.
_RELAY_PORTS = (8082, 8083, 8087)


def _relay_up() -> bool:
    for port in _RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def _tpu_client_pids() -> set[int]:
    """PIDs of every OTHER process holding a live TCP connection to a TPU
    relay port — i.e. every other PJRT client contending for the chip claim.

    Precise by construction (socket-inode match, not cmdline patterns): a
    process only appears here if it literally has a connection open to the
    tunnel, which is the definition of a TPU client.  The relay server
    itself is excluded by direction (its sockets have LOCAL port 8082/…;
    clients have REMOTE port 8082/…).
    """
    import glob as _glob

    inodes = set()
    for table in ("/proc/net/tcp", "/proc/net/tcp6"):
        try:
            lines = open(table).read().splitlines()[1:]
        except OSError:
            continue
        for line in lines:
            parts = line.split()
            if len(parts) < 10:
                continue
            try:
                rem_port = int(parts[2].split(":")[1], 16)
                state = parts[3]
            except (IndexError, ValueError):
                continue
            if state == "01" and rem_port in _RELAY_PORTS:  # ESTABLISHED
                inodes.add(parts[9])
    if not inodes:
        return set()
    pids = set()
    me = os.getpid()
    for fd in _glob.glob("/proc/[0-9]*/fd/*"):
        try:
            target = os.readlink(fd)
        except OSError:
            continue
        if target.startswith("socket:["):
            if target[8:-1] in inodes:
                pid = int(fd.split("/")[2])
                if pid != me:
                    pids.add(pid)
    return pids


def _clear_foreign_tpu_clients() -> None:
    """Enforce the single-TPU-client rule by construction: kill the EXACT
    pids holding relay connections (round 4's bench died because a stale
    worker's claim outlived its pidfile-based kill — BENCH_r04.json)."""
    pids = _tpu_client_pids()
    if not pids:
        return
    for pid in sorted(pids):
        try:
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().decode(errors="replace")
        except OSError:
            cmd = "?"
        print(f"bench: killing TPU client pid {pid} ({cmd[:120]!r})",
              file=sys.stderr)
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            pass
    deadline = time.time() + 15
    while time.time() < deadline and any(
        os.path.exists(f"/proc/{p}") for p in pids
    ):
        time.sleep(0.3)
    for pid in pids:
        if os.path.exists(f"/proc/{pid}"):
            print(f"bench: SIGKILL TPU client pid {pid}", file=sys.stderr)
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
    # Give the relay a moment to notice the disconnects and release the
    # chip claim before we initiate ours.
    deadline = time.time() + 30
    while time.time() < deadline and _tpu_client_pids():
        time.sleep(0.5)
    time.sleep(2.0)


def _kill_stale_worker():
    """Enforce the single-TPU-client rule: if the dev measurement worker
    (tools/tpu_worker.py) is still alive, stop it by its EXACT recorded pid
    before claiming the chip (a second client makes every dispatch take
    minutes).  Never pattern-kills."""
    pidfile = "/tmp/tpuq/pid"
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().decode(errors="replace")
    except OSError:
        return  # not running
    if "tpu_worker" not in cmd:
        return  # pid was recycled by an unrelated process: leave it alone
    print(f"bench: stopping stale TPU worker pid {pid}", file=sys.stderr)
    os.kill(pid, signal.SIGTERM)
    for _ in range(50):
        if not os.path.exists(f"/proc/{pid}"):
            break
        time.sleep(0.2)
    else:
        os.kill(pid, signal.SIGKILL)
        time.sleep(1.0)
    try:
        os.remove(pidfile)
    except OSError:
        pass


def _emit_error_line(msg: str) -> None:
    """One parseable JSON line proving the bench ran, with a CPU smoke
    number so 'code works, transport down' is distinguishable from 'code
    broken' in the recorded artifact."""
    smoke_ms = None
    smoke_budget = min(max(_remaining(), 30.0), 240.0)
    try:
        import subprocess

        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             "import sys; sys.path.insert(0, %r);"
             "from unitygaussiansplatting_tpu.models.camera import Camera;"
             "from unitygaussiansplatting_tpu.models.renderer import render;"
             "from unitygaussiansplatting_tpu.utils.config import RenderSettings;"
             "from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene;"
             "g = sphere_scene(n=20000, seed=0).activate();"
             "cam = Camera.look_at(eye=[0,0.6,-3], target=[0,0,0], up=[0,1,0],"
             " fov_y_deg=47.0, width=320, height=200);"
             "img = render(g, cam, RenderSettings(sh_order=1));"
             "print('smoke ok', float(img.mean()))"
             % os.path.dirname(os.path.abspath(__file__))],
            capture_output=True, timeout=smoke_budget, text=True,
        )
        if r.returncode == 0 and "smoke ok" in r.stdout:
            smoke_ms = round((time.perf_counter() - t0) * 1000.0, 1)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "fwd+bwd ms/frame (bench aborted: TPU unavailable)",
                "value": None,
                "unit": "ms",
                "vs_baseline": 0.0,
                "error": msg,
                "cpu_smoke_render_ms": smoke_ms,
            }
        ),
        flush=True,
    )
    # os._exit: must also terminate from watchdog threads (sys.exit in a
    # non-main thread only kills that thread).
    os._exit(3)


def _acquire_backend():
    """Init the accelerator backend, waiting out transport outages.

    Round 2's only perf artifact was lost to a one-shot init failure
    (BENCH_r02.json rc=1, 'Unable to initialize backend axon'); with the
    tunnel fully dead, PJRT init does not even raise — it HANGS.  So:
    (1) never touch jax unless the relay port is listening (a bare TCP
    probe, no chip claim); wait up to BENCH_INIT_WAIT_S for it.
    (2) Registration happens in sitecustomize at interpreter start, so a
    registration that already failed cannot be retried in-process: re-exec
    this script (fresh interpreter -> fresh registration), max 3 attempts.
    (3) The global watchdog is already armed; an init-hang timer surfaces a
    cleaner message well before it."""
    if os.environ.get("BENCH_ALLOW_CPU") == "1":
        return

    attempts = int(os.environ.get("_BENCH_REEXEC_N", "0"))
    wait_s = float(os.environ.get("BENCH_INIT_WAIT_S", 300))
    deadline = time.time() + wait_s
    while not _relay_up():
        if time.time() > deadline:
            _emit_error_line(
                f"TPU transport down for {wait_s:.0f}s "
                "(no relay port listening; tunnel dead)"
            )
        time.sleep(15)

    import jax

    init_watchdog = threading.Timer(
        float(os.environ.get("BENCH_INIT_HANG_S", 420)),
        lambda: (_emit_error_line("PJRT backend init hung (relay port open "
                                  "but device init never returned)")),
    )
    init_watchdog.daemon = True
    init_watchdog.start()
    try:
        devs = jax.devices()
        ok = devs[0].platform != "cpu"
        err = None
    except RuntimeError as e:
        ok, err = False, e
    init_watchdog.cancel()
    if ok:
        return

    print(f"bench: backend init failed (attempt {attempts + 1}): {err}",
          file=sys.stderr)
    if attempts >= 3:
        _emit_error_line(
            "TPU backend failed to initialize after 3 re-exec attempts "
            "(relay port answered but PJRT init kept failing)"
        )
    # Back off before re-exec: rapid PJRT client churn can wedge the chip
    # claim for up to an hour (tools/README.md).
    time.sleep(30 * (attempts + 1))
    os.environ["_BENCH_REEXEC_N"] = str(attempts + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


_arm_watchdog()
_install_signal_handlers()
if os.environ.get("BENCH_ALLOW_CPU") != "1":
    # Only when actually claiming the chip: a CPU-mode bench run must not
    # shoot down a live measurement worker.
    _kill_stale_worker()
    _clear_foreign_tpu_clients()
_acquire_backend()

import jax
import numpy as np
import jax.numpy as jnp

if os.environ.get("BENCH_ALLOW_CPU") == "1":
    # Actually pin CPU: the ambient axon sitecustomize overrides
    # JAX_PLATFORMS, so without this a "CPU" bench run would silently claim
    # the TPU chip (and contend with whatever owns it).
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (VERDICT r4 #1b): the headline fwd+bwd
# program cold-compiles in ~7-9 min through the tunnel — most of the round
# 2-4 bench failures were that compile racing the watchdog.  The cache is
# pre-warmed during the round by a bench rehearsal with identical shapes,
# so the driver's run replays executables in seconds.  Metadata (source
# locations) is excluded from the key by default in jax 0.9.
_CACHE_DIR = os.environ.get(
    "BENCH_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print(f"bench: compilation cache at {_CACHE_DIR} "
          f"({len(os.listdir(_CACHE_DIR))} entries)", file=sys.stderr)
except Exception as e:  # cache is an optimization, never a failure mode
    print(f"bench: compilation cache unavailable: {e!r}", file=sys.stderr)


def time_frames(fn, scene, frames):
    jax.block_until_ready(fn(scene, jnp.float32(1.0)))
    t0 = time.perf_counter()
    out = None
    for i in range(frames):
        out = fn(scene, jnp.float32(1.0 + 0.001 * i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / frames * 1000.0


def _run_extra(name: str, est_s: float, fn) -> None:
    """Run one best-effort extra: skipped when the remaining budget cannot
    cover its cost estimate, and a failure never loses the headline."""
    with _RESULT_LOCK:
        skipped = _RESULT.setdefault("skipped", [])
    rem = _remaining()
    if rem < est_s:
        print(f"bench: skipping extra '{name}' (needs ~{est_s:.0f}s, "
              f"{rem:.0f}s left)", file=sys.stderr)
        with _RESULT_LOCK:
            skipped.append({"extra": name, "est_s": est_s,
                            "remaining_s": round(rem, 1)})
        return
    print(f"bench: extra '{name}' (est {est_s:.0f}s, {rem:.0f}s left)",
          file=sys.stderr)
    try:
        fn()
    except Exception as e:
        print(f"bench: extra '{name}' failed: {e!r}", file=sys.stderr)
        with _RESULT_LOCK:
            skipped.append({"extra": name, "error": repr(e)})
    _print_result()  # re-print after each extra: last line = most complete


def main():
    n = int(os.environ.get("BENCH_N", 6_100_000))
    width = int(os.environ.get("BENCH_W", 1200))
    height = int(os.environ.get("BENCH_H", 797))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    mode = os.environ.get("BENCH_MODE", "fwd_bwd")
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS", "0") == "1"

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.profiling import render_phases
    from unitygaussiansplatting_tpu.utils.synthetic import (
        outdoor_scene,
        sphere_scene,
        sphere_scene_device,
    )

    if os.environ.get("BENCH_HOST_SCENE") == "1":
        # Bit-compatible with pre-r4 benches; ~260 s slower at 6.1M
        # (host numpy gen + tunnel upload, measured tools/tpu_jobs/474).
        scene = sphere_scene(n=n, seed=0).activate()
        scene = jax.device_put(scene, jax.devices()[0])
    else:
        scene = sphere_scene_device(n=n, seed=0).activate()
    jax.block_until_ready(scene)
    print(f"bench: scene ready at t+{_elapsed():.0f}s", file=sys.stderr)
    camera = Camera.look_at(
        eye=[0.0, 0.6, -3.0],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y_deg=47.0,
        width=width,
        height=height,
    )
    # Pair budget: the synthetic scene demands ~3.85 slots per splat at the
    # default 64x32 tiles (fat shell splats); the outdoor scene ~2.21.
    # 4.0 holds 3.5% headroom across the bench's opacity sweep (measured
    # demand 23.49-23.59M vs 24.4M budget, tools/tpu_jobs/922).
    # chunk_size 256: fwd 422.6 -> 394.2 / fwd+bwd 834.2 -> 772.6 ms at
    # bicycle scale (fewer grid steps in the composite + bwd kernels at
    # unchanged per-pair work; same job).
    # pack_axes_u32: benchmark perf knob (reference keeps axes f32).  One
    # u32 axis payload instead of two: fwd 394.2 -> 372.4 / fwd+bwd 769.6
    # -> 746.2 ms at bicycle scale, image PSNR 62.8 dB vs the f16-axes
    # path — visually identical (tools/tpu_jobs/926).
    config = RasterizeConfig(
        pair_multiplier=float(os.environ.get("BENCH_PAIR_MULT", 4.0)),
        chunk_size=int(os.environ.get("BENCH_CHUNK", 256)),
        pack_axes_u32=True,
        pack_grads_bf16=True,
        # Rotated-frame center quantization: one sort operand instead of
        # two.  Measured fwd 505 -> 456 ms / fwd+bwd 1056 -> 1033 ms
        # (tools/tpu_jobs/457, r3); coarser than the other pack knobs (rare
        # ~1e-2 pixel deltas at discard thresholds).
        pack_center_u32=os.environ.get("BENCH_PACK_CENTER", "1") == "1",
        # One u32 color+opacity sort payload; rgba8-vs-f16 image PSNR
        # measured 63.2 dB (visually identical), fwd 455 -> 444 ms
        # (tools/tpu_jobs/462, r3).
        pack_color_rgba8=os.environ.get("BENCH_RGBA8", "1") == "1",
    )

    def make_fns(cam, cfg):
        @jax.jit
        def frame(g, opacity_scale):
            settings = RenderSettings(sh_order=3, opacity_scale=opacity_scale)
            return render(g, cam, settings, cfg, backend=backend)

        @jax.jit
        def frame_bwd(g, opacity_scale):
            def loss(gg):
                settings = RenderSettings(sh_order=3, opacity_scale=opacity_scale)
                img = render(gg, cam, settings, cfg, backend=backend)
                return jnp.mean(img)

            return jax.grad(loss)(g)

        return frame, frame_bwd

    frame, frame_bwd = make_fns(camera, config)
    fn = frame_bwd if mode == "fwd_bwd" else frame
    print(f"bench: headline measurement starting at t+{_elapsed():.0f}s",
          file=sys.stderr)
    ms_per_frame = time_frames(fn, scene, frames)

    with _RESULT_LOCK:
        _RESULT.update(
            {
                "metric": (
                    f"{'fwd+bwd' if mode == 'fwd_bwd' else 'fwd'} ms/frame, synthetic "
                    f"bicycle-class {n} splats @{width}x{height} SH3 "
                    f"({backend} backend, v5e chip)"
                ),
                "value": round(ms_per_frame, 3),
                "unit": "ms",
                # vs the reference's published *forward-only* 6.8 ms (it has
                # no backward at all, BASELINE.md).
                "vs_baseline": round(REFERENCE_MS / ms_per_frame, 4),
                "headline_done_at_s": round(_elapsed(), 1),
            }
        )
    # The headline is safe the moment it exists: print NOW, grow later.
    _print_result()

    if skip_extras:
        return

    with _RESULT_LOCK:
        extras = _RESULT.setdefault("extra_metrics", [])

    def extra_fwd():
        fwd_ms = time_frames(frame, scene, frames)
        with _RESULT_LOCK:
            extras.append(
                {
                    "metric": "fwd ms/frame, same headline scene",
                    "value": round(fwd_ms, 3),
                    "unit": "ms",
                    "vs_baseline": round(REFERENCE_MS / fwd_ms, 4),
                }
            )

    if mode == "fwd_bwd":
        _run_extra("fwd_headline", 60, extra_fwd)

    def extra_phases():
        # Per-phase forward breakdown + pair counters + HBM roofline on the
        # headline scene (VERDICT r4 #2: bytes-moved and achieved-vs-peak
        # bandwidth per phase; v5e peak 819 GB/s).
        prof = render_phases(scene, camera, RenderSettings(sh_order=3), config)
        with _RESULT_LOCK:
            _RESULT["phases"] = prof["phases_ms"]
            _RESULT["pairs"] = {
                "num_pairs": prof["num_pairs"],
                "budget": prof["pair_budget"],
                "overflow": prof["overflow"],
            }
            _RESULT["roofline"] = prof["roofline"]

        # rgba8 pack-knob guard (ADVICE r3): the headline enables
        # pack_color_rgba8, which hard-saturates shaded rgb at 2.0 — record
        # the measured clip fraction so the knob's validity on this scene is
        # part of the artifact (>~1e-3 clipped_high would flatten highlights
        # and the f16 path should be used instead).
        if config.pack_color_rgba8:
            from unitygaussiansplatting_tpu.utils.quality import (
                rgba8_clip_fraction,
            )

            clip = rgba8_clip_fraction(scene, camera, RenderSettings(sh_order=3))
            with _RESULT_LOCK:
                _RESULT["rgba8_clip"] = {
                    k: (round(float(v), 8) if v == v else None)
                    for k, v in clip.items()
                }

    _run_extra("phases_headline", 90, extra_phases)

    # Realistic-capture-statistics scene (VERDICT r1 item 7): same splat
    # count and resolution, trained-outdoor-scene-like distributions.
    real_cam = Camera.look_at(
        eye=[0.0, 0.4, -5.0],
        target=[0.0, -0.2, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y_deg=47.0,
        width=width,
        height=height,
    )
    real_cfg = RasterizeConfig(
        pair_multiplier=float(os.environ.get("BENCH_REAL_PAIR_MULT", 2.5)),
        chunk_size=int(os.environ.get("BENCH_CHUNK", 256)),
        pack_axes_u32=True,
        pack_grads_bf16=True,
    )

    def extra_outdoor():
        real = outdoor_scene(n=n, seed=1).activate()
        real = jax.device_put(real, jax.devices()[0])
        jax.block_until_ready(real)
        rf, rfb = make_fns(real_cam, real_cfg)
        real_fn = rfb if mode == "fwd_bwd" else rf
        real_ms = time_frames(real_fn, real, max(2, frames // 2))
        rprof = render_phases(real, real_cam, RenderSettings(sh_order=3), real_cfg)
        with _RESULT_LOCK:
            extras.append(
                {
                    "metric": (
                        f"{'fwd+bwd' if mode == 'fwd_bwd' else 'fwd'} ms/frame, "
                        f"outdoor-statistics scene {n} splats @{width}x{height} SH3"
                    ),
                    "value": round(real_ms, 3),
                    "unit": "ms",
                    "vs_baseline": round(REFERENCE_MS / real_ms, 4),
                }
            )
            _RESULT["phases_outdoor"] = rprof["phases_ms"]
            _RESULT["pairs_outdoor"] = {
                "num_pairs": rprof["num_pairs"],
                "budget": rprof["pair_budget"],
                "overflow": rprof["overflow"],
            }

    _run_extra("outdoor_scene", 150, extra_outdoor)

    def extra_viewer():
        # Frame-coherence amortization (VERDICT r4 #7): the reference skips
        # its sort every m_SortNthFrame frames; the fused TPU pipeline's
        # sound analog is exact frame reuse for an idle camera (see
        # models/viewer.py for why stale-order compositing has no TPU
        # analog).  Measures ms/frame with a moving pose (full pipeline)
        # vs an idle pose (cache hit, no chip dispatch).
        from unitygaussiansplatting_tpu.models.viewer import ViewerSession

        sess = ViewerSession(scene, camera, RenderSettings(sh_order=3),
                             config, backend=backend)
        jax.block_until_ready(sess.frame())  # compile + first frame
        # Warm the moving path too, then time like time_frames does
        # (async dispatches, one final block — per-frame blocking adds a
        # full tunnel round-trip per frame and r5's first rehearsal showed
        # a one-off ~60 s first-distinct-view cost that is not frame cost).
        jax.block_until_ready(
            sess.frame(view=jnp.asarray(camera.view).at[0, 3].add(1e-5))
        )
        t0 = time.perf_counter()
        out = None
        for i in range(4):  # moving camera: every frame renders
            v = jnp.asarray(camera.view).at[0, 3].add(1e-4 * (i + 1))
            out = sess.frame(view=v)
        jax.block_until_ready(out)
        moving_ms = (time.perf_counter() - t0) / 4 * 1e3
        jax.block_until_ready(sess.frame())
        t0 = time.perf_counter()
        for _ in range(50):  # idle camera: cache hits, no dispatch
            sess.frame()
        idle_ms = (time.perf_counter() - t0) / 50 * 1e3
        with _RESULT_LOCK:
            _RESULT["viewer_amortization"] = {
                "moving_camera_ms_per_frame": round(moving_ms, 3),
                "idle_camera_ms_per_frame": round(idle_ms, 4),
                "frames_rendered": sess.stats.rendered,
                "frames_reused": sess.stats.reused,
            }

    _run_extra("viewer_amortization", 45, extra_viewer)

    def extra_device_asset():
        # Device-resident compressed rendering (the reference's 1.3 GB-VRAM
        # story, readme.md:83-84): render the headline scene straight from
        # Medium-preset quantized blobs and report the footprint ratio.
        from unitygaussiansplatting_tpu.io.asset import encode_asset
        from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
        from unitygaussiansplatting_tpu.io.device_asset import device_asset_from_asset

        asset = encode_asset(gaussians_to_input_splats(scene))
        da = device_asset_from_asset(asset)
        jax.block_until_ready(da.pos_q)
        da_ms = time_frames(
            jax.jit(
                lambda a, s: render(
                    a, camera, RenderSettings(sh_order=3, opacity_scale=s),
                    config, backend=backend,
                )
            ),
            da,
            max(2, frames // 2),
        )
        float_bytes = sum(
            np.prod(x.shape) * 4
            for x in (scene.means, scene.rotations, scene.scales,
                      scene.opacities, scene.base_color, scene.sh)
        )
        with _RESULT_LOCK:
            _RESULT["device_asset"] = {
                "fwd_ms_from_compressed": round(da_ms, 3),
                "device_bytes": da.device_bytes(),
                "float_bytes": int(float_bytes),
                "compression_on_device": round(float_bytes / da.device_bytes(), 2),
            }

    _run_extra("device_asset", 150, extra_device_asset)

    def extra_imported():
        # Imported-scene metric (VERDICT r2 #5): a procedurally-authored
        # capture-realistic scene through the FULL import pipeline — PLY
        # bytes on disk -> creator (Morton reorder, chunk stats, Medium
        # quantization) -> DeviceAsset -> render.  Nothing shortcuts the
        # path the reference's headline scene takes (readme.md:79-81).
        import tempfile

        from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
        from unitygaussiansplatting_tpu.io.creator import create_asset
        from unitygaussiansplatting_tpu.io.device_asset import device_asset_from_asset
        from unitygaussiansplatting_tpu.io.ply import write_ply
        from unitygaussiansplatting_tpu.utils.synthetic import captured_scene

        n_imp = int(os.environ.get("BENCH_IMPORT_N", 2_000_000))
        cap_splats = gaussians_to_input_splats(captured_scene(n=n_imp, seed=3).activate())
        with tempfile.TemporaryDirectory() as td:
            ply_path = os.path.join(td, "captured.ply")
            write_ply(ply_path, cap_splats)
            imp_asset = create_asset(ply_path, quality="medium", import_cameras=False)
        imp_da = device_asset_from_asset(imp_asset)
        jax.block_until_ready(imp_da.pos_q)
        imp_cam = Camera.look_at(
            eye=[6.5, 2.2, -8.0],
            target=[0.0, 0.3, 0.0],
            up=[0.0, 1.0, 0.0],
            fov_y_deg=47.0,
            width=width,
            height=height,
        )
        imp_cfg = RasterizeConfig(
            pair_multiplier=float(os.environ.get("BENCH_IMPORT_PAIR_MULT", 3.0)),
            chunk_size=int(os.environ.get("BENCH_CHUNK", 256)),
            pack_axes_u32=True,
            pack_grads_bf16=True,
        )
        imp_ms = time_frames(
            jax.jit(
                lambda a, s: render(
                    a, imp_cam, RenderSettings(sh_order=3, opacity_scale=s),
                    imp_cfg, backend=backend,
                )
            ),
            imp_da,
            max(2, frames // 2),
        )
        iprof = render_phases(imp_da, imp_cam, RenderSettings(sh_order=3), imp_cfg)
        with _RESULT_LOCK:
            _RESULT["imported_scene"] = {
                "metric": (
                    f"fwd ms/frame, imported capture-like scene {n_imp} splats "
                    f"@{width}x{height} SH3, Medium asset via PLY->creator->DeviceAsset"
                ),
                "value": round(imp_ms, 3),
                "unit": "ms",
                "vs_baseline": round(REFERENCE_MS / imp_ms, 4),
                "asset_bytes": imp_asset.total_bytes(),
                "pairs": {
                    "num_pairs": iprof["num_pairs"],
                    "budget": iprof["pair_budget"],
                    "overflow": iprof["overflow"],
                },
            }

    _run_extra("imported_scene", 240, extra_imported)

    with _RESULT_LOCK:
        _RESULT["total_bench_s"] = round(_elapsed(), 1)
    _print_result()


if __name__ == "__main__":
    main()
