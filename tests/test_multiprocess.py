"""REAL multi-process integration test (VERDICT r3 item 3).

Spawns two actual OS processes that form a 2-process JAX cluster over a
localhost coordinator (gloo CPU collectives, 4 virtual devices each) and
drive the full multihost path: ``multihost.initialize`` ->
``make_pod_mesh`` -> ``process_splat_slice`` ->
``global_gaussians_from_local`` -> sharded render + two sharded train
steps.  Asserts both ranks agree and that the result matches the same
computation on a single-process 8-device mesh — the coordinator/DCN-path
coverage the virtual-mesh tests in test_parallel.py cannot provide.

Auto-skips when the platform cannot spawn the cluster (no subprocesses,
port clash, gloo unavailable) rather than failing the suite.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.parallel.mesh import make_mesh, shard_gaussians
from unitygaussiansplatting_tpu.parallel.render_sharded import (
    render_sharded_fn,
    train_step_sharded_fn,
)
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")

CONFIG = RasterizeConfig(tile_h=8, chunk_size=32, max_pairs_per_tile=1024)
SETTINGS = RenderSettings(sh_order=1)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_cluster(nproc: int = 2, timeout_s: float = 420.0):
    """Run the worker script on ``nproc`` ranks; return their result dicts."""
    port = _free_port()
    # Clean child env: repo on path, NO axon site (its sitecustomize would
    # claim the TPU tunnel), CPU platform pinned.
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": _REPO,
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), str(nproc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=_REPO,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process cluster timed out on this platform")
    results = []
    for rc, out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        if rc != 0 or not lines:
            tail = "\n".join(out.splitlines()[-15:])
            if "gloo" in out.lower() and "unavailable" in out.lower():
                pytest.skip(f"gloo collectives unavailable: {tail}")
            raise AssertionError(f"worker failed rc={rc}:\n{tail}")
        results.append(json.loads(lines[-1][len("MPRESULT "):]))
    return results


def test_two_process_cluster_matches_single_process():
    results = _spawn_cluster()
    assert len(results) == 2
    r0, r1 = sorted(results, key=lambda r: r["pid"])

    # Both ranks computed identical replicated outputs.
    for key in ("img_sum", "loss0", "loss1", "checksum"):
        np.testing.assert_allclose(r0[key], r1[key], rtol=1e-6, err_msg=key)

    # Single-process reference on the same 8-device (virtual) mesh.
    camera = Camera.look_at(
        eye=[0.0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=128, height=64,
    )
    raw = sphere_scene(n=512, seed=7)
    mesh = make_mesh(jax.devices()[:8])
    raw_sharded = shard_gaussians(raw, mesh)
    img = render_sharded_fn(mesh, camera, settings=SETTINGS, config=CONFIG)(
        raw_sharded.activate()
    )
    np.testing.assert_allclose(r0["img_sum"], float(jnp.sum(img)), rtol=2e-4)

    target = jnp.full((camera.height, camera.width, 4), 0.1, jnp.float32)
    step = train_step_sharded_fn(
        mesh, camera, settings=SETTINGS, config=CONFIG, lr=5e-3
    )
    loss0, raw1 = step(raw_sharded, target)
    loss1, raw2 = step(raw1, target)
    checksum = float(
        jnp.sum(jnp.square(raw2.means))
        + jnp.sum(jnp.square(raw2.log_scales))
        + jnp.sum(jnp.square(raw2.opacity_logits))
    )
    np.testing.assert_allclose(r0["loss0"], float(loss0), rtol=2e-4)
    np.testing.assert_allclose(r0["loss1"], float(loss1), rtol=2e-4)
    np.testing.assert_allclose(r0["checksum"], checksum, rtol=2e-4)


def test_initialize_is_singleprocess_noop_after_backend():
    """The documented no-op path: backend already up, no cluster env."""
    from unitygaussiansplatting_tpu.parallel import multihost

    jax.devices()  # backend definitely initialized
    multihost.initialize()  # must not raise

    # Explicit args after backend init must raise loudly instead of
    # stranding ranks in their own single-process worlds.
    if not jax.distributed.is_initialized():
        with pytest.raises(RuntimeError, match="before any"):
            multihost.initialize(
                coordinator_address="localhost:1", num_processes=2, process_id=0
            )
