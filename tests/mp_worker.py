"""Worker process for the REAL 2-process multihost integration test.

Launched by tests/test_multiprocess.py as ``python mp_worker.py <port>
<process_id> <num_processes>`` in a clean environment (no axon site, CPU
platform, 4 virtual devices per process).  Drives the full multi-process
path the virtual-mesh tests cannot reach — ``jax.distributed`` coordinator
handshake, gloo cross-process collectives, per-process slice loading —
and prints one JSON result line the parent compares across ranks and
against a single-process run.

Not a pytest file (no ``test_`` prefix): executed as a script only.
"""

import json
import os
import sys


def main() -> None:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    # 4 virtual CPU devices per process -> 8 global on 2 processes (matches
    # the single-process 8-device mesh the parent compares against).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from unitygaussiansplatting_tpu.parallel import multihost

    # The real thing: coordinator handshake BEFORE any backend touch.
    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.parallel.multihost import (
        global_gaussians_from_local,
        make_pod_mesh,
        process_splat_slice,
    )
    from unitygaussiansplatting_tpu.parallel.render_sharded import (
        render_sharded_fn,
        train_step_sharded_fn,
    )
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    mesh = make_pod_mesh()
    assert mesh.devices.size == 8, mesh.devices.shape

    n = 512
    # Deterministic scene generation stands in for the asset file: each
    # process keeps ONLY its slice (the per-host blob byte-range read of
    # multihost.process_splat_slice's docstring).
    full = sphere_scene(n=n, seed=7)
    start, stop = process_splat_slice(n, mesh)
    assert stop - start == n // nproc, (start, stop)
    local = jax.tree_util.tree_map(lambda x: x[start:stop], full)
    raw = global_gaussians_from_local(local, mesh, n)

    camera = Camera.look_at(
        eye=[0.0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=128, height=64,
    )
    config = RasterizeConfig(tile_h=8, chunk_size=32, max_pairs_per_tile=1024)
    settings = RenderSettings(sh_order=1)

    # One sharded render (splat-shard -> all-gather -> tile composite).
    img = render_sharded_fn(mesh, camera, settings=settings, config=config)(
        raw.activate()
    )
    img_sum = float(jnp.sum(img))

    # Two sharded train steps (fwd + bwd + SGD with cross-process grads).
    target = jnp.full((camera.height, camera.width, 4), 0.1, jnp.float32)
    step = train_step_sharded_fn(
        mesh, camera, settings=settings, config=config, lr=5e-3
    )
    loss0, raw1 = step(raw, target)
    loss1, raw2 = step(raw1, target)
    checksum = float(
        jax.jit(
            lambda r: jnp.sum(jnp.square(r.means))
            + jnp.sum(jnp.square(r.log_scales))
            + jnp.sum(jnp.square(r.opacity_logits)),
        )(raw2)
    )
    print(
        "MPRESULT "
        + json.dumps(
            {
                "pid": pid,
                "img_sum": img_sum,
                "loss0": float(loss0),
                "loss1": float(loss1),
                "checksum": checksum,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
