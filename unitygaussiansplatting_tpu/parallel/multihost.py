"""Multi-host (multi-process) deployment: init, pod meshes, sharded loading.

The reference is strictly single-GPU with a hard 8.6M-splat cap from its 2 GB
buffer limit (GaussianSplatAsset.cs:16, SURVEY.md §5 "scaling N splats"); the
TPU build removes the cap by sharding splats over a pod slice, and this
module is the process-level plumbing that makes the same code run on N hosts:

- :func:`initialize` — one call per process before any jax op, wrapping
  ``jax.distributed.initialize`` (the JAX runtime then exposes every chip in
  the slice through ``jax.devices()`` and wires DCN for cross-host
  collectives).  On single-process setups it is a documented no-op, so
  examples/tests run unchanged.
- :func:`make_pod_mesh` — the renderer's 1-D ``"splats"`` mesh laid out
  **ICI-innermost**: devices of one host are adjacent along the axis, hosts
  concatenate after.  Neighbor-heavy collectives (the tile-strip
  ``all_to_all`` of parallel/exchange.py, reduce_scatter of gradients) then
  ride intra-host ICI wherever possible and cross DCN only at host
  boundaries — the "pick a mesh so collectives ride ICI, not DCN" recipe.
- :func:`process_splat_slice` / :func:`global_gaussians_from_local` — each
  host reads only its contiguous slice of the asset from disk and the
  slices are assembled into one globally-sharded array without any host
  ever materializing the full scene (the 30M+-splat configs exceed a single
  host's RAM by design).

Single-process behavior is exactly the round-1 path (`mesh.make_mesh`), so
every helper here is testable on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import SPLAT_AXIS, splat_sharding


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Start the multi-process JAX runtime (no-op if single-process).

    Call once per host process, **before the first jax operation** (even
    ``jax.devices()`` / ``jax.process_count()`` initialize the local backend,
    after which distributed init is impossible).  With no arguments,
    jax.distributed auto-detects the cluster from the TPU pod environment
    (hostnames/metadata); pass explicit values for manual clusters.
    Guarantees:

    - idempotent (a second call is a no-op);
    - a plain single-process run (no cluster env, no explicit args) is a
      documented no-op, even if jax was already touched;
    - on a real cluster — explicit args given, or the pod environment
      detected — calling *after* the backend initialized raises instead of
      silently stranding every host in its own single-process world.
    """
    from jax._src import clusters as _clusters
    from jax._src import distributed as _distributed
    from jax._src import xla_bridge as _xla_bridge

    if getattr(_distributed.global_state, "client", None) is not None:
        return  # distributed system already initialized (idempotent call)
    explicit = coordinator_address is not None or (num_processes or 0) > 1
    if _xla_bridge.backends_are_initialized():
        detected = False
        if not explicit:
            try:
                addr, nproc, _, _ = (
                    _clusters.ClusterEnv.auto_detect_unset_distributed_params(
                        None, None, None, None, None, None
                    )
                )
                detected = addr is not None and (nproc or 0) > 1
            except Exception:
                detected = False
        if explicit or detected:
            raise RuntimeError(
                "multihost.initialize() on a cluster must run before any "
                "JAX computation (including jax.devices()) — move it to "
                "process start"
            )
        return  # single process, backend already up: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # Cluster auto-detection found nothing and no explicit coordinator
        # was given: a plain single-process run.
        if explicit:
            raise


def make_pod_mesh(devices=None) -> Mesh:
    """1-D ``"splats"`` mesh over the full slice, ICI-innermost.

    ``jax.devices()`` orders a pod slice by (process, local device); keeping
    that order means positions ``[i*L, (i+1)*L)`` of the mesh axis are the
    L chips of host i, so a ``psum``/``all_gather`` segment within a host
    never leaves ICI, and ``ppermute`` neighbor shifts cross DCN only once
    per host boundary.  (A hybrid 2-D (dcn, ici) factorization is
    deliberately NOT used: the renderer's collectives are all along one
    logical axis — splats/tiles — and GSPMD already decomposes a 1-D
    collective into the ICI+DCN hierarchy when the axis spans hosts.)
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    # Assert the (process, local) ordering this layout relies on.
    pids = [getattr(d, "process_index", 0) for d in devices]
    if pids != sorted(pids):
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (SPLAT_AXIS,))


def process_splat_slice(n_total: int, mesh: Mesh) -> tuple[int, int]:
    """[start, stop) of the splat rows THIS process's devices own.

    ``n_total`` must be divisible by the mesh size (pad with
    ``utils.pad_to_multiple`` at import time).  With the ICI-innermost mesh
    the per-process rows are one contiguous range, so a host can read just
    its byte range of the position/SH blobs.
    """
    d = mesh.shape[SPLAT_AXIS]
    if n_total % d:
        raise ValueError(f"n_total={n_total} not divisible by mesh size {d}")
    per_dev = n_total // d
    axis_devs = list(mesh.devices.ravel())
    mine = [i for i, dev in enumerate(axis_devs)
            if getattr(dev, "process_index", 0) == jax.process_index()]
    if not mine:
        return (0, 0)
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError(
            "process's devices are not contiguous on the mesh axis; "
            "use make_pod_mesh() ordering"
        )
    return (mine[0] * per_dev, (mine[-1] + 1) * per_dev)


def global_gaussians_from_local(local, mesh: Mesh, n_total: int):
    """Assemble a splat-sharded global pytree from per-process slices.

    ``local`` holds this process's rows (shape ``(stop - start, ...)`` per
    leaf, from :func:`process_splat_slice`); returns a pytree of global
    jax.Arrays of leading dim ``n_total`` sharded along the splat axis.  No
    host materializes the full scene — the multi-host analog of
    ``mesh.shard_gaussians`` (which device_puts full host arrays and only
    suits single-host runs).
    """
    sharding = splat_sharding(mesh)

    def leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, (n_total,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(leaf, local)
