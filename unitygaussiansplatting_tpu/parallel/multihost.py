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

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import SPLAT_AXIS, splat_sharding


def _cluster_env_detected() -> bool:
    """Best-effort public sniff for 'this process is part of a >1-host job'.

    Only consulted to pick between 'documented single-process no-op' and
    'loud error' when :func:`initialize` is called after the backend came
    up — on a healthy cluster run initialize() executes first and this is
    never reached.  Checks the launcher env vars JAX's own cluster
    auto-detect keys off, without importing private modules.
    """
    env = os.environ

    def _num(name: str) -> int:
        try:
            return int(env.get(name, "") or 0)
        except ValueError:
            return 0

    if _num("SLURM_NTASKS") > 1 or _num("OMPI_COMM_WORLD_SIZE") > 1:
        return True
    if _num("NPROC") > 1 and env.get("COORDINATOR_ADDRESS"):
        return True
    for var in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
        if env.get(var):
            return True
    return False


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
    - on a real cluster — explicit args given, or the launcher environment
      detected — calling *after* the backend initialized raises instead of
      silently stranding every host in its own single-process world.

    Uses only public JAX API (``jax.distributed.is_initialized`` /
    ``initialize``): a late call is recognized by the RuntimeError
    jax.distributed raises once the XLA backend exists, and classified via
    :func:`_cluster_env_detected`.  Validated by the real 2-process CPU
    integration test (tests/test_multiprocess.py).
    """
    if jax.distributed.is_initialized():
        return  # idempotent call
    explicit = coordinator_address is not None or (num_processes or 0) > 1
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
    except RuntimeError as e:
        # jax.distributed raises RuntimeError when the XLA backend already
        # initialized (too late to go distributed).
        if explicit or _cluster_env_detected():
            raise RuntimeError(
                "multihost.initialize() on a cluster must run before any "
                "JAX computation (including jax.devices()) — move it to "
                "process start"
            ) from e
        # Single process, backend already up: nothing to do.


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
