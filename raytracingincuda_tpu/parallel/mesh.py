"""Device mesh + sharding helpers.

The reference is single-GPU (``cudaSetDevice(0)``, main.cu:81); scale-out is
a new, TPU-native capability (SURVEY.md §2.4): pixels (and sample groups)
are data-parallel axes sharded over a ``jax.sharding.Mesh``; the scene is
tiny and replicated; gradients of replicated scene parameters are
all-reduced over ICI by XLA/GSPMD automatically.

Mesh axes:
  'dp' — pixel-tile data parallel (the CUDA grid analog)
  'sp' — sample-group parallel (used when pixels alone can't fill the mesh)

Multi-host: call :func:`maybe_initialize_distributed` first; meshes built
from ``jax.devices()`` then span all hosts and GSPMD collectives ride
ICI/DCN as laid out by the runtime.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched under a multi-host runtime.

    No-op on single host. Controlled by standard cluster env vars
    (JAX_COORDINATOR_ADDRESS etc.); surfacing init failure fast is the
    failure-detection policy (SURVEY.md §5).

    The already-initialized guard must NOT call jax.process_count():
    that initializes the XLA backend, after which
    jax.distributed.initialize() refuses to run ("must be called before
    any JAX calls") — i.e. the guard itself would break every
    multi-host launch. Inspect the distributed client state instead.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # noqa: BLE001 — private API moved; let init decide
        already = False
    if already:
        return
    # Manual (env-driven) cluster spec, the torch `env://` analog: when the
    # launcher exports the process layout explicitly, pass it through —
    # jax's bare initialize() only auto-detects managed clusters (SLURM,
    # OpenMPI, cloud TPU metadata), not hand-rolled localhost pods
    # (benchmarks/multihost_probe.py launches exactly this way).
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()


def make_mesh(
    n_devices: int = 0,
    axis_names: Sequence[str] = ("dp",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D (or factored) mesh over the first ``n_devices`` devices.

    n_devices=0 uses all. For 2-D ('dp', 'sp') meshes the device count is
    factored as evenly as possible, favoring 'dp'.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        sp = _largest_factor_leq(n, int(np.sqrt(n)))
        shape = (n // sp, sp)
    else:
        raise ValueError("at most 2 mesh axes supported ('dp', 'sp')")
    return Mesh(np.array(devs).reshape(shape), axis_names)


def _largest_factor_leq(n: int, k: int) -> int:
    for f in range(max(k, 1), 0, -1):
        if n % f == 0:
            return f
    return 1


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the (chunk, ray) id grid: rays within a chunk sharded
    over every mesh axis (chunks are scanned sequentially)."""
    return NamedSharding(mesh, P(None, mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
