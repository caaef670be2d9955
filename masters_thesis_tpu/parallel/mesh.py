"""Device-mesh bootstrap.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7): it picks
one GPU by parsing nvidia-smi (nv_monitor.py, check_mem.py) and has no
communication backend at all. The TPU-native equivalent is an SPMD mesh:

  axes = ('data', 'model')
    data  — batch sharding (pure DP)
    model — brain-region / vocab sharding (the 327k-voxel input axis is the
            natural "long" dimension of this workload; SURVEY.md §5)

XLA inserts all collectives; there is no hand-written comm layer.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 0, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data=0 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data <= 0:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def maybe_distributed_init() -> None:
    """Multi-host bootstrap (jax.distributed). No-op on a single host.

    Opt-in via env: ``JAX_COORDINATOR_ADDRESS`` (host:port) plus, when the
    launcher is not a recognised cluster (TPU pod / SLURM / MPI auto-detect),
    explicit ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``. On the CPU backend
    cross-process collectives need the Gloo transport
    (jax_cpu_collectives_implementation) — selected here before the backend
    initialises. Exercised for real by parallel/multiprocess.py (round 4):
    N OS processes, per-host input via global_batch_from_host_local,
    trajectory-matched against the single-process run.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    # idempotent: run_training calls this too, so a launcher that already
    # initialised (parallel/multiprocess children) must not re-initialise
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax: probe the global client state
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        # only affects the CPU client; harmless on TPU backends
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jax: flag absent; initialize() may still work
        pass
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()
