"""Multi-process/multi-host initialization (SURVEY.md §5 comm-backend
row: ``jax.distributed`` + GSPMD is the TPU-native replacement for the
reference's in-graph towers; gradient all-reduce lowers to XLA AllReduce
over ICI within a slice / DCN across slices).

Single-process usage needs nothing; on a multi-host TPU slice call
:func:`initialize` once per process before any jax computation.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (idempotent; no-op single-process).

    With no arguments, relies on the TPU environment's automatic
    discovery (the standard path on Cloud TPU VMs).  Explicit arguments
    support manual clusters.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None
    auto_env = any(v in os.environ for v in (
        "TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not auto_env:
        return  # single process
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        _initialized = True
    except (RuntimeError, ValueError):
        # already initialized by the runtime, or single-host TPU
        _initialized = True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
