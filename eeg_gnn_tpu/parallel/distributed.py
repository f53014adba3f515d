"""Multi-host runtime initialization.

The reference has no distributed support (SURVEY.md §2.7). Here multi-host
training uses the standard JAX runtime: every host process calls
:func:`initialize` before touching devices; the global mesh then spans all
hosts' chips, XLA collectives ride ICI within a slice and DCN across
slices, and the data pipeline shards per-process via
:func:`process_batch_slice`.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize the multi-host JAX runtime (no-op for single process).

    Reads the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) when args are omitted; on
    Cloud TPU pods ``jax.distributed.initialize()`` auto-detects everything.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_batch_slice(global_batch_size: int):
    """(start, size) of this process's slice of a globally-sharded batch."""
    import jax

    per = global_batch_size // jax.process_count()
    return jax.process_index() * per, per
