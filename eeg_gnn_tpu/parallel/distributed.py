"""Multi-host runtime initialization and per-process data sharding.

The reference has no distributed support (SURVEY.md §2.7). Here multi-host
training uses the standard JAX runtime: every host process calls
:func:`initialize` before touching devices; the global mesh then spans all
hosts' chips, XLA collectives ride ICI within a slice and DCN across
slices; each process's data loader materializes only its
:func:`process_batch_slice` of every global batch (the loaders' seeded
shuffles are identical across processes, so slicing the same global index
order is a true partition); and :func:`form_global_array` assembles the
per-process host shards into one global jax.Array without any host
gather.

Wired end-to-end in ``cli/train.py`` (initialize + sharded loaders) and
``train/trainer.py`` (global batch formation, cross-process eval gather).
Tested by ``tests/test_multiprocess.py`` with two real ``jax.distributed``
processes on localhost (CPU collectives ride Gloo).
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
    """(start, size) of this process's slice of a globally-sharded batch.

    Row layout matches ``jax.make_array_from_process_local_data`` over a
    mesh whose devices are ordered by process: process p owns global rows
    [p*size : (p+1)*size].
    """
    import jax

    per = global_batch_size // jax.process_count()
    return jax.process_index() * per, per


def process_shard() -> Optional[tuple]:
    """(rank, count) for the data loaders, or None when single-process."""
    import jax

    if jax.process_count() == 1:
        return None
    return jax.process_index(), jax.process_count()


def form_global_array(local, sharding):
    """Assemble this process's host-local numpy rows into a global jax.Array
    sharded per ``sharding`` (single-process: plain device_put)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def global_put(full, sharding, axis: int):
    """Place a host array that is IDENTICAL on every process as a global
    jax.Array sharded along ``axis``: single-process is a plain
    device_put; multi-host each process contributes only its slice of the
    axis (the epoch plans are derived from the same seeded rng
    everywhere, so slicing the same array is a true partition)."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(full, sharding)
    full = np.asarray(full)
    per = full.shape[axis] // jax.process_count()
    lo = jax.process_index() * per
    idx = [slice(None)] * full.ndim
    idx[axis] = slice(lo, lo + per)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(full[tuple(idx)]))


def all_gather_host(x):
    """Gather a per-process host array's rows across processes; returns the
    concatenated numpy array (identical on every process). No-op for a
    single process."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))\
        .reshape((-1,) + np.asarray(x).shape[1:])
