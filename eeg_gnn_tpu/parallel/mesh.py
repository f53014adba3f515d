"""Device mesh construction and sharding helpers.

The reference is single-process single-device (SURVEY.md §2.7); everything
here is greenfield TPU design:

- ``data`` axis: batch (clip) data parallelism — the natural first axis for
  this model family (tiny params, large batch).
- ``graph`` axis (optional): edge/node partitioning of the block-diagonal
  batched clip graphs via ``shard_map`` (see ``parallel/edge_partition.py``).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the mesh spans all processes' addressable devices; collectives compile to
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str, num_devices: Optional[int] = None):
    """Parse "data:-1" / "data:4,graph:2" into (names, sizes); -1 infers."""
    names, sizes = [], []
    for part in spec.split(","):
        name, size = part.split(":")
        names.append(name.strip())
        sizes.append(int(size))
    n = num_devices if num_devices is not None else len(jax.devices())
    if any(s == -1 for s in sizes):
        known = int(np.prod([s for s in sizes if s != -1]))
        missing = n // known
        sizes = [missing if s == -1 else s for s in sizes]
    return tuple(names), tuple(sizes)


def make_mesh(spec: str = "data:-1", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    names, sizes = parse_mesh_shape(spec, len(devices))
    total = int(np.prod(sizes))
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                   mesh_axis: str = "data") -> NamedSharding:
    """Shard dimension ``batch_axis`` over the mesh's data axis."""
    spec = [None] * ndim
    spec[batch_axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
