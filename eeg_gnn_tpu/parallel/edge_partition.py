"""Edge-partitioned distributed SpMM over a device mesh.

The scale-out strategy for batched block-diagonal clip graphs (and any
larger EEG montage graph): partition the edge list across the mesh's
``graph`` axis, shard node features by node block, and compute

    out = A @ X

as p ring steps: each device processes the edges whose *source* nodes live
in the feature block it currently holds, accumulates partial row sums, and
passes the block to its neighbor via ``ppermute`` — so boundary-feature
exchange rides the ICI ring and overlaps with local aggregation. A final
``psum_scatter`` reduces partial rows onto their owners.

This is greenfield relative to the reference (which has no distributed
support, SURVEY.md §2.7); it generalizes the framework beyond 19-node clip
graphs to arbitrary sparse adjacencies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eeg_gnn_tpu.graphs.sparse import SparseGraph


def _ring_spmm_local(rows, cols, vals, x_block, *, num_nodes: int,
                     axis_name: str):
    """Per-device body: rows/cols/vals are this device's edge shard,
    x_block its (N/p, D) feature block. Returns its (N/p, D) output block."""
    p = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    blk = num_nodes // p
    d = x_block.shape[-1]

    def step(s, carry):
        x_blk, out = carry
        owner = jax.lax.rem(me - s + p, p)  # block id currently held
        in_block = (cols // blk) == owner
        local_idx = jnp.clip(cols - owner * blk, 0, blk - 1)
        gathered = jnp.where(
            in_block[:, None], x_blk[local_idx] * vals[:, None], 0.0)
        # scatter-add partials for ALL destination rows (reduced later)
        out = out.at[rows].add(gathered)
        x_blk = jax.lax.ppermute(
            x_blk, axis_name, [(i, (i + 1) % p) for i in range(p)])
        return x_blk, out

    out0 = jnp.zeros((num_nodes, d), x_block.dtype)
    # mark the accumulator device-varying so the loop carry types match
    # (shard_map tracks per-value device variance)
    out0 = jax.lax.pcast(out0, axis_name, to="varying")
    _, partial = jax.lax.fori_loop(0, p, step, (x_block, out0))
    # reduce partial row sums across devices, each keeps its own row block
    return jax.lax.psum_scatter(partial, axis_name, scatter_dimension=0,
                                tiled=True)


def edge_partitioned_spmm(mesh: Mesh, graph: SparseGraph, x,
                          axis_name: str = "graph"):
    """Distributed A @ X.

    Args:
        mesh: mesh with an ``axis_name`` axis of size p; p must divide both
            the padded edge count and the node count.
        graph: SparseGraph over ``num_nodes`` (edge arrays get sharded).
        x: (num_nodes, D) node features (gets node-sharded).

    Returns:
        (num_nodes, D) result, node-sharded over ``axis_name``.
    """
    shard_map = jax.shard_map

    n = graph.num_nodes
    body = functools.partial(_ring_spmm_local, num_nodes=n,
                             axis_name=axis_name)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    return fn(graph.rows, graph.cols, graph.values, x)


def place_edge_partitioned(mesh: Mesh, graph: SparseGraph, x,
                           axis_name: str = "graph"):
    """Shard the graph + features for :func:`edge_partitioned_spmm`."""
    e_spec = NamedSharding(mesh, P(axis_name))
    n_spec = NamedSharding(mesh, P(axis_name, None))
    return (
        SparseGraph(
            jax.device_put(graph.rows, e_spec),
            jax.device_put(graph.cols, e_spec),
            jax.device_put(graph.values, e_spec),
            graph.num_nodes,
        ),
        jax.device_put(x, n_spec),
    )
