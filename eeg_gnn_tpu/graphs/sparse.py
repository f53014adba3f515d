"""Sparse adjacency store and block-diagonal batched clip graphs.

The reference's "sparse" graphs are dense 19x19 matrices whose values are
top-k-zeroed (SURVEY.md §2.2). For TPU scale-out the natural structure is
one *block-diagonal* sparse matrix over a whole batch of clips: B clips of
N nodes become a (B*N, B*N) graph with no cross-clip edges. This module
provides:

- ``SparseGraph``: padded-COO adjacency (static shapes, jit-friendly) with
  ``from_dense_batch`` / ``to_dense`` converters;
- ``spmm``: edge-gather/segment-sum sparse matmul (XLA path; the Pallas
  kernel in ``ops/pallas_kernels.py`` is the fused alternative);
- per-edge normalizations mirroring ``graphs/supports.py`` so random-walk
  supports can be built without densifying.

Edges are padded to a static count with zero-valued self-loops on node 0 so
batch-to-batch edge-count variation never recompiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SparseGraph:
    """Padded COO sparse matrix of shape (num_nodes, num_nodes)."""

    rows: jnp.ndarray     # (E,) int32 destination node per edge
    cols: jnp.ndarray     # (E,) int32 source node per edge
    values: jnp.ndarray   # (E,) float edge weights (0 for padding)
    num_nodes: int        # static

    def to_dense(self):
        dense = jnp.zeros((self.num_nodes, self.num_nodes), self.values.dtype)
        return dense.at[self.rows, self.cols].add(self.values)

    def transpose(self) -> "SparseGraph":
        return SparseGraph(self.cols, self.rows, self.values, self.num_nodes)


jax.tree_util.register_dataclass(
    SparseGraph, data_fields=["rows", "cols", "values"],
    meta_fields=["num_nodes"])


def from_dense_batch(adj_batch, max_edges_per_clip: int | None = None) -> SparseGraph:
    """Batched (B, N, N) dense adjacencies -> one block-diagonal SparseGraph.

    Every clip contributes the same static number of edge slots
    (``max_edges_per_clip``, default N*N) so the result is jit-friendly;
    absent edges carry value 0. Works under jit (no host sync).
    """
    b, n, _ = adj_batch.shape
    e_clip = n * n if max_edges_per_clip is None else max_edges_per_clip

    if e_clip == n * n:
        # dense enumeration: all (i, j) slots per clip
        i = jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
        base = (jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 0) * n)
        rows = (base + i).reshape(-1)
        cols = (base + j).reshape(-1)
        vals = jnp.asarray(adj_batch).reshape(-1)
    else:
        # top-|e_clip| magnitude edges per clip (for sparsified graphs)
        flat = jnp.asarray(adj_batch).reshape(b, -1)
        vals, idx = jax.lax.top_k(jnp.abs(flat), e_clip)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        i = idx // n
        j = idx % n
        base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
        rows = (base + i.astype(jnp.int32)).reshape(-1)
        cols = (base + j.astype(jnp.int32)).reshape(-1)
        vals = vals.reshape(-1)

    return SparseGraph(rows, cols, vals, b * n)


def spmm(graph: SparseGraph, x):
    """Sparse @ dense: (num_nodes, num_nodes) x (num_nodes, D) -> (num_nodes, D).

    Edge-parallel gather + segment-sum — the canonical XLA lowering; rows
    must aggregate over in-edges, matching dense ``A @ X`` semantics.
    """
    gathered = x[graph.cols] * graph.values[:, None]
    return jax.ops.segment_sum(gathered, graph.rows,
                               num_segments=graph.num_nodes)


def row_normalize(graph: SparseGraph) -> SparseGraph:
    """D^-1 A on the sparse store (random-walk transition matrix)."""
    deg = jax.ops.segment_sum(graph.values, graph.rows,
                              num_segments=graph.num_nodes)
    inv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
    return SparseGraph(graph.rows, graph.cols,
                       graph.values * inv[graph.rows], graph.num_nodes)


def dual_random_walk_sparse(graph: SparseGraph):
    """[(D^-1 A)^T, (D_in^-1 A^T)^T] as SparseGraphs — matches
    ``compute_supports(.., 'dual_random_walk')`` numerically."""
    fwd = row_normalize(graph).transpose()
    bwd = row_normalize(graph.transpose()).transpose()
    return fwd, bwd


def batch_supports_to_sparse(adj_batch, filter_type: str):
    """Batched dense adjacency -> list of block-diagonal sparse supports.

    Random-walk families only (the laplacian path needs an eigensolve and
    stays dense; it is used with the *shared* distance graph where dense is
    optimal anyway).
    """
    g = from_dense_batch(adj_batch)
    if filter_type == "random_walk":
        return [row_normalize(g).transpose()]
    if filter_type == "dual_random_walk":
        return list(dual_random_walk_sparse(g))
    raise ValueError(f"sparse supports not defined for {filter_type}")


def edges_per_second(num_edges: int, feat_dim: int, seconds: float) -> float:
    """North-star metric helper: effective edges/s for an SpMM of E edges
    by D features (each edge-feature pair is one multiply-add)."""
    return num_edges * feat_dim / seconds
