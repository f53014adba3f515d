"""Sparse block-diagonal graphs + edge-partitioned distributed SpMM tests
(virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.graphs.sparse import (
    SparseGraph,
    batch_supports_to_sparse,
    from_dense_batch,
    row_normalize,
    spmm,
)
from eeg_gnn_tpu.graphs import compute_supports
from eeg_gnn_tpu.parallel.edge_partition import (
    edge_partitioned_spmm,
    place_edge_partitioned,
)
from eeg_gnn_tpu.parallel.mesh import make_mesh


def _rand_adj_batch(rng, b=4, n=19):
    a = np.abs(rng.rand(b, n, n)).astype(np.float32)
    for m in a:
        np.fill_diagonal(m, 1.0)
    return a


def test_from_dense_batch_roundtrip(rng):
    adj = _rand_adj_batch(rng)
    g = from_dense_batch(jnp.asarray(adj))
    dense = np.array(g.to_dense())
    # block diagonal: each clip's block matches, off-blocks zero
    for b in range(4):
        np.testing.assert_allclose(dense[b * 19:(b + 1) * 19,
                                         b * 19:(b + 1) * 19], adj[b])
    dense[np.kron(np.eye(4, dtype=bool), np.ones((19, 19), bool))] = 0
    assert np.abs(dense).max() == 0


def test_spmm_matches_dense(rng):
    adj = _rand_adj_batch(rng)
    g = from_dense_batch(jnp.asarray(adj))
    x = rng.randn(4 * 19, 8).astype(np.float32)
    ours = np.asarray(spmm(g, jnp.asarray(x)))
    ref = np.asarray(g.to_dense()) @ x
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_sparse_dual_random_walk_matches_host_supports(rng):
    adj = _rand_adj_batch(rng)
    sups = batch_supports_to_sparse(jnp.asarray(adj), "dual_random_walk")
    for s_idx in range(2):
        dense = np.asarray(sups[s_idx].to_dense())
        for b in range(4):
            host = compute_supports(adj[b], "dual_random_walk")[s_idx]
            np.testing.assert_allclose(
                dense[b * 19:(b + 1) * 19, b * 19:(b + 1) * 19], host,
                rtol=1e-5, atol=1e-6)


def test_topk_padded_sparsification(rng):
    adj = _rand_adj_batch(rng)
    g = from_dense_batch(jnp.asarray(adj), max_edges_per_clip=64)
    dense = np.asarray(g.to_dense())
    # top-64 magnitude entries per clip survive exactly
    for b in range(4):
        blk = dense[b * 19:(b + 1) * 19, b * 19:(b + 1) * 19]
        flat = adj[b].reshape(-1)
        kept = np.sort(np.argsort(-np.abs(flat))[:64])
        expect = np.zeros_like(flat)
        expect[kept] = flat[kept]
        np.testing.assert_allclose(blk.reshape(-1), expect, rtol=1e-6)


@pytest.mark.parametrize("n_nodes,feat", [(8 * 19 * 2, 16), (64, 128)])
def test_edge_partitioned_spmm_matches_dense(rng, n_nodes, feat):
    mesh = make_mesh("graph:8")
    # random sparse graph with E divisible by 8
    e = 8 * 64
    rows = rng.randint(0, n_nodes, e).astype(np.int32)
    cols = rng.randint(0, n_nodes, e).astype(np.int32)
    vals = rng.randn(e).astype(np.float32)
    g = SparseGraph(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                    n_nodes)
    x = rng.randn(n_nodes, feat).astype(np.float32)

    g_sh, x_sh = place_edge_partitioned(mesh, g, jnp.asarray(x))
    out = np.asarray(edge_partitioned_spmm(mesh, g_sh, x_sh))

    dense = np.zeros((n_nodes, n_nodes), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_edge_partitioned_spmm_jit_grad(rng):
    """The distributed SpMM composes with jit and grad (training path)."""
    mesh = make_mesh("graph:8")
    n, e, d = 64, 8 * 32, 8
    g = SparseGraph(
        jnp.asarray(rng.randint(0, n, e).astype(np.int32)),
        jnp.asarray(rng.randint(0, n, e).astype(np.int32)),
        jnp.asarray(rng.randn(e).astype(np.float32)), n)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    g_sh, x_sh = place_edge_partitioned(mesh, g, x)

    @jax.jit
    def loss(vals, xx):
        gg = SparseGraph(g_sh.rows, g_sh.cols, vals, n)
        return jnp.sum(edge_partitioned_spmm(mesh, gg, xx) ** 2)

    gv, gx = jax.grad(loss, argnums=(0, 1))(g_sh.values, x_sh)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gx)).all()
