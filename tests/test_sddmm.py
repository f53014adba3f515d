"""SDDMM op: edge-list and block-sparse Pallas versions vs the dense Gram
oracle, including the reference's normalized-xcorr semantics
(``data/data_utils.py:203-222``)."""

import numpy as np
import pytest

from eeg_gnn_tpu.ops.sddmm import (
    edges_to_blocks,
    sddmm_edges,
    sddmm_edges_blocksparse,
)


def _random_topology(rng, n, k):
    """Directed top-k-like edge list (no self loops)."""
    rows = np.repeat(np.arange(n), k)
    cols = np.concatenate(
        [rng.choice(np.delete(np.arange(n), i), size=k, replace=False)
         for i in range(n)])
    return rows.astype(np.int32), cols.astype(np.int32)


def test_sddmm_edges_matches_dense(rng):
    n, d, k = 37, 96, 3
    x = rng.randn(n, d).astype(np.float32)
    rows, cols = _random_topology(rng, n, k)
    vals = np.asarray(sddmm_edges(rows, cols, x, x))
    dense = x @ x.T
    np.testing.assert_allclose(vals, dense[rows, cols], rtol=1e-5, atol=1e-5)


def test_sddmm_edges_normalized_matches_xcorr_oracle(rng):
    """Normalized SDDMM entries == the reference's per-pair normalized
    zero-lag xcorr (the 171-pair host loop's math)."""
    from eeg_gnn_tpu.graphs.xcorr import comp_xcorr_zero_lag

    n, d = 19, 128
    x = rng.randn(n, d).astype(np.float32)
    x[4] = 0.0  # zero-energy row: normalization must be skipped
    rows, cols = _random_topology(rng, n, 3)
    vals = np.asarray(sddmm_edges(rows, cols, x, x, normalize=True))
    for e, (r, c) in enumerate(zip(rows, cols)):
        ref = comp_xcorr_zero_lag(x[r].astype(np.float64),
                                  x[c].astype(np.float64))
        np.testing.assert_allclose(vals[e], ref, rtol=1e-4, atol=1e-5)


def test_edges_to_blocks_roundtrip(rng):
    n, k, blk = 300, 4, 128
    rows, cols = _random_topology(rng, n, k)
    brows, bcols, edge_block, edge_pos = edges_to_blocks(rows, cols, n, blk)
    assert brows.shape == bcols.shape
    # every edge lands in the block its coordinates claim
    np.testing.assert_array_equal(brows[edge_block] * blk + edge_pos[:, 0],
                                  rows)
    np.testing.assert_array_equal(bcols[edge_block] * blk + edge_pos[:, 1],
                                  cols)


@pytest.mark.parametrize("n,d", [(19, 60), (300, 200)])
def test_sddmm_blocksparse_matches_edges(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randn(n, d).astype(np.float32)
    rows, cols = _random_topology(rng, n, 3)
    ref = np.asarray(sddmm_edges(rows, cols, x, y))
    got = np.asarray(sddmm_edges_blocksparse(rows, cols, x, y, n,
                                             interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sddmm_blocksparse_normalized(rng):
    n, d = 150, 77
    x = rng.randn(n, d).astype(np.float32)
    rows, cols = _random_topology(rng, n, 3)
    ref = np.asarray(sddmm_edges(rows, cols, x, x, normalize=True))
    got = np.asarray(sddmm_edges_blocksparse(rows, cols, x, x, n,
                                             normalize=True, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sddmm_edges_grad(rng):
    """Differentiable: gradient matches the dense-Gram formulation."""
    import jax
    import jax.numpy as jnp

    n, d = 12, 24
    x = rng.randn(n, d).astype(np.float32)
    rows, cols = _random_topology(rng, n, 2)

    def loss_sparse(xx):
        return jnp.sum(sddmm_edges(rows, cols, xx, xx) ** 2)

    def loss_dense(xx):
        gram = xx @ xx.T
        return jnp.sum(gram[rows, cols] ** 2)

    g1 = jax.grad(loss_sparse)(jnp.asarray(x))
    g2 = jax.grad(loss_dense)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
