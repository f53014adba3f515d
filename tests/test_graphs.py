"""Graph/spectral math parity tests against the executing reference
(SURVEY.md §4: unit tests with the reference as oracle)."""

import numpy as np
import pytest

from conftest import import_reference_module, reference_available

from eeg_gnn_tpu.graphs import (
    build_distance_adjacency,
    compute_supports,
    compute_supports_jnp,
    correlation_adjacency,
    correlation_adjacency_jnp,
    keep_topk,
    keep_topk_jnp,
    load_distance_adjacency,
    normalized_laplacian,
    random_walk,
    scaled_laplacian,
    swap_adjacency_nodes,
)
from eeg_gnn_tpu.constants import get_swap_pairs

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")

ADJ_PKL = "/root/reference/data/electrode_graph/adj_mx_3d.pkl"
DIST_CSV = "/root/reference/data/electrode_graph/distances_3d.csv"


def _rand_adj(rng, n=19, symmetric=False):
    a = np.abs(rng.rand(n, n)).astype(np.float64)
    if symmetric:
        a = (a + a.T) / 2
    np.fill_diagonal(a, 1.0)
    return a


@needs_ref
def test_normalized_laplacian_matches_reference(rng):
    ref = import_reference_module("utils")
    for sym in (True, False):
        a = _rand_adj(rng, symmetric=sym)
        ours = normalized_laplacian(a)
        theirs = ref.calculate_normalized_laplacian(a).toarray()
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


@needs_ref
def test_scaled_laplacian_matches_reference(rng):
    ref = import_reference_module("utils")
    a = _rand_adj(rng, symmetric=True)
    # lambda_max=None path (the one the dataloaders use, dataloader_detection.py:343)
    ours = scaled_laplacian(a, lambda_max=None)
    theirs = ref.calculate_scaled_laplacian(a, lambda_max=None).toarray()
    np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-10)
    # fixed lambda_max path
    np.testing.assert_allclose(
        scaled_laplacian(a, lambda_max=2),
        ref.calculate_scaled_laplacian(a, lambda_max=2).toarray(),
        rtol=1e-12,
    )


@needs_ref
def test_random_walk_matches_reference(rng):
    ref = import_reference_module("utils")
    a = _rand_adj(rng)
    np.testing.assert_allclose(
        random_walk(a), ref.calculate_random_walk_matrix(a).toarray(), rtol=1e-12
    )


@needs_ref
def test_compute_supports_matches_reference_dataloader_semantics(rng):
    """Replicates dataloader_detection.py:335-354 support assembly."""
    ref = import_reference_module("utils")
    a = _rand_adj(rng)

    ours = compute_supports(a, "dual_random_walk")
    theirs = [
        ref.calculate_random_walk_matrix(a).T.toarray(),
        ref.calculate_random_walk_matrix(a.T).T.toarray(),
    ]
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(o, t.astype(np.float32), rtol=1e-6)

    a_sym = _rand_adj(rng, symmetric=True)
    ours = compute_supports(a_sym, "laplacian")
    theirs = ref.calculate_scaled_laplacian(a_sym, lambda_max=None).toarray()
    np.testing.assert_allclose(ours[0], theirs.astype(np.float32), rtol=1e-5, atol=1e-6)


def test_jnp_supports_match_numpy(rng):
    adjs = np.stack([_rand_adj(rng) for _ in range(4)]).astype(np.float32)
    for ft in ("laplacian", "random_walk", "dual_random_walk"):
        batched = np.asarray(compute_supports_jnp(adjs, ft))
        for b in range(4):
            host = compute_supports(adjs[b], ft)
            for s in range(len(host)):
                np.testing.assert_allclose(batched[s, b], host[s], rtol=2e-4, atol=2e-5)


@needs_ref
def test_distance_adjacency_matches_shipped_pickle():
    adj, _ = build_distance_adjacency(DIST_CSV)
    shipped = load_distance_adjacency(ADJ_PKL)
    np.testing.assert_allclose(adj, shipped, rtol=1e-6, atol=1e-7)
    assert (adj > 0).sum() == 91  # SURVEY.md §2.2


@needs_ref
def test_swap_adjacency_matches_reference_get_combined_graph():
    """The reference's multi-pair swap is NOT a clean symmetric permutation
    (later pairs' column writes read the ORIGINAL matrix) — we reproduce its
    exact observable output (dataloader_detection.py:309-333)."""
    dl = import_reference_module("data.dataloader_detection")
    ds = object.__new__(dl.SeizureDataset)
    ds.adj_mat_dir = ADJ_PKL
    pairs = get_swap_pairs()
    ref_out = ds._get_combined_graph(swap_nodes=pairs)
    ours = swap_adjacency_nodes(load_distance_adjacency(ADJ_PKL), pairs)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-6)
    # single-pair swap too
    ref_one = ds._get_combined_graph(swap_nodes=[pairs[0]])
    ours_one = swap_adjacency_nodes(load_distance_adjacency(ADJ_PKL), [pairs[0]])
    np.testing.assert_allclose(ours_one, ref_one, rtol=1e-6)
    # no-swap passthrough
    np.testing.assert_allclose(
        swap_adjacency_nodes(load_distance_adjacency(ADJ_PKL), None),
        ds._get_combined_graph(swap_nodes=None),
        rtol=1e-6,
    )


@needs_ref
def test_keep_topk_matches_reference(rng):
    du = import_reference_module("data.data_utils")
    a = np.abs(rng.rand(19, 19)).astype(np.float32)
    np.fill_diagonal(a, 1.0)
    for directed in (True, False):
        np.testing.assert_allclose(
            keep_topk(a, top_k=3, directed=directed),
            du.keep_topk(a.copy(), top_k=3, directed=directed),
            rtol=1e-7,
        )


def test_keep_topk_jnp_matches_numpy(rng):
    a = np.abs(rng.rand(5, 19, 19)).astype(np.float32)
    for directed in (True, False):
        ours = np.asarray(keep_topk_jnp(a, top_k=3, directed=directed))
        for b in range(5):
            np.testing.assert_allclose(
                ours[b], keep_topk(a[b], top_k=3, directed=directed), rtol=1e-6
            )


@needs_ref
def test_correlation_adjacency_matches_reference_loop(rng):
    """Oracle vs the reference's per-pair scipy xcorr loop
    (dataloader_detection.py:258-307 semantics, built from its primitives)."""
    du = import_reference_module("data.data_utils")
    clip = rng.randn(12, 19, 100).astype(np.float64)

    flat = np.transpose(clip, (1, 0, 2)).reshape(19, -1)
    ref_adj = np.eye(19)
    for i in range(19):
        for j in range(i + 1, 19):
            v = du.comp_xcorr(flat[i], flat[j], mode="valid", normalize=True)
            ref_adj[i, j] = v
            ref_adj[j, i] = v
    ref_adj = du.keep_topk(np.abs(ref_adj), top_k=3, directed=True)

    ours = correlation_adjacency(clip, top_k=3)
    np.testing.assert_allclose(ours, ref_adj.astype(np.float32), rtol=1e-5, atol=1e-7)


def test_correlation_adjacency_jnp_matches_oracle(rng):
    clips = rng.randn(3, 12, 19, 100).astype(np.float32)
    batched = np.asarray(correlation_adjacency_jnp(clips, top_k=3))
    for b in range(3):
        host = correlation_adjacency(clips[b], top_k=3)
        np.testing.assert_allclose(batched[b], host, rtol=2e-3, atol=2e-4)


def test_correlation_adjacency_zero_channel(rng):
    """Degenerate zero-energy channel: reference skips normalization."""
    clip = rng.randn(4, 19, 50)
    clip[:, 7, :] = 0.0
    host = correlation_adjacency(clip, top_k=None)
    dev = np.asarray(correlation_adjacency_jnp(clip.astype(np.float32), top_k=None))
    assert host[7, 7] == 1.0
    np.testing.assert_allclose(host[7, :7], 0.0, atol=1e-12)
    # f32 Gram accumulation with heavy cancellation near zero-correlation
    np.testing.assert_allclose(dev, host, rtol=2e-3, atol=1e-3)


def test_graph_cli_regenerates_shipped_pickle(tmp_path):
    """`cli.preprocess graph` rebuilds adj_mx_3d.pkl from distances_3d.csv
    exactly (counterpart of the reference's generate_adj_mx.ipynb cell 4)."""
    import os
    import pickle

    import pytest

    csv_path = "/root/reference/data/electrode_graph/distances_3d.csv"
    pkl_path = "/root/reference/data/electrode_graph/adj_mx_3d.pkl"
    if not (os.path.exists(csv_path) and os.path.exists(pkl_path)):
        pytest.skip("no reference mount")

    from eeg_gnn_tpu.cli.preprocess import main

    out = str(tmp_path / "adj_mx_3d.pkl")
    main(["graph", "--distances_csv", csv_path, "--output_pkl", out])

    with open(out, "rb") as f:
        ours = pickle.load(f)
    with open(pkl_path, "rb") as f:
        theirs = pickle.load(f)
    assert ours[0] == list(theirs[0])
    assert ours[1] == dict(theirs[1])
    np.testing.assert_allclose(ours[2], np.asarray(theirs[2], np.float32),
                               rtol=1e-6, atol=1e-7)
