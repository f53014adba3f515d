"""Fused on-device input pipeline vs the host (reference-parity) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.constants import FREQUENCY
from eeg_gnn_tpu.data.device_pipeline import (
    DevicePipeline,
    make_device_pipeline,
    reflection_permutation,
)
from eeg_gnn_tpu.data.scaler import StandardScaler
from eeg_gnn_tpu.graphs import compute_supports, correlation_adjacency
from eeg_gnn_tpu.ops.fft_features import featurize_clip_np


class _FakeAdj:
    pass


@pytest.fixture()
def dist_pkl(tmp_path, rng):
    import pickle

    adj = np.abs(rng.rand(19, 19)).astype(np.float32)
    adj = (adj + adj.T) / 2
    np.fill_diagonal(adj, 1.0)
    path = str(tmp_path / "adj.pkl")
    with open(path, "wb") as f:
        pickle.dump([["c"] * 19, {}, adj], f)
    return path


def test_individual_graph_pipeline_matches_host(rng):
    """No augmentation: device pipeline output == host featurize + xcorr
    graph + supports + z-score."""
    scaler = StandardScaler(mean=np.float64(0.3), std=np.float64(2.0))
    pipe = make_device_pipeline(
        graph_type="individual", filter_type="dual_random_walk", top_k=3,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False)

    raw = rng.randn(3, 19, 12 * FREQUENCY).astype(np.float32) * 20
    x, supports = jax.jit(lambda r, k: pipe(r, k, False))(
        jnp.asarray(raw), jax.random.PRNGKey(0))

    for b in range(3):
        host_feat = featurize_clip_np(raw[b].astype(np.float64), 1, FREQUENCY,
                                      True)
        host_x = scaler.transform(host_feat)
        np.testing.assert_allclose(np.asarray(x[b]), host_x, rtol=1e-3,
                                   atol=1e-3)
        adj = correlation_adjacency(host_feat, top_k=3)
        host_sups = compute_supports(adj, "dual_random_walk")
        for s in range(2):
            np.testing.assert_allclose(np.asarray(supports[s, b]),
                                       host_sups[s], rtol=2e-3, atol=2e-3)


def test_combined_graph_pipeline_and_reflection(rng, dist_pkl):
    from eeg_gnn_tpu.constants import get_swap_pairs
    from eeg_gnn_tpu.graphs import load_distance_adjacency, swap_adjacency_nodes

    scaler = StandardScaler(mean=np.float64(0.0), std=np.float64(1.0))
    # reflect_invariant=False: test the LITERAL per-clip reflected-support
    # semantics (the default fast path is covered by
    # test_reflect_invariant_fast_path_exact)
    pipe = make_device_pipeline(
        graph_type="combined", filter_type="laplacian", top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=True,
        adj_mat_dir=dist_pkl, reflect_invariant=False)

    raw = rng.randn(8, 19, 4 * FREQUENCY).astype(np.float32)
    x, supports = jax.jit(lambda r, k: pipe(r, k, True))(
        jnp.asarray(raw), jax.random.PRNGKey(7))
    assert x.shape == (8, 4, 19, 100)
    assert supports.shape == (1, 8, 19, 19)

    # every sample's support is one of the two precomputed variants
    adj = load_distance_adjacency(dist_pkl)
    normal = compute_supports(adj, "laplacian")[0]
    swapped = compute_supports(
        swap_adjacency_nodes(adj, get_swap_pairs()), "laplacian")[0]
    n_swapped = 0
    for b in range(8):
        s = np.asarray(supports[0, b])
        if np.allclose(s, swapped, atol=1e-5):
            n_swapped += 1
        else:
            np.testing.assert_allclose(s, normal, atol=1e-5)
    assert 0 < n_swapped < 8  # both branches exercised w.h.p.

    # reflected samples' features are the node-permuted features (up to the
    # random scale shift, which is constant per sample under FFT)
    perm = reflection_permutation(19)
    feats = np.stack([
        featurize_clip_np(raw[b].astype(np.float64), 1, FREQUENCY, True)
        for b in range(8)
    ])
    for b in range(8):
        s = np.asarray(supports[0, b])
        base = feats[b][:, perm, :] if np.allclose(s, swapped, atol=1e-5) \
            else feats[b]
        shift = np.asarray(x[b]) - base
        assert np.std(shift) < 1e-3  # constant log-scale shift
        assert np.abs(shift.mean()) <= abs(np.log(1.2)) + 1e-3


def test_reflect_invariant_fast_path_exact(rng, dist_pkl):
    """The opt-in combined-graph fast path (skip reflection, shared
    supports) must yield the SAME loss and gradients as literally
    reflecting clip + graph, when the graph swap is the TRUE node
    permutation P·A·Pᵀ: relabeling nodes is invisible to the
    permutation-invariant DCRNN family. (The reference's quirky multi-pair
    swap is NOT a true permutation — that literal path keeps its own test
    above — which is why this is opt-in: DIVERGENCES.md
    "Reflection-invariant supports".)"""
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports, load_distance_adjacency
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.step import supervised_loss_fn

    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=1, rnn_units=8, input_dim=100,
                           max_diffusion_step=1, use_fft=True,
                           dropout=0.0).finalize()
    scaler = StandardScaler(mean=np.float64(0.0), std=np.float64(1.0))

    adj = load_distance_adjacency(dist_pkl)
    perm = reflection_permutation(19)
    sup = jnp.asarray(np.stack(compute_supports(adj, cfg.filter_type)))
    sup_true_perm = jnp.asarray(np.stack(
        compute_supports(adj[perm][:, perm], cfg.filter_type)))
    pipes = {
        mode: DevicePipeline(
            time_step_size=1, use_fft=True, graph_type="combined",
            filter_type=cfg.filter_type, top_k=None, mean=0.0, std=1.0,
            augment=True, node_perm=jnp.asarray(perm),
            dist_supports=sup, dist_supports_swapped=sup_true_perm,
            reflect_invariant=mode)
        for mode in (False, True)
    }
    bundle = build_model(cfg)
    params, ms = bundle.init(jax.random.PRNGKey(0))
    raw = rng.randn(8, 19, 4 * FREQUENCY).astype(np.float32)
    batch = {"raw": jnp.asarray(raw),
             "y": jnp.asarray(rng.randint(0, 2, 8).astype(np.float32)),
             "seq_lengths": jnp.full((8,), 4, jnp.int32), "supports": None}
    key = jax.random.PRNGKey(11)

    out = {}
    for mode, pipe in pipes.items():
        loss_fn = supervised_loss_fn(bundle, "detection",
                                     input_pipeline=pipe)
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(p, ms, batch, key, True)[0])
        loss, grads = grad_fn(params)
        out[mode] = (np.asarray(loss), grads)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=2e-5)
    flat_lit = jax.tree_util.tree_leaves(out[False][1])
    flat_fast = jax.tree_util.tree_leaves(out[True][1])
    for a, b in zip(flat_lit, flat_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_pipeline_trains_end_to_end(rng):
    """Raw batch -> pipeline -> DCRNN train step, grads finite."""
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

    cfg = ExperimentConfig(do_train=True, graph_type="individual",
                           num_rnn_layers=1, rnn_units=8, input_dim=100,
                           max_diffusion_step=1, use_fft=True).finalize()
    scaler = StandardScaler(mean=np.float64(0.0), std=np.float64(1.0))
    pipe = make_device_pipeline(
        graph_type="individual", filter_type=cfg.filter_type, top_k=3,
        use_fft=True, time_step_size=1, scaler=scaler, augment=True)
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 0.0, 5.0, 10, 10)
    ostate = opt.init(params)
    step = make_train_step(supervised_loss_fn(bundle, "detection", pipe), opt,
                           donate=False)
    batch = {
        "raw": jnp.asarray(rng.randn(4, 19, 2 * FREQUENCY).astype(np.float32)),
        "y": jnp.asarray(rng.randint(0, 2, 4).astype(np.float32)),
        "seq_lengths": jnp.full((4,), 2, jnp.int32),
        "supports": None,
    }
    params, mstate, ostate, loss = step(params, mstate, ostate, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_classification_individual_length_masked_xcorr(rng):
    """VERDICT r4 #5: classification x individual joins the cached device
    pipeline — the correlation graph built from the LENGTH-MASKED padded
    clip equals the host oracle's whole-clip xcorr on the UNPADDED clip
    (dataloader_classification.py:258-307) for every true length, and the
    padded x rows stay pinned to padding_val."""
    from eeg_gnn_tpu.graphs import compute_supports_jnp

    t_max, n, d, b = 8, 19, 6, 5
    scaler = StandardScaler(mean=np.float64(0.1), std=np.float64(1.5))
    pipe = make_device_pipeline(
        graph_type="individual", filter_type="dual_random_walk", top_k=3,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        num_nodes=n)

    lens = np.array([8, 1, 3, 5, 7], np.int32)
    clips = [rng.randn(int(L), n, d).astype(np.float32) for L in lens]
    feats = np.zeros((b, t_max, n, d), np.float32)
    for i, c in enumerate(clips):
        feats[i, : lens[i]] = c
    # poison the padding region to prove the mask (not zero storage)
    # protects the graph: any leakage would change the Gram
    poisoned = feats.copy()
    for i in range(b):
        poisoned[i, lens[i]:] = 7.5

    x, sup = pipe.classification_features(
        jnp.asarray(poisoned), jnp.asarray(lens), jax.random.PRNGKey(0),
        training=True, padding_val=0.0)

    for i in range(b):
        adj_host = correlation_adjacency(clips[i], top_k=3)
        sup_host = np.stack(compute_supports(adj_host, "dual_random_walk"))
        np.testing.assert_allclose(np.asarray(sup[:, i]), sup_host,
                                   rtol=1e-4, atol=1e-5, err_msg=str(i))
        # x: standardized valid rows, padding re-pinned to padding_val
        np.testing.assert_allclose(
            np.asarray(x[i, : lens[i]]), (clips[i] - 0.1) / 1.5,
            rtol=1e-5, atol=1e-6)
        assert np.all(np.asarray(x[i, lens[i]:]) == 0.0)
