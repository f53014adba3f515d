"""Serving API tests: fixed-shape chunked prediction, checkpoint loading,
and the raw-clip fused front door (matches the featurized path exactly)."""

import os
import tempfile

import numpy as np
import pytest

from eeg_gnn_tpu.config import ExperimentConfig
from eeg_gnn_tpu.serve import Predictor

T, N, D = 6, 19, 100


def _tiny_cfg(**kw):
    base = dict(do_train=True, graph_type="individual", max_seq_len=T,
                num_rnn_layers=1, rnn_units=16, max_diffusion_step=1,
                test_batch_size=4, use_fft=True)
    base.update(kw)
    return ExperimentConfig(**base).finalize()


def _init(cfg):
    import jax

    from eeg_gnn_tpu.models.registry import build_model

    return build_model(cfg).init(jax.random.PRNGKey(0))


def _adjacency(rng, n):
    adj = np.abs(rng.rand(n, N, N)).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2
    for a in adj:
        np.fill_diagonal(a, 1.0)
    return adj


def test_predict_chunks_and_threshold(rng):
    cfg = _tiny_cfg()
    params, state = _init(cfg)
    pred = Predictor(cfg, params, state, threshold=0.5)

    n = 10  # not a multiple of batch_size=4 -> 3 chunks, last padded
    x = rng.randn(n, T, N, D).astype(np.float32)
    adj = _adjacency(rng, n)
    probs = pred.predict_proba(x, adjacency=adj)
    assert probs.shape == (n,)
    assert np.all((probs >= 0) & (probs <= 1))

    # chunking must not change results vs one big padded batch
    big = Predictor(cfg, params, state, batch_size=16)
    probs_big = big.predict_proba(x, adjacency=adj)
    np.testing.assert_allclose(probs, probs_big, rtol=2e-5, atol=2e-6)

    decisions, p2 = pred.predict(x, adjacency=adj)
    np.testing.assert_array_equal(decisions, (p2 > 0.5).astype(np.int64))


def test_predict_classification_softmax(rng):
    cfg = _tiny_cfg(task="classification", num_classes=4)
    params, state = _init(cfg)
    pred = Predictor(cfg, params, state)
    x = rng.randn(5, T, N, D).astype(np.float32)
    probs = pred.predict_proba(x, adjacency=_adjacency(rng, 5))
    assert probs.shape == (5, 4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    decisions, _ = pred.predict(x, adjacency=_adjacency(
        np.random.RandomState(0), 5))
    assert decisions.shape == (5,)
    assert set(np.unique(decisions)) <= {0, 1, 2, 3}


def test_from_checkpoint_roundtrip(rng):
    from eeg_gnn_tpu.train.checkpoint import save_params

    cfg = _tiny_cfg()
    params, state = _init(cfg)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "best.npz")
        save_params(path, params)
        pred = Predictor.from_checkpoint(path, cfg)
        x = rng.randn(3, T, N, D).astype(np.float32)
        adj = _adjacency(rng, 3)
        direct = Predictor(cfg, params, state).predict_proba(x, adjacency=adj)
        loaded = pred.predict_proba(x, adjacency=adj)
        np.testing.assert_allclose(loaded, direct, rtol=1e-6)


def test_raw_front_door_matches_featurized(rng):
    """Raw (B, C, L) in -> probability out must equal host featurization +
    on-device support construction + featurized predict."""
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.data.scaler import StandardScaler
    from eeg_gnn_tpu.graphs import compute_supports_jnp, correlation_adjacency_jnp
    from eeg_gnn_tpu.ops.fft_features import featurize_clip

    cfg = _tiny_cfg()
    params, state = _init(cfg)
    scaler = StandardScaler(mean=0.3, std=1.7)
    pipe = make_device_pipeline(
        graph_type="individual", filter_type=cfg.filter_type, top_k=cfg.top_k,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False)
    pred = Predictor(cfg, params, state, pipeline=pipe)

    n = 5
    raw = rng.randn(n, N, T * 200).astype(np.float32)
    probs_raw = pred.predict_proba_raw(raw)
    assert probs_raw.shape == (n,)

    feats = np.asarray(featurize_clip(jnp.asarray(raw), 1, 200, True))
    x = (feats - scaler.mean) / scaler.std
    adj = np.asarray(correlation_adjacency_jnp(jnp.asarray(feats),
                                               top_k=cfg.top_k))
    sup = np.asarray(compute_supports_jnp(jnp.asarray(adj), cfg.filter_type))
    probs_feat = pred.predict_proba(x, supports=sup)
    np.testing.assert_allclose(probs_raw, probs_feat, rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(not os.path.isdir("/root/reference/pretrained"),
                    reason="no reference pretrained checkpoints")
def test_from_torch_checkpoint():
    """Serving straight from the reference's shipped .pth.tar weights."""
    ckpt = "/root/reference/pretrained/pretrained_correlation_graph_12s.pth.tar"
    if not os.path.exists(ckpt):
        pytest.skip("checkpoint file absent")
    cfg = ExperimentConfig(
        do_train=False, load_model_path=ckpt, graph_type="individual",
        max_seq_len=12, num_rnn_layers=3, rnn_units=64, max_diffusion_step=2,
        test_batch_size=2, use_fft=True, task="SS pre-training",
    ).finalize()
    # the SSL checkpoints are encoder-decoder models; serve the encoder as a
    # fine-tune-style classifier: transplant encoder weights into a 2-layer
    # classification model (reference utils.py:166-176 semantics)
    import jax

    from eeg_gnn_tpu.io import import_next_time_pred_params, load_torch_state_dict
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.checkpoint import build_finetune_params

    clf_cfg = ExperimentConfig(
        do_train=True, graph_type="individual", max_seq_len=12,
        num_rnn_layers=2, rnn_units=64, max_diffusion_step=2,
        test_batch_size=2, use_fft=True,
    ).finalize()
    params, state = build_model(clf_cfg).init(jax.random.PRNGKey(0))
    pre = import_next_time_pred_params(load_torch_state_dict(ckpt), 3)
    params = build_finetune_params(params, pre, clf_cfg.num_rnn_layers)
    pred = Predictor(clf_cfg, params, state)

    rng = np.random.RandomState(0)
    x = rng.randn(3, 12, N, D).astype(np.float32)
    adj = _adjacency(rng, 3)
    probs = pred.predict_proba(x, adjacency=adj)
    assert probs.shape == (3,)
    assert np.all(np.isfinite(probs))


def test_mesh_data_parallel_inference_matches_single(rng):
    """Predictor(mesh=...) shards the batch over the data axis; the
    probabilities must equal the single-device predictor's exactly
    (data-parallel inference changes placement, never math)."""
    from eeg_gnn_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    params, state = _init(cfg)
    x = rng.randn(8, T, N, D).astype(np.float32)
    adj = _adjacency(rng, 8)

    p1 = Predictor(cfg, params, state, batch_size=8)
    pm = Predictor(cfg, params, state, batch_size=8,
                   mesh=make_mesh("data:8"))
    probs1 = p1.predict_proba(x, adjacency=adj)
    probsm = pm.predict_proba(x, adjacency=adj)
    np.testing.assert_allclose(probsm, probs1, rtol=1e-5, atol=1e-6)

    # chunked path (n > batch_size) through the mesh too
    x2 = rng.randn(11, T, N, D).astype(np.float32)
    adj2 = _adjacency(rng, 11)
    np.testing.assert_allclose(
        pm.predict_proba(x2, adjacency=adj2),
        p1.predict_proba(x2, adjacency=adj2), rtol=1e-5, atol=1e-6)
