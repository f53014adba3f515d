"""HBM-resident dataset cache (data/device_cache.py): the cached path's
in-step gather + device-side augment/standardize/supports must reproduce
the streaming host loader's math, and the CLI flag must train end-to-end.
"""

import numpy as np
import pytest

from eeg_gnn_tpu.data.device_cache import DeviceDatasetCache, fits_in_hbm


def test_epoch_index_batches_padding():
    cache = DeviceDatasetCache(
        np.zeros((10, 4, 19, 8), np.float32), np.arange(10.0), seq_len=4)
    batches = list(cache.epoch_index_batches(
        4, False, np.random.RandomState(0)))
    assert [v for _, v in batches] == [4, 4, 2]
    idx_last, valid = batches[-1]
    assert len(idx_last) == 4  # padded to the fixed shape
    assert (idx_last[2:] == idx_last[0]).all()
    # drop_last drops the partial tail
    assert len(list(cache.epoch_index_batches(
        4, False, np.random.RandomState(0), drop_last=True))) == 2
    # shuffled epochs cover every index exactly once
    idx_all = np.sort(np.concatenate(
        [i[:v] for i, v in cache.epoch_index_batches(
            4, True, np.random.RandomState(1))]))
    assert (idx_all == np.arange(10)).all()


def test_fits_in_hbm_budget():
    assert fits_in_hbm(10_000, 60, 19, 100, "bfloat16")
    assert not fits_in_hbm(10_000_000, 60, 19, 100, "float32")


def test_features_tail_matches_full_pipeline(rng):
    """DevicePipeline.features == the tail of __call__ after featurize."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.constants import FREQUENCY
    from eeg_gnn_tpu.data.device_pipeline import DevicePipeline, reflection_permutation
    from eeg_gnn_tpu.graphs import compute_supports
    from eeg_gnn_tpu.ops.fft_features import featurize_clip

    adj = np.abs(rng.rand(19, 19)).astype(np.float32)
    adj = (adj + adj.T) / 2
    np.fill_diagonal(adj, 1.0)
    sup = jnp.asarray(np.stack(compute_supports(adj, "laplacian")))
    pipe = DevicePipeline(
        time_step_size=1, use_fft=True, graph_type="combined",
        filter_type="laplacian", top_k=None, mean=0.3, std=1.7,
        augment=True, node_perm=jnp.asarray(reflection_permutation(19)),
        dist_supports=sup, dist_supports_swapped=sup * 0.5)

    raw = rng.randn(3, 19, 4 * FREQUENCY).astype(np.float32)
    key = jax.random.PRNGKey(3)
    x_full, sup_full = pipe(jnp.asarray(raw), key, True)
    feats = featurize_clip(jnp.asarray(raw), 1, FREQUENCY, True)
    x_tail, sup_tail = pipe.features(feats, key, True)
    np.testing.assert_allclose(np.asarray(x_full), np.asarray(x_tail),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sup_full), np.asarray(sup_tail))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = tmp_path_factory.mktemp("cache_corpus")
    return make_synthetic_corpus(str(root), num_files=4, file_seconds=96,
                                 clip_len=12, seed=0)


def _common(corpus):
    return dict(
        input_dir=corpus["input_dir"], raw_data_dir=corpus["raw_data_dir"],
        marker_dir=corpus["marker_dir"], train_batch_size=8,
        test_batch_size=8, num_workers=1, max_seq_len=12,
        time_step_size=1, use_fft=True, sampling_ratio=1, seed=123)


def test_cached_eval_matches_streaming(corpus):
    """Same params, same split: HBM-cache evaluate == streaming evaluate
    (device-side standardize/supports vs the host loader's)."""
    import jax

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_detection
    from eeg_gnn_tpu.data.device_cache import build_detection_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.trainer import Trainer
    from eeg_gnn_tpu.utils.logging import get_logger

    cfg = ExperimentConfig(
        do_train=True, task="detection", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, num_classes=1,
        train_batch_size=8, test_batch_size=8, num_epochs=1,
    ).finalize()

    loaders, _, scaler = load_dataset_detection(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=False,
        **_common(corpus))
    _, plain, _ = load_dataset_detection(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, **_common(corpus))

    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    caches = {"dev": build_detection_cache(plain["dev"], 12)}

    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))

    import logging

    log = logging.getLogger("test_device_cache")

    class _NullTbx:
        def add_scalar(self, *a, **k):
            pass

    stream = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle)
    cached = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle,
                     input_pipeline=pipeline, device_caches=caches)

    r_stream = stream.evaluate(params, model_state, "dev")
    r_cached = cached.evaluate(params, model_state, "dev")
    assert abs(r_stream["loss"] - r_cached["loss"]) < 1e-4
    assert abs(r_stream["auroc"] - r_cached["auroc"]) < 1e-6
    assert r_stream["acc"] == r_cached["acc"]


def test_cli_hbm_cache_trains(corpus, tmp_path):
    """--hbm_cache end-to-end through the CLI (1 epoch, augment on)."""
    from eeg_gnn_tpu.cli.train import main

    res = main([
        "--input_dir", corpus["input_dir"],
        "--raw_data_dir", corpus["raw_data_dir"],
        "--marker_dir", corpus["marker_dir"],
        "--adj_mat_dir", corpus["adj_mat_dir"],
        "--save_dir", str(tmp_path), "--do_train", "--use_fft",
        "--data_augment", "--hbm_cache",
        "--model_name", "dcrnn", "--task", "detection",
        "--graph_type", "combined", "--max_seq_len", "12",
        "--num_rnn_layers", "1", "--rnn_units", "16",
        "--max_diffusion_step", "1", "--num_classes", "1",
        "--train_batch_size", "8", "--test_batch_size", "8",
        "--num_epochs", "1", "--num_workers", "1",
        "--metric_name", "auroc",
    ])
    assert np.isfinite(res["loss"]) and "auroc" in res
