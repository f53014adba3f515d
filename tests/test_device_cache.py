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


def test_mesh_epoch_plan_covers_all_rows():
    """Every real clip is visited exactly once per epoch; padded slots are
    masked; all devices run the same number of steps."""
    n, p, batch = 21, 4, 8
    cache = DeviceDatasetCache(
        np.zeros((n, 2, 19, 4), np.float32), np.arange(float(n)), seq_len=2)
    idx, mask = cache.mesh_epoch_plan(batch, p, True,
                                      np.random.RandomState(0))
    b_local = batch // p
    block = -(-n // p)
    assert idx.shape == mask.shape
    assert idx.shape[1] == batch
    seen = []
    for k in range(idx.shape[0]):
        for j in range(batch):
            d = j // b_local
            if mask[k, j]:
                g = d * block + idx[k, j]
                assert g < n
                seen.append(g)
            else:
                assert idx[k, j] < max(1, block)  # in-shard repeat
    assert sorted(seen) == list(range(n))


def test_ssl_cached_eval_matches_streaming(corpus):
    """SSL: HBM-cached evaluate == streaming evaluate (device-side
    standardize + shared supports vs the host loader's)."""
    import jax
    import logging

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_ssl
    from eeg_gnn_tpu.data.device_cache import build_ssl_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model
    from eeg_gnn_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        do_train=True, task="SS pre-training", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, output_seq_len=12,
        num_rnn_layers=1, rnn_units=16, max_diffusion_step=1,
        train_batch_size=8, test_batch_size=8, num_epochs=1,
    ).finalize()
    kw = _common(corpus)
    kw.pop("sampling_ratio"), kw.pop("seed"), kw.pop("max_seq_len")
    loaders, _, scaler = load_dataset_ssl(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=False,
        input_len=12, output_len=12, **kw)
    _, plain, _ = load_dataset_ssl(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, input_len=12, output_len=12,
        build_loaders=False, **kw)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    caches = {"dev": build_ssl_cache(plain["dev"], 12, num_workers=2)}
    params = init_next_time_pred_model(jax.random.PRNGKey(0),
                                       cfg.dcrnn_config())
    log = logging.getLogger("test_device_cache")

    class _NullTbx:
        def add_scalar(self, *a, **k):
            pass

    stream = Trainer(cfg, loaders, scaler, log, _NullTbx())
    cached = Trainer(cfg, loaders, scaler, log, _NullTbx(),
                     input_pipeline=pipeline, device_caches=caches)
    r_stream = stream.evaluate(params, {}, "dev")
    r_cached = cached.evaluate(params, {}, "dev")
    assert abs(r_stream["loss"] - r_cached["loss"]) < 1e-4

    # bf16 STORAGE through the seq2seq path: the decoder scan carry must
    # stay f32 (models/dcgru.py decoder_apply) — regression for the dtype
    # mismatch a bf16 cache exposed
    caches16 = {"dev": build_ssl_cache(plain["dev"], 12,
                                       storage_dtype="bfloat16")}
    cached16 = Trainer(cfg, loaders, scaler, log, _NullTbx(),
                       input_pipeline=pipeline, device_caches=caches16)
    r16 = cached16.evaluate(params, {}, "dev")
    assert abs(r16["loss"] - r_stream["loss"]) < 0.02  # bf16 rounding


def test_classification_cached_eval_matches_streaming(corpus):
    """Classification: cached evaluate == streaming evaluate — the padded
    variable-length clips re-pin their padding AFTER the device
    standardize (DevicePipeline.classification_features)."""
    import jax
    import logging

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_classification
    from eeg_gnn_tpu.data.device_cache import build_classification_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        do_train=True, task="classification", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, num_classes=4,
        train_batch_size=8, test_batch_size=8, num_epochs=1,
    ).finalize()
    kw = _common(corpus)
    kw.pop("sampling_ratio"), kw.pop("seed")
    loaders, datasets, scaler = load_dataset_classification(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=False,
        padding_val=0.0, **kw)
    # the corner under test needs at least one truly padded clip; pick a
    # split that has one (seizure spans are random, tiny splits vary)
    split = next(s for s in ("dev", "train", "test")
                 if any(int(datasets[s][i][2]) < 12
                        for i in range(len(datasets[s]))))
    _, plain, _ = load_dataset_classification(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, padding_val=0.0,
        build_loaders=False, **kw)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    caches = {split: build_classification_cache(plain[split], 12)}
    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))
    log = logging.getLogger("test_device_cache")

    class _NullTbx:
        def add_scalar(self, *a, **k):
            pass

    stream = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle)
    cached = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle,
                     input_pipeline=pipeline, device_caches=caches)
    r_stream = stream.evaluate(params, model_state, split)
    r_cached = cached.evaluate(params, model_state, split)
    assert abs(r_stream["loss"] - r_cached["loss"]) < 1e-4
    assert abs(r_stream["F1"] - r_cached["F1"]) < 1e-6
    assert r_stream["acc"] == r_cached["acc"]


def test_mesh_cached_step_matches_single_device(corpus):
    """One optimizer step through the ROW-SHARDED mesh cache (8-device
    mesh, shard-local gathers, boolean row-mask loss) produces the same
    loss and updated params as the single-device cached path fed the
    equivalent global batch."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.device_cache import shard_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.parallel.mesh import make_mesh
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import (
        local_cache_gather,
        make_mesh_cached_train_step,
        supervised_loss_fn,
    )

    mesh = make_mesh("data:8")
    n, t, batch = 19, 3, 8
    rng0 = np.random.RandomState(0)
    feats = rng0.randn(n, t, 19, 8).astype(np.float32)
    labels = (rng0.rand(n) > 0.5).astype(np.float32)

    cfg = ExperimentConfig(
        do_train=True, task="detection", graph_type="combined",
        max_seq_len=t, num_rnn_layers=1, rnn_units=16,
        max_diffusion_step=1, input_dim=8, num_classes=1,
    ).finalize()
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3, 0.0, 5.0, 1, 1)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=None, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)

    cache = DeviceDatasetCache(feats, labels, seq_len=t)
    idx_mat, mask_mat = cache.mesh_epoch_plan(
        batch, 8, True, np.random.RandomState(1))
    sharded = shard_cache(cache, mesh)
    block = sharded.x.shape[0] // 8

    step = make_mesh_cached_train_step(
        supervised_loss_fn(bundle, "detection", input_pipeline=pipeline,
                           cache_gather=local_cache_gather(mesh)),
        optimizer, t, batch, donate=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P(None, "data"))
    key = jax.random.PRNGKey(7)
    p1, ms1, os1, _, counter, seen, losses = step(
        params, mstate, optimizer.init(params), key, jnp.int32(0),
        jnp.int32(0), jnp.zeros((idx_mat.shape[0],), jnp.float32),
        {"x": sharded.x, "y": sharded.y, "seq": None},
        jax.device_put(jnp.asarray(idx_mat), spec),
        jax.device_put(jnp.asarray(mask_mat), spec))
    assert int(counter) == 1
    assert int(seen) == int(mask_mat[0].sum())

    # single-device oracle: the same global rows + mask through the plain
    # cached loss branch and one make_train_step update
    from eeg_gnn_tpu.train.step import make_train_step

    b_local = batch // 8
    global_rows = np.asarray(
        [(j // b_local) * block + idx_mat[0, j] for j in range(batch)],
        np.int32)
    # masked slots may point at shard-padding rows past n; their content
    # never reaches the loss (row mask), so clamp them for the oracle
    global_rows = np.where(mask_mat[0], global_rows, 0).astype(np.int32)
    batch_dict = {
        "cache_x": jnp.asarray(feats[global_rows]),  # dense mini-cache
        "cache_y": jnp.asarray(labels[global_rows]),
        "cache_seq": None,
        "idx": jnp.arange(batch, dtype=jnp.int32),
        "x": None, "y": None,
        "seq_lengths": jnp.full((batch,), t, jnp.int32),
        "supports": None,
        "valid": jnp.asarray(mask_mat[0]),
    }
    oracle_step = make_train_step(
        supervised_loss_fn(bundle, "detection", input_pipeline=pipeline),
        optimizer, donate=False)
    sub = jax.random.split(key)[1]
    p2, _, _, loss2 = oracle_step(params, mstate, optimizer.init(params),
                                  batch_dict, sub)
    np.testing.assert_allclose(float(losses[0]), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_cached_ssl_and_classification_steps(corpus):
    """The mesh-sharded cached step also drives the SSL (batches_seen
    carried on device) and classification (per-row seq_lengths gathered
    from the sharded cache) loss paths: one step each on the 8-device
    mesh, finite loss, counters advance."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.device_cache import shard_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.parallel.mesh import make_mesh
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import (
        local_cache_gather,
        make_mesh_cached_train_step,
        ssl_loss_fn,
        supervised_loss_fn,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh("data:8")
    gather = local_cache_gather(mesh)
    spec = NamedSharding(mesh, P(None, "data"))
    n, t, t_out, batch = 17, 3, 2, 8
    rng0 = np.random.RandomState(0)
    optimizer = make_optimizer(1e-3, 0.0, 5.0, 1, 1)

    def run_one(cache, loss_fn, has_seen):
        idx_mat, mask_mat = cache.mesh_epoch_plan(
            batch, 8, True, np.random.RandomState(1))
        cache = shard_cache(cache, mesh)
        if has_seen:
            params = init_next_time_pred_model(jax.random.PRNGKey(0), mcfg)
            mstate = {}
        else:
            params, mstate = bundle.init(jax.random.PRNGKey(0))
        step = make_mesh_cached_train_step(
            loss_fn, optimizer, t, batch, has_batches_seen=has_seen,
            donate=False)
        out = step(
            params, mstate, optimizer.init(params), jax.random.PRNGKey(3),
            jnp.int32(0), jnp.int32(0),
            jnp.zeros((idx_mat.shape[0],), jnp.float32),
            {"x": cache.x, "y": cache.y, "seq": cache.seq},
            jax.device_put(jnp.asarray(idx_mat), spec),
            jax.device_put(jnp.asarray(mask_mat), spec))
        losses, seen = out[-1], out[-2]
        assert np.isfinite(float(losses[0]))
        assert int(seen) == int(mask_mat[0].sum())

    # SSL: x + target-feature pair cache
    cfg_ssl = ExperimentConfig(
        do_train=True, task="SS pre-training", graph_type="combined",
        max_seq_len=t, output_seq_len=t_out, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, input_dim=8, output_dim=8,
    ).finalize()
    mcfg = cfg_ssl.dcrnn_config()
    pipe = make_device_pipeline(
        graph_type="combined", filter_type=cfg_ssl.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=None, augment=True,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    cache = DeviceDatasetCache(
        rng0.randn(n, t, 19, 8).astype(np.float32),
        rng0.randn(n, t_out, 19, 8).astype(np.float32), t)
    run_one(cache, ssl_loss_fn(mcfg, jnp.float32(0.0), jnp.float32(1.0),
                               input_pipeline=pipe, cache_gather=gather),
            True)

    # classification: padded clips + int labels + per-row lengths
    cfg_cls = ExperimentConfig(
        do_train=True, task="classification", graph_type="combined",
        max_seq_len=t, num_rnn_layers=1, rnn_units=16,
        max_diffusion_step=1, input_dim=8, num_classes=4,
    ).finalize()
    bundle = build_model(cfg_cls)
    feats = rng0.randn(n, t, 19, 8).astype(np.float32)
    lens = rng0.randint(1, t + 1, n).astype(np.int32)
    for i in range(n):  # zero-pad beyond the true length
        feats[i, lens[i]:] = 0.0
    cache = DeviceDatasetCache(feats, rng0.randint(0, 4, n).astype(
        np.float32), t, seq_lengths=lens)
    run_one(cache, supervised_loss_fn(bundle, "classification",
                                      input_pipeline=pipe,
                                      cache_gather=gather), False)


def test_rotating_cache_eval_matches_resident(corpus):
    """Beyond-HBM rotating cache (3 forced shards, double-buffered
    prefetch) evaluates identically to the fits-in-HBM resident cache —
    same device tail, same batch/mask policy, shard boundaries invisible."""
    import jax
    import logging

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_detection
    from eeg_gnn_tpu.data.device_cache import build_detection_cache
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.data.rotating_cache import build_rotating_cache
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        do_train=True, task="detection", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, num_classes=1,
        train_batch_size=4, test_batch_size=4, num_epochs=1,
    ).finalize()
    common = _common(corpus)
    common.update(train_batch_size=4, test_batch_size=4)
    loaders, _, scaler = load_dataset_detection(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=False,
        **common)
    _, plain, _ = load_dataset_detection(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, build_loaders=False,
        **common)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    resident = {"dev": build_detection_cache(plain["dev"], 12)}
    rotating = {"dev": build_rotating_cache(plain["dev"], 12, "detection",
                                            min_shards=3)}
    assert rotating["dev"].num_shards == 3
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    log = logging.getLogger("test_device_cache")

    class _NullTbx:
        def add_scalar(self, *a, **k):
            pass

    a = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle,
                input_pipeline=pipeline, device_caches=resident)
    b = Trainer(cfg, loaders, scaler, log, _NullTbx(), bundle=bundle,
                input_pipeline=pipeline, device_caches=rotating)
    ra = a.evaluate(params, mstate, "dev")
    rb = b.evaluate(params, mstate, "dev")
    assert abs(ra["loss"] - rb["loss"]) < 1e-5
    assert abs(ra["auroc"] - rb["auroc"]) < 1e-9
    assert ra["acc"] == rb["acc"]


def test_rotating_cache_trains(corpus, tmp_path):
    """One epoch of rotating-cache training: every clip visited once
    (step counter), loss finite, params move."""
    import jax
    import logging

    import jax.numpy as jnp
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_detection
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.data.rotating_cache import build_rotating_cache
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        do_train=True, task="detection", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, num_classes=1,
        train_batch_size=4, test_batch_size=4, num_epochs=1, patience=5,
        data_augment=True,
    ).finalize()
    common = _common(corpus)
    common.update(train_batch_size=4, test_batch_size=4)
    loaders, _, scaler = load_dataset_detection(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=True,
        **common)
    _, plain, _ = load_dataset_detection(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, build_loaders=False,
        **common)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=True,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    caches = {s: build_rotating_cache(plain[s], 12, "detection",
                                      min_shards=2)
              for s in plain}
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    log = logging.getLogger("test_device_cache")

    steps_logged = []

    class _Tbx:
        def add_scalar(self, tag, value, step):
            if tag == "train/Loss":
                steps_logged.append(step)
                assert np.isfinite(value)

    tr = Trainer(cfg, loaders, scaler, log, _Tbx(), bundle=bundle,
                 input_pipeline=pipeline, device_caches=caches)
    params0 = jax.tree.map(np.asarray, params)  # donation-safe snapshot
    p1, _, _ = tr.train(params, mstate, str(tmp_path))
    assert steps_logged[-1] == len(plain["train"])  # every clip once
    moved = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(params0), jax.tree.leaves(p1)))
    assert moved


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


def test_mesh_build_uploads_sharded():
    """ADVICE r4 (high): a cache built with ``mesh=`` uploads row-sharded
    directly from host numpy — per-device shards hold 1/p of the (padded)
    split, array contents match the post-hoc shard_cache path, and
    shard_cache passes an already-sharded cache through unchanged."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.device_cache import shard_cache
    from eeg_gnn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("data:8")
    n, t = 19, 3  # 19 rows -> padded to 24, 3 per device
    rng0 = np.random.RandomState(0)
    feats = rng0.randn(n, t, 19, 8).astype(np.float32)
    labels = (rng0.rand(n) > 0.5).astype(np.float32)
    lens = np.full((n,), t, np.int32)

    built = DeviceDatasetCache(feats, labels, seq_len=t,
                               seq_lengths=lens, mesh=mesh)
    oracle = shard_cache(
        DeviceDatasetCache(feats, labels, seq_len=t, seq_lengths=lens),
        mesh)

    assert built.num_clips == n
    assert built.x.shape[0] == 24
    # every device holds exactly one 1/p row block
    for arr in (built.x, built.y, built.seq):
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {arr.shape[0] // 8}
    np.testing.assert_array_equal(np.asarray(built.x), np.asarray(oracle.x))
    np.testing.assert_array_equal(np.asarray(built.y), np.asarray(oracle.y))
    np.testing.assert_array_equal(np.asarray(built.seq),
                                  np.asarray(oracle.seq))
    # idempotent: shard_cache must not re-pad/re-place a mesh-built cache
    assert shard_cache(built, mesh) is built

    # bf16 storage casts on HOST (ml_dtypes) before the sharded device_put
    b16 = DeviceDatasetCache(feats, labels, seq_len=t,
                             storage_dtype="bfloat16", mesh=mesh)
    assert b16.x.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b16.x, np.float32)[:n],
        feats.astype(jnp.bfloat16).astype(np.float32), rtol=0, atol=0)


def test_rotating_cache_trains_on_mesh(corpus, tmp_path):
    """VERDICT r4 #3 (beyond-HBM splits on a mesh): rotating cache with
    ROW-SHARDED slabs over a 4-device data mesh — one epoch visits every
    clip exactly once, losses finite, params move, and the first step
    reproduces the resident mesh-cache step fed the same rows."""
    import jax
    import logging

    import jax.numpy as jnp
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_detection
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.data.rotating_cache import build_rotating_cache
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.parallel.mesh import make_mesh
    from eeg_gnn_tpu.train.trainer import Trainer

    mesh = make_mesh("data:4")
    cfg = ExperimentConfig(
        do_train=True, task="detection", model_name="dcrnn",
        graph_type="combined", max_seq_len=12, num_rnn_layers=1,
        rnn_units=16, max_diffusion_step=1, num_classes=1,
        train_batch_size=4, test_batch_size=4, num_epochs=1, patience=5,
    ).finalize()
    common = _common(corpus)
    common.update(train_batch_size=4, test_batch_size=4)
    loaders, _, scaler = load_dataset_detection(
        adj_mat_dir=corpus["adj_mat_dir"], graph_type="combined",
        filter_type=cfg.filter_type, standardize=True, augmentation=False,
        **common)
    _, plain, _ = load_dataset_detection(
        adj_mat_dir=None, graph_type=None, filter_type=cfg.filter_type,
        standardize=False, augmentation=False, build_loaders=False,
        **common)
    pipeline = make_device_pipeline(
        graph_type="combined", filter_type=cfg.filter_type, top_k=None,
        use_fft=True, time_step_size=1, scaler=scaler, augment=False,
        adj_mat_dir=corpus["adj_mat_dir"], num_nodes=19)
    caches = {"train": build_rotating_cache(
        plain["train"], 12, "detection", min_shards=2, mesh=mesh)}
    cache = caches["train"]
    assert cache.num_shards == 2
    assert cache.shard_rows % 4 == 0  # equal per-device blocks
    slab = cache.prefetch(0)
    # slabs are row-sharded over the data axis at upload
    assert len({s.data.shape[0] for s in slab["x"].addressable_shards}) == 1
    assert next(iter(slab["x"].addressable_shards)).data.shape[0] == \
        cache.shard_rows // 4

    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    log = logging.getLogger("test_device_cache")

    steps_logged = []

    class _Tbx:
        def add_scalar(self, tag, value, step):
            if tag == "train/Loss":
                steps_logged.append(step)
                assert np.isfinite(value)

    tr = Trainer(cfg, loaders, scaler, log, _Tbx(), bundle=bundle,
                 mesh=mesh, input_pipeline=pipeline, device_caches=caches)
    assert tr.cache_is_mesh and tr._rotating
    params0 = jax.tree.map(np.asarray, params)
    p1, _, _ = tr.train(params, mstate, str(tmp_path))
    assert steps_logged[-1] == len(plain["train"])  # every clip once
    moved = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(params0), jax.tree.leaves(p1)))
    assert moved


def test_cli_hbm_cache_classification_individual(corpus, tmp_path):
    """--hbm_cache on classification x individual (the last task x graph
    cell, VERDICT r4 #5): length-masked on-device xcorr graphs from the
    cached padded clips, end-to-end through the CLI."""
    from eeg_gnn_tpu.cli.train import main

    res = main([
        "--input_dir", corpus["input_dir"],
        "--raw_data_dir", corpus["raw_data_dir"],
        "--marker_dir", corpus["marker_dir"],
        "--save_dir", str(tmp_path), "--do_train", "--use_fft",
        "--data_augment", "--hbm_cache",
        "--model_name", "dcrnn", "--task", "classification",
        "--graph_type", "individual", "--top_k", "3",
        "--max_seq_len", "12",
        "--num_rnn_layers", "1", "--rnn_units", "16",
        "--max_diffusion_step", "1", "--num_classes", "4",
        "--train_batch_size", "8", "--test_batch_size", "8",
        "--num_epochs", "1", "--num_workers", "1",
    ])
    assert np.isfinite(res["loss"]) and "F1" in res
