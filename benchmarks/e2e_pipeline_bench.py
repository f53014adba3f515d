"""End-to-end input-pipeline benchmark: sustained train clips/s for FULL
epochs — loader + host work + H2D + fused step — vs the step-only number.

Round-2 verdict item 5: NOTES.md names input pipeline as the pod-scale
binding constraint; this measures whether this host actually keeps the
chip busy at B=128 on the flagship 60 s detection shape, for both
production input paths:

- ``clipstore_features``: the AOT-cache path (reference ``--preproc_dir``
  semantics, dataloader_detection.py:356-416 without the per-sample FFT):
  featurized clips live in one mmap'd ClipStore, batches are assembled by
  the native C++ gather, host-side augmentation (reflect + additive log
  scale) runs on the gathered batch, then H2D + train step. Features are
  cast to the compute dtype on host first — at bf16 this HALVES tunnel
  bytes, and the model's first op casts x to bf16 anyway.
- ``raw_pipeline``: the raw-clip path: the store holds raw (C, L) signal,
  the host only gathers, and FFT/augment/standardize/graph-choice run
  inside the jitted step (data/device_pipeline.py).

Both paths use the flagship Dist-DCRNN configuration (shared distance
supports resident on device — no per-clip support H2D), double-buffered
by construction: gathers run in a background thread, JAX dispatch is
async, and the loop only syncs (real D2H: ``float(loss)``) at epoch ends.

Run serially (nothing else on this 2-CPU host):  python benchmarks/e2e_pipeline_bench.py
Appends results to benchmarks/e2e_pipeline_results.json.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
T = 60
N = 19
D = 100
EPOCH_BATCHES = 10          # distinct clips per epoch = 1280
EPOCHS = 6                  # timed epochs (plus 1 warmup epoch)
STORE_DIR = "/tmp/e2e_bench_store"
OUT = os.path.join(os.path.dirname(__file__), "e2e_pipeline_results.json")


def _build_stores():
    """Materialize feature + raw clip stores once (content is synthetic;
    the bench measures byte movement, not learning)."""
    from eeg_gnn_tpu.constants import FREQUENCY
    from eeg_gnn_tpu.data.clipstore import write_clipstore

    os.makedirs(STORE_DIR, exist_ok=True)
    n_clips = BATCH * EPOCH_BATCHES
    rng = np.random.RandomState(0)
    fpath = os.path.join(STORE_DIR, "features.ecs")
    if not os.path.exists(fpath):
        # features flattened to ClipStore's (clips, channels, samples)
        # layout as (n, T*N, D); standardized AOT (scaler folded in)
        feats = rng.randn(n_clips, T * N, D).astype(np.float32)
        write_clipstore(fpath, feats,
                        labels=rng.randint(0, 2, n_clips).astype(np.float32))
    rpath = os.path.join(STORE_DIR, "raw.ecs")
    if not os.path.exists(rpath):
        raw = (10.0 * rng.randn(n_clips, N, T * FREQUENCY)).astype(np.float32)
        write_clipstore(rpath, raw,
                        labels=rng.randint(0, 2, n_clips).astype(np.float32))
    return fpath, rpath


def _distance_adj():
    """Synthetic shared distance graph: ONE (N, N) adjacency."""
    rng = np.random.RandomState(1)
    coords = rng.randn(N, 3)
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    adj = np.exp(-np.square(d / d.std())).astype(np.float32)
    adj[d > np.median(d)] = 0.0
    np.fill_diagonal(adj, 1.0)
    return adj


def _flagship_step(dtype: str, input_pipeline=None):
    """Jitted flagship train step + resident shared supports."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=T, dtype=dtype,
                           batch_tile=32).finalize()
    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    opt_state = optimizer.init(params)
    loss_fn = supervised_loss_fn(bundle, "detection",
                                 input_pipeline=input_pipeline)
    train_step = make_train_step(loss_fn, optimizer, donate=False)

    supports = jnp.asarray(
        np.stack(compute_supports(_distance_adj(), "laplacian")))
    return train_step, params, model_state, opt_state, supports


def _reflect_perm():
    from eeg_gnn_tpu.data.device_pipeline import reflection_permutation

    return reflection_permutation(N)


class _Prefetcher:
    """Background-thread batch assembly with a bounded queue (depth 3):
    models the DataLoader's prefetch so gather/augment overlap H2D+step."""

    def __init__(self, make_batch, n_batches, depth=3):
        self.q = queue.Queue(maxsize=depth)
        self.n = n_batches

        def run():
            for i in range(self.n):
                self.q.put(make_batch(i))

        self.t = threading.Thread(target=run, daemon=True)
        self.t.start()

    def __iter__(self):
        for _ in range(self.n):
            yield self.q.get()
        self.t.join()


def bench_step_only(dtype: str):
    import jax
    import jax.numpy as jnp

    step, params, ms, opt, supports = _flagship_step(dtype)
    rng = np.random.RandomState(0)
    x = rng.randn(BATCH, T, N, D).astype(
        np.float32 if dtype == "float32" else jnp.bfloat16)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(rng.randint(0, 2, BATCH).astype(np.float32)),
        "seq_lengths": jnp.full((BATCH,), T, jnp.int32),
        "supports": supports,
    }
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        params, ms, opt, loss = step(params, ms, opt, batch, key)
    float(loss)
    iters = EPOCH_BATCHES * EPOCHS
    t0 = time.perf_counter()
    for _ in range(iters):
        params, ms, opt, loss = step(params, ms, opt, batch, key)
    assert np.isfinite(float(loss))
    dt = time.perf_counter() - t0
    return BATCH * iters / dt


def bench_clipstore_features(dtype: str, augment=True):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.clipstore import ClipStore

    fpath, _ = _build_stores()
    store = ClipStore(fpath)
    step, params, ms, opt, supports = _flagship_step(dtype)
    perm = _reflect_perm()
    np_dtype = np.float32 if dtype == "float32" else jnp.bfloat16
    host_rng = np.random.RandomState(0)
    order = np.arange(len(store))

    def make_batch(i):
        idx = order[i * BATCH:(i + 1) * BATCH]
        x = store.gather(idx).reshape(BATCH, T, N, D)
        if augment:
            # reference host augmentation on the AOT path: reflect +
            # additive log amplitude (dataloader_detection.py:233-256)
            refl = host_rng.rand(BATCH) < 0.5
            x[refl] = x[refl][:, :, perm, :]
            x += np.log(host_rng.uniform(0.8, 1.2, BATCH)
                        ).astype(np.float32)[:, None, None, None]
        y = np.asarray(store.labels)[idx].astype(np.float32)
        return x.astype(np_dtype), y

    key = jax.random.PRNGKey(0)
    lengths = jnp.full((BATCH,), T, jnp.int32)

    def run_epoch(shuffle_seed):
        host_rng2 = np.random.RandomState(shuffle_seed)
        host_rng2.shuffle(order)
        nonlocal params, ms, opt
        loss = None
        for x, y in _Prefetcher(make_batch, EPOCH_BATCHES):
            batch = {"x": jnp.asarray(x), "y": jnp.asarray(y),
                     "seq_lengths": lengths, "supports": supports}
            params, ms, opt, loss = step(params, ms, opt, batch, key)
        return float(loss)  # real D2H sync (axon: block_until_ready lies)

    run_epoch(0)  # warmup epoch (compile + cache heat)
    t0 = time.perf_counter()
    for e in range(EPOCHS):
        loss = run_epoch(e + 1)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    store.close()
    return BATCH * EPOCH_BATCHES * EPOCHS / dt


def bench_raw_pipeline(dtype: str):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.clipstore import ClipStore
    from eeg_gnn_tpu.data.device_pipeline import DevicePipeline
    from eeg_gnn_tpu.graphs import compute_supports

    _, rpath = _build_stores()
    store = ClipStore(rpath)

    # fused on-device pipeline: FFT + augment + standardize + support choice
    class _Scaler:
        mean, std = 0.0, 1.0

    # the same shared distance graph as the model step
    sup_np = np.stack(compute_supports(_distance_adj(), "laplacian"))
    pipeline = DevicePipeline(
        time_step_size=1, use_fft=True, graph_type="combined",
        filter_type="laplacian", top_k=None, mean=0.0, std=1.0,
        augment=True, node_perm=jnp.asarray(_reflect_perm()),
        dist_supports=jnp.asarray(sup_np),
        dist_supports_swapped=jnp.asarray(sup_np),
        reflect_invariant=True,
    )
    step, params, ms, opt, _ = _flagship_step(dtype, input_pipeline=pipeline)
    order = np.arange(len(store))

    def make_batch(i):
        idx = order[i * BATCH:(i + 1) * BATCH]
        raw = store.gather(idx)
        y = np.asarray(store.labels)[idx].astype(np.float32)
        return raw, y

    key = jax.random.PRNGKey(0)
    lengths = jnp.full((BATCH,), T, jnp.int32)

    def run_epoch(shuffle_seed):
        rng2 = np.random.RandomState(shuffle_seed)
        rng2.shuffle(order)
        nonlocal params, ms, opt
        loss = None
        for raw, y in _Prefetcher(make_batch, EPOCH_BATCHES):
            batch = {"raw": jnp.asarray(raw), "y": jnp.asarray(y),
                     "seq_lengths": lengths, "supports": None}
            params, ms, opt, loss = step(params, ms, opt, batch, key)
        return float(loss)

    run_epoch(0)
    t0 = time.perf_counter()
    for e in range(EPOCHS):
        loss = run_epoch(e + 1)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    store.close()
    return BATCH * EPOCH_BATCHES * EPOCHS / dt


def bench_hbm_cache(dtype: str):
    """The fix for link-bound hosts: whole split resident in HBM
    (data/device_cache.py) — per-step H2D is a (B,) index vector; gather +
    augment + standardize + supports fuse into the jitted step."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.clipstore import ClipStore
    from eeg_gnn_tpu.data.device_cache import DeviceDatasetCache
    from eeg_gnn_tpu.data.device_pipeline import DevicePipeline
    from eeg_gnn_tpu.graphs import compute_supports

    fpath, _ = _build_stores()
    store = ClipStore(fpath)
    feats = np.asarray(store.gather(np.arange(len(store)))).reshape(
        -1, T, N, D)
    # tile to a realistic flagship epoch length (~30 batches: TUSZ
    # balanced train is ~3.7k clips at B=128) — the epoch-boundary loss
    # D2H costs one tunnel RTT and K=10 would overstate it 3x
    reps = 3
    feats = np.tile(feats, (reps, 1, 1, 1))
    labels = np.tile(np.asarray(store.labels), reps)
    cache = DeviceDatasetCache(
        feats, labels, T,
        storage_dtype="bfloat16" if dtype == "bfloat16" else "float32")
    store.close()

    sup_np = np.stack(compute_supports(_distance_adj(), "laplacian"))
    pipeline = DevicePipeline(
        time_step_size=1, use_fft=True, graph_type="combined",
        filter_type="laplacian", top_k=None, mean=0.0, std=1.0,
        augment=True, node_perm=jnp.asarray(_reflect_perm()),
        dist_supports=jnp.asarray(sup_np),
        dist_supports_swapped=jnp.asarray(sup_np),
        reflect_invariant=True,
    )
    # exactly Trainer's cache branch: the epoch permutation uploads once,
    # then steady-state dispatches carry zero host data (the step slices
    # its batch / splits its key / scatters its loss on device); one D2H
    # of the loss buffer per epoch
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import (
        make_cached_train_step,
        supervised_loss_fn,
    )

    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=T, dtype=dtype,
                           batch_tile=32).finalize()
    bundle = build_model(cfg)
    params, ms = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    opt = optimizer.init(params)
    loss_fn = supervised_loss_fn(bundle, "detection",
                                 input_pipeline=pipeline)
    step = make_cached_train_step(loss_fn, optimizer, T, BATCH,
                                  donate=False)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    cache_d = {"x": cache.x, "y": cache.y, "seq": cache.seq}

    def run_epoch():
        nonlocal params, ms, opt
        perm, valid_vec = cache.epoch_plan(BATCH, True, rng)
        perm_d = jnp.asarray(perm)
        valid_d = jnp.asarray(valid_vec)
        counter = jnp.int32(0)
        seen = jnp.int32(0)
        losses = jnp.zeros((len(valid_vec),), jnp.float32)
        epoch_key = key
        for _ in range(len(valid_vec)):
            params, ms, opt, epoch_key, counter, seen, losses = step(
                params, ms, opt, epoch_key, counter, seen, losses,
                cache_d, perm_d, valid_d)
        return float(losses[-1])

    run_epoch()
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        loss = run_epoch()
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return BATCH * EPOCH_BATCHES * reps * EPOCHS / dt


def bench_h2d(mbytes=58.4, iters=20):
    """Isolated H2D bandwidth of the tunnel at the feature-batch size."""
    import jax
    import jax.numpy as jnp

    n = int(mbytes * 1e6 / 4)
    host = np.random.RandomState(0).randn(n).astype(np.float32)
    sink = jax.jit(lambda a: jnp.float32(a[0]))  # force materialization
    float(sink(jnp.asarray(host)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(sink(jnp.asarray(host)))
    dt = time.perf_counter() - t0
    return mbytes * iters / dt / 1e3  # GB/s (sync-per-transfer: lower bound)


PATHS = {
    "step": ("step_only_clips_per_s", bench_step_only),
    "features": ("clipstore_features_clips_per_s", bench_clipstore_features),
    "raw": ("raw_pipeline_clips_per_s", bench_raw_pipeline),
    "hbm": ("hbm_cache_clips_per_s", bench_hbm_cache),
}


def main(argv=None):
    """Optional argv: subset of path names (step/features/raw/hbm) to run;
    results merge into the existing OUT json (same-session subsets)."""
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    selected = [a for a in argv if a in PATHS] or list(PATHS)

    results = {"batch": BATCH, "epoch_batches": EPOCH_BATCHES,
               "epochs": EPOCHS, "shape": [T, N, D]}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results.update(json.load(f))

    if not argv:  # full run: include the link micro-measurement
        print(f"# t={time.time():.0f} h2d...", file=sys.stderr, flush=True)
        results["h2d_sync_GBps"] = round(bench_h2d(), 2)
        print(json.dumps({"h2d_sync_GBps": results["h2d_sync_GBps"]}),
              flush=True)

    for dtype in ("bfloat16", "float32"):
        r = results.setdefault(dtype, {})
        for name in selected:
            key, fn = PATHS[name]
            print(f"# t={time.time():.0f} {dtype} {name}...",
                  file=sys.stderr, flush=True)
            r[key] = round(fn(dtype), 1)
            print(json.dumps({dtype: {key: r[key]}}), flush=True)
        base = r.get("step_only_clips_per_s")
        if base:
            for name, (key, _) in PATHS.items():
                if name != "step" and key in r:
                    r[key.replace("_clips_per_s", "_efficiency")] = round(
                        r[key] / base, 3)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
