"""Beyond-HBM rotating-cache throughput on the target host (round-3
verdict item 4's measurement).

Forces the flagship detection split into K > 1 HBM shards
(``min_shards``) and measures sustained training clips/s with the
double-buffered rotation, against the two relevant ceilings:

- the RESIDENT fits-in-HBM cached path, same session (the ideal);
- the LINK ROOFLINE ``H2D_bandwidth / bytes_per_clip`` — on a host whose
  link is slower than the chip eats clips, rotation can never beat this
  no matter the software (the double buffer hides latency, not
  bandwidth).

The honest figure of merit is overlap efficiency =
achieved / min(resident, roofline): how close the rotation gets to
whichever wall binds. On fast-PCIe production hosts the roofline sits
far above the step rate and the rotating cache converges to the resident
number; on this axon-tunnel host (~0.03-0.04 GB/s H2D) the roofline is
the binding wall and the measured number documents the link, not the
design (benchmarks/NOTES.md "End-to-end input pipeline").

Writes benchmarks/rotating_cache_results.json (gated by
tests/test_artifacts.py). Run serially:
    python benchmarks/rotating_cache_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "rotating_cache_results.json")

T, N, D = 60, 19, 100
NUM_CLIPS = 512
BATCH = 32
MIN_SHARDS = 4
DTYPE = "bfloat16"


def _setup():
    import jax

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.constants import get_swap_pairs  # noqa: F401
    from eeg_gnn_tpu.data.device_pipeline import (
        DevicePipeline,
        reflection_permutation,
    )
    from eeg_gnn_tpu.graphs import compute_supports
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import (
        make_cached_train_step,
        supervised_loss_fn,
    )
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    feats = rng.randn(NUM_CLIPS, T, N, D).astype(np.float32)
    labels = (rng.rand(NUM_CLIPS) > 0.5).astype(np.float32)

    adj = np.abs(rng.rand(N, N)).astype(np.float32)
    adj = (adj + adj.T) / 2
    np.fill_diagonal(adj, 1.0)
    sup = jnp.asarray(np.stack(compute_supports(adj, "laplacian")))
    pipeline = DevicePipeline(
        time_step_size=1, use_fft=True, graph_type="combined",
        filter_type="laplacian", top_k=None, mean=0.0, std=1.0,
        augment=True, node_perm=jnp.asarray(reflection_permutation(N)),
        dist_supports=sup, dist_supports_swapped=sup,
        reflect_invariant=True)

    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=T, dtype=DTYPE,
                           batch_tile=32).finalize()
    bundle = build_model(cfg)
    params, ms = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    opt = optimizer.init(params)
    loss_fn = supervised_loss_fn(bundle, "detection",
                                 input_pipeline=pipeline)
    step = make_cached_train_step(loss_fn, optimizer, T, BATCH,
                                  donate=False)
    return feats, labels, params, ms, opt, step


def bench_rotating(feats, labels, params, ms, opt, step, epochs=3):
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.rotating_cache import RotatingDeviceCache

    cache = RotatingDeviceCache(feats, labels, T, storage_dtype=DTYPE,
                                min_shards=MIN_SHARDS)
    rng = np.random.RandomState(1)
    key_host = 0

    def run_epoch():
        nonlocal params, ms, opt, key_host
        import jax

        order = cache.epoch_shard_order(rng)
        slab_next = cache.prefetch(order[0])
        last = None
        for si, sid in enumerate(order):
            slab = slab_next
            if si + 1 < len(order):
                slab_next = cache.prefetch(order[si + 1])
            perm, valid_vec = cache.shard_plan(sid, BATCH, True, rng)
            k = len(valid_vec)
            key = jax.random.PRNGKey(key_host)
            key_host += 1
            counter, seen = jnp.int32(0), jnp.int32(0)
            losses = jnp.zeros((k,), jnp.float32)
            perm_d, valid_d = jnp.asarray(perm), jnp.asarray(valid_vec)
            for _ in range(k):
                params, ms, opt, key, counter, seen, losses = step(
                    params, ms, opt, key, counter, seen, losses, slab,
                    perm_d, valid_d)
            last = losses
        return float(last[-1])  # D2H sync (axon: block_until_ready lies)

    run_epoch()  # compile + first-touch
    t0 = time.perf_counter()
    for _ in range(epochs):
        loss = run_epoch()
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return NUM_CLIPS * epochs / dt, cache.num_shards


def bench_resident(feats, labels, params, ms, opt, step, epochs=3):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.device_cache import DeviceDatasetCache

    cache = DeviceDatasetCache(feats, labels, T, storage_dtype=DTYPE)
    cache_d = {"x": cache.x, "y": cache.y, "seq": None}
    rng = np.random.RandomState(1)

    def run_epoch(key_i):
        nonlocal params, ms, opt
        perm, valid_vec = cache.epoch_plan(BATCH, True, rng)
        k = len(valid_vec)
        key = jax.random.PRNGKey(key_i)
        counter, seen = jnp.int32(0), jnp.int32(0)
        losses = jnp.zeros((k,), jnp.float32)
        perm_d, valid_d = jnp.asarray(perm), jnp.asarray(valid_vec)
        for _ in range(k):
            params, ms, opt, key, counter, seen, losses = step(
                params, ms, opt, key, counter, seen, losses, cache_d,
                perm_d, valid_d)
        return float(losses[-1])

    run_epoch(0)
    t0 = time.perf_counter()
    for i in range(epochs):
        loss = run_epoch(i + 1)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return NUM_CLIPS * epochs / dt


def bench_link_gbs(mbytes=58.4, iters=8):
    """PIPELINED H2D bandwidth: issue all transfers back-to-back, sync
    once at the end — what the double-buffered rotation actually sees
    (a sync-per-transfer measurement includes one round-trip latency per
    chunk and under-reports the tunnel ~2x)."""
    import jax
    import jax.numpy as jnp

    n = int(mbytes * 1e6 / 4)
    rng = np.random.RandomState(0)
    hosts = [rng.randn(n).astype(np.float32) for _ in range(iters)]
    sink = jax.jit(lambda a: jnp.float32(a[0]))
    float(sink(jax.device_put(hosts[0])))  # warm
    t0 = time.perf_counter()
    devs = [jax.device_put(h) for h in hosts]  # async enqueue
    for d in devs:
        float(sink(d))  # real D2H sync per buffer (axon)
    return mbytes * iters / (time.perf_counter() - t0) / 1e3


def main():
    feats, labels, params, ms, opt, step = _setup()
    resident = bench_resident(feats, labels, params, ms, opt, step)
    rotating, shards = bench_rotating(feats, labels, params, ms, opt, step)
    link = bench_link_gbs()
    bytes_per_clip = T * N * D * (2 if DTYPE == "bfloat16" else 4)
    roofline = link * 1e9 / bytes_per_clip
    binding = min(resident, roofline)
    out = {
        "config": {"num_clips": NUM_CLIPS, "batch": BATCH, "shards": shards,
                   "dtype": DTYPE, "bytes_per_clip": bytes_per_clip},
        "resident_clips_per_s": round(resident, 1),
        "rotating_clips_per_s": round(rotating, 1),
        "h2d_gbs": round(link, 4),
        "link_roofline_clips_per_s": round(roofline, 1),
        "binding_wall": "link" if roofline < resident else "compute",
        "overlap_efficiency": round(rotating / binding, 3),
        "note": "overlap_efficiency = achieved / min(resident ceiling, "
                "link roofline); the double buffer hides latency, not "
                "bandwidth — on this axon-tunnel host the link binds.",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
