"""SSL (next-time-prediction) train-step benchmark — the reference's
heaviest loop (model/model.py:182-202, sequential decoder feedback).

Measures the full jitted train step (fwd enc+dec, masked-MAE-quirk loss,
bwd, clip+Adam) for the paper SSL config (3 layers, T_in 60 -> T_out 12)
and records clips/s. The decoder runs the operator-stacked cell (Chebyshev
operators hoisted out of the feedback scan, models/dcgru.py); the encoder
runs the whole-sequence Pallas recurrence.

Run: python benchmarks/ssl_bench.py [--batch 128]
Writes benchmarks/ssl_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t_in", type=int, default=60)
    ap.add_argument("--t_out", type=int, default=12)
    ap.add_argument("--iters", type=int, default=30)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports_jnp
    from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, ssl_loss_fn

    b = ns.batch
    rng = np.random.RandomState(0)
    results = {"config": {"batch": b, "t_in": ns.t_in, "t_out": ns.t_out,
                          "layers": 3, "device": str(jax.devices()[0])}}

    for dtype in ("float32", "bfloat16"):
        cfg = ExperimentConfig(
            do_train=True, task="SS pre-training", graph_type="combined",
            num_rnn_layers=3, max_seq_len=ns.t_in,
            output_seq_len=ns.t_out, use_curriculum_learning=True,
            dtype=dtype).finalize()
        mcfg = cfg.dcrnn_config()
        params = init_next_time_pred_model(jax.random.PRNGKey(0), mcfg)
        optimizer = make_optimizer(5e-4, 5e-4, 5.0, 350, 100)
        opt_state = optimizer.init(params)
        loss_fn = ssl_loss_fn(mcfg, jnp.float32(0.0), jnp.float32(1.0))
        step = make_train_step(loss_fn, optimizer, donate=False,
                               has_batches_seen=True)

        x = jnp.asarray(rng.randn(b, ns.t_in, 19, 100), jnp.float32)
        y = jnp.asarray(rng.randn(b, ns.t_out, 19, 100), jnp.float32)
        adj = np.abs(rng.rand(b, 19, 19)).astype(np.float32)
        sup = compute_supports_jnp(jnp.asarray(adj), "laplacian")
        batch = {"x": x, "y": y, "supports": sup}
        key = jax.random.PRNGKey(0)

        for _ in range(5):
            params, _, opt_state, loss = step(params, {}, opt_state, batch,
                                              key, jnp.int32(0))
        float(loss)  # real D2H sync (axon tunnel)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ns.iters):
                params, _, opt_state, loss = step(params, {}, opt_state,
                                                  batch, key, jnp.int32(0))
            float(loss)
            best = min(best, time.perf_counter() - t0)
        clips = b * ns.iters / best
        results[dtype] = {"clips_per_s": round(clips, 1),
                          "step_ms": round(1000.0 * b / clips, 3)}
        print(f"ssl {dtype}: {clips:.0f} clips/s "
              f"({1000.0 * b / clips:.2f} ms/step)", flush=True)

        # HBM-cached SSL path end-to-end (round-3 verdict item 3's
        # measurement): the split resident on device, per-step gather +
        # joint augment + shared supports fused into the step
        # (ssl_loss_fn cache branch). Steady-state epochs, upload
        # excluded; efficiency is vs the step-only ceiling above.
        from eeg_gnn_tpu.data.device_cache import DeviceDatasetCache
        from eeg_gnn_tpu.data.device_pipeline import (
            DevicePipeline,
            reflection_permutation,
        )
        from eeg_gnn_tpu.graphs import compute_supports
        from eeg_gnn_tpu.train.step import make_cached_train_step

        n_clips = 512
        fx = rng.randn(n_clips, ns.t_in, 19, 100).astype(np.float32)
        fy = rng.randn(n_clips, ns.t_out, 19, 100).astype(np.float32)
        storage = "bfloat16" if dtype == "bfloat16" else "float32"
        cache = DeviceDatasetCache(fx, fy, ns.t_in, storage_dtype=storage)
        adj1 = np.abs(rng.rand(19, 19)).astype(np.float32)
        adj1 = (adj1 + adj1.T) / 2
        np.fill_diagonal(adj1, 1.0)
        sup1 = jnp.asarray(np.stack(compute_supports(adj1, "laplacian")))
        pipeline = DevicePipeline(
            time_step_size=1, use_fft=True, graph_type="combined",
            filter_type="laplacian", top_k=None, mean=0.0, std=1.0,
            augment=True, node_perm=jnp.asarray(reflection_permutation(19)),
            dist_supports=sup1, dist_supports_swapped=sup1,
            reflect_invariant=True)
        closs = ssl_loss_fn(mcfg, jnp.float32(0.0), jnp.float32(1.0),
                            input_pipeline=pipeline)
        cstep = make_cached_train_step(closs, optimizer, ns.t_in, b,
                                       has_batches_seen=True, donate=False)
        cache_d = {"x": cache.x, "y": cache.y, "seq": None}
        prng = np.random.RandomState(1)
        cparams = init_next_time_pred_model(jax.random.PRNGKey(0), mcfg)
        copt = optimizer.init(cparams)
        cms = {}

        def run_epoch(i):
            nonlocal cparams, cms, copt
            perm, valid_vec = cache.epoch_plan(b, True, prng)
            k = len(valid_vec)
            key2 = jax.random.PRNGKey(i)
            counter, seen = jnp.int32(0), jnp.int32(0)
            losses = jnp.zeros((k,), jnp.float32)
            perm_d, valid_d = jnp.asarray(perm), jnp.asarray(valid_vec)
            for _ in range(k):
                (cparams, cms, copt, key2, counter, seen,
                 losses) = cstep(cparams, cms, copt, key2, counter, seen,
                                 losses, cache_d, perm_d, valid_d)
            return float(losses[-1])  # D2H sync

        run_epoch(0)
        epochs = 4
        t0 = time.perf_counter()
        for i in range(epochs):
            run_epoch(i + 1)
        dt = time.perf_counter() - t0
        cclips = n_clips * epochs / dt
        results[dtype]["hbm_cache_clips_per_s"] = round(cclips, 1)
        results[dtype]["hbm_cache_efficiency"] = round(cclips / clips, 3)
        print(f"ssl {dtype} hbm_cache: {cclips:.0f} clips/s "
              f"({cclips / clips:.2f} of step-only)", flush=True)

    out = os.path.join(os.path.dirname(__file__), "ssl_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
