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

    out = os.path.join(os.path.dirname(__file__), "ssl_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
