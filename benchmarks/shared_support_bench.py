"""Shared-support (true Dist-DCRNN flagship) train-step throughput: ONE
(N, N) distance-graph support broadcast over the batch — the kernels read
one operator slab for every clip (no per-clip operator stacks at all).

Writes benchmarks/shared_support_results.json. Run from the repo root,
serially:  python benchmarks/shared_support_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "shared_support_results.json")

T, N = 60, 19
POINTS = [("float32", 128), ("bfloat16", 128),
          ("float32", 512), ("bfloat16", 512)]


def bench_shared(dtype, batch, tile=36, iters=60, warmup=8):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=T, dtype=dtype,
                           batch_tile=tile).finalize()
    bundle = build_model(cfg)
    params, ms = bundle.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    os_ = opt.init(params)
    loss_fn = supervised_loss_fn(bundle, "detection")

    rng = np.random.RandomState(0)
    adj = np.abs(rng.rand(N, N)).astype(np.float32)
    adj = (adj + adj.T) / 2
    np.fill_diagonal(adj, 1.0)
    batch_dict = {
        "x": jnp.asarray(rng.randn(batch, T, N, 100), jnp.float32),
        "y": jnp.asarray(rng.randint(0, 2, batch), jnp.float32),
        "seq_lengths": jnp.full((batch,), T, jnp.int64),
        # ONE shared support slab (1, N, N)
        "supports": jnp.asarray(
            np.stack(compute_supports(adj, "laplacian"))),
    }
    step = make_train_step(loss_fn, opt, donate=False)
    key = jax.random.PRNGKey(0)
    st = [params, ms, os_]
    for _ in range(warmup):
        st[0], st[1], st[2], loss = step(st[0], st[1], st[2], batch_dict,
                                         key)
    float(loss)  # real D2H sync (axon)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            st[0], st[1], st[2], loss = step(st[0], st[1], st[2],
                                             batch_dict, key)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(float(loss))
    return batch * iters / best


def main():
    points = []
    for dtype, batch in POINTS:
        clips = bench_shared(dtype, batch)
        points.append({"dtype": dtype, "batch": batch,
                       "clips_per_s": round(clips),
                       "step_ms": round(1000.0 * batch / clips, 2)})
        print(json.dumps(points[-1]), flush=True)
    out = {
        "note": "Dist-DCRNN flagship with the SHARED distance-graph "
                "support ((1,N,N) broadcast): the kernels read ONE "
                "operator slab for every clip. Round-4 x-in-kernel path, "
                "batch_tile 36. Same session as each other; compare "
                "within.",
        "config": {"t": T, "layers": 2, "rnn_units": 64, "k": 2,
                   "batch_tile": 36, "device": "TPU v5 lite"},
        "points": points,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
