"""Serving-path benchmark: latency + throughput of the deployable
Predictor (eeg_gnn_tpu/serve.py) on the flagship detection model.

Three production shapes:

- **raw front door, B=1**: one raw (19, 60*200) EEG window -> seizure
  probability, FFT featurization + standardization + supports + model
  fused into ONE XLA program (a single device round trip) — the online
  serving latency point. On this remote-tunnel host the figure is
  dominated by per-dispatch transport, so the artifact records it
  honestly next to the device-only step estimate.
- **raw front door, batched**: offline/periodic scoring throughput.
- **featurized front door, batched**: the reference's eval-loop
  counterpart (train.py without --do_train runs its test loader at
  streaming-loader speed; here the features go straight to the chip).

Run: python benchmarks/serving_bench.py
Writes benchmarks/serving_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)


def main():
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.serve import Predictor

    t, n, d = 60, 19, 100
    rng = np.random.RandomState(0)
    results = {"config": {"t": t, "nodes": n, "input_dim": d,
                          "model": "dcrnn detection (2x64, K=2)",
                          "device": str(jax.devices()[0])}}

    # do_train=True only to satisfy the reference's eval-mode
    # checkpoint-required validation quirk; nothing here trains
    cfg = ExperimentConfig(
        do_train=True, task="detection", graph_type="individual",
        top_k=3, max_seq_len=t, num_rnn_layers=2, rnn_units=64,
        max_diffusion_step=2, num_classes=1, use_fft=True,
    ).finalize()
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    pipeline = make_device_pipeline(
        graph_type="individual", filter_type=cfg.filter_type, top_k=3,
        use_fft=True, time_step_size=1, scaler=None, augment=False,
        num_nodes=n)

    def timed(fn, *args, warmup=3, iters=20):
        for _ in range(warmup):
            fn(*args)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            # Predictor returns host numpy — the D2H is inside fn
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, out

    # raw front door, B=1 (online latency)
    p1 = Predictor(cfg, params, mstate, batch_size=1, pipeline=pipeline)
    raw1 = rng.randn(1, n, t * 200).astype(np.float32)
    lat, probs = timed(p1.predict_proba_raw, raw1)
    assert probs.shape == (1,) and np.isfinite(probs).all()
    results["raw_b1_latency_ms"] = round(1000 * lat, 3)

    # raw front door, batched (offline scoring)
    for b in (64, 256):
        pb = Predictor(cfg, params, mstate, batch_size=b,
                       pipeline=pipeline)
        rawb = rng.randn(b, n, t * 200).astype(np.float32)
        dt, probs = timed(pb.predict_proba_raw, rawb, iters=10)
        assert probs.shape == (b,) and np.isfinite(probs).all()
        results[f"raw_b{b}_clips_per_s"] = round(b / dt, 1)

    # featurized front door, batched, per-clip adjacency built on device
    b = 256
    pf = Predictor(cfg, params, mstate, batch_size=b, pipeline=pipeline)
    x = rng.randn(b, t, n, d).astype(np.float32)
    adj = np.abs(rng.rand(b, n, n)).astype(np.float32)
    dt, probs = timed(pf.predict_proba, x, None, None, adj, iters=10)
    assert probs.shape == (b,) and np.isfinite(probs).all()
    results[f"featurized_b{b}_clips_per_s"] = round(b / dt, 1)

    # device-resident variant: the same fused raw->probability program
    # with inputs already on device — separates the serving stack's real
    # capability (what a co-located host sustains once its ingest lands
    # the window in device memory) from this tunnel's 0.03 GB/s H2D
    import jax.numpy as jnp

    b = 256
    pb = Predictor(cfg, params, mstate, batch_size=b, pipeline=pipeline)
    rb = jax.device_put(jnp.asarray(rng.randn(b, n, t * 200),
                                    jnp.float32))
    lb = jax.device_put(jnp.full((b,), t, jnp.int64))

    def dev_call():
        # scalar D2H is the sync (axon: block_until_ready returns early)
        return float(pb._infer_raw(pb.params, pb.model_state, rb, lb)[0])

    dt, _ = timed(dev_call, iters=20)
    results["raw_b256_device_resident_clips_per_s"] = round(b / dt, 1)

    results["note"] = (
        "predict_proba* includes H2D of the inputs, the fused program, "
        "and D2H of the probabilities; on this axon-tunnel host B=1 "
        "latency and the batched *_clips_per_s are transport-bound "
        "(each raw 60 s window is ~0.9 MB against a ~0.03 GB/s link). "
        "raw_b256_device_resident_clips_per_s is the same program with "
        "inputs pre-placed — the stack's actual serving capability; "
        "co-located hosts sit between the two, near the device-resident "
        "figure.")
    out_path = os.path.join(os.path.dirname(__file__),
                            "serving_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
