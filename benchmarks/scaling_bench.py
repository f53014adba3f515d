"""Data-parallel scaling benchmark: fixed per-device batch (weak scaling),
train-step throughput at mesh sizes 1..max devices.

On a virtual CPU mesh this validates the mechanics and collective overhead
shape (all devices share the same host cores, so absolute efficiency is NOT
meaningful); on real multi-chip TPU it measures the north-star scaling
efficiency. Writes benchmarks/scaling_results.json.

Run: python benchmarks/scaling_bench.py [--per_device 16] [--seq 12] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys

if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_device", type=int, default=16)
    ap.add_argument("--seq", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force 8 virtual CPU devices")
    ns = ap.parse_args()

    import jax

    if ns.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports_jnp
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    results = {"per_device_batch": ns.per_device, "seq": ns.seq,
               "device": str(devices[0]), "points": []}

    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=ns.seq).finalize()
    bundle = build_model(cfg)
    rng = np.random.RandomState(0)

    for p in sizes:
        mesh = make_mesh(f"data:{p}", devices[:p])
        batch = ns.per_device * p
        params, mstate = bundle.init(jax.random.PRNGKey(0))
        opt = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
        ostate = opt.init(params)
        step = make_train_step(supervised_loss_fn(bundle, "detection"), opt,
                               donate=False)
        x = rng.randn(batch, ns.seq, 19, 100).astype(np.float32)
        y = rng.randint(0, 2, batch).astype(np.float32)
        lens = np.full((batch,), ns.seq, np.int32)
        adj = np.abs(rng.rand(batch, 19, 19)).astype(np.float32)
        sup = compute_supports_jnp(jnp.asarray(adj), "laplacian")

        rep = replicated_sharding(mesh)
        params_s = jax.device_put(params, rep)
        ostate_s = jax.device_put(ostate, rep)
        bd = {
            "x": jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4, 0)),
            "y": jax.device_put(jnp.asarray(y), batch_sharding(mesh, 1, 0)),
            "seq_lengths": jax.device_put(jnp.asarray(lens),
                                          batch_sharding(mesh, 1, 0)),
            "supports": jax.device_put(sup, batch_sharding(mesh, 4, 1)),
        }
        k = jax.random.PRNGKey(0)
        for _ in range(3):
            params_s, mstate, ostate_s, loss = step(params_s, mstate,
                                                    ostate_s, bd, k)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            params_s, mstate, ostate_s, loss = step(params_s, mstate,
                                                    ostate_s, bd, k)
        float(loss)
        dt = time.perf_counter() - t0
        clips = batch * ns.iters / dt
        results["points"].append(
            {"devices": p, "clips_per_s": clips,
             "per_device_clips_per_s": clips / p})
        print(f"devices={p}: {clips:.0f} clips/s "
              f"({clips / p:.0f}/device)", flush=True)

    base = results["points"][0]["per_device_clips_per_s"]
    for pt in results["points"]:
        pt["efficiency"] = pt["per_device_clips_per_s"] / base

    # --- collective-volume analysis: predicted real-ICI/DCN efficiency ---
    # DP's only per-step collective is the gradient all-reduce (psum over
    # 'data' inserted by the partitioner inside the fused train step).
    # Ring all-reduce moves 2*(p-1)/p * params_bytes per chip per step.
    import math

    n_params = sum(int(math.prod(a.shape))
                   for a in jax.tree.leaves(params))
    params_bytes = 4 * n_params
    # measured single-chip flagship step (benchmarks/batch_sweep_results):
    # ~14.4 ms at per-device batch 128 on v5e. ICI per-chip bandwidth on a
    # v5e 2D torus ~ 1.6 Tbps / 8 = O(100 GB/s) effective per direction;
    # cross-slice DCN O(25 GB/s). Both bounds below are conservative.
    step_ms_b128 = 14.4
    for name, bw_gbps in (("ici", 100.0), ("dcn", 25.0)):
        t_allreduce_ms = (2 * params_bytes / (bw_gbps * 1e9)) * 1e3
        results[f"predicted_{name}_weak_scaling_efficiency_b128"] = round(
            step_ms_b128 / (step_ms_b128 + t_allreduce_ms), 5)
    results["grad_allreduce_bytes"] = params_bytes
    results["analysis"] = (
        "Virtual-CPU-mesh wall clock oversubscribes the host's 2 physical "
        "cores (8 'devices' share 2 cores), so measured multi-device "
        "efficiency here is a mechanics check, NOT the scaling number. "
        "The DP collective volume is one gradient all-reduce of "
        f"{params_bytes / 1e6:.2f} MB/step vs a measured {step_ms_b128} ms "
        "compute step at per-device batch 128 -> predicted weak-scaling "
        "efficiency >99% over ICI and >98% over DCN (north-star >=80% is "
        "met by construction for DP at the flagship shape; see "
        "benchmarks/NOTES.md).")
    out = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["points"], indent=2))
    print(results["analysis"])


if __name__ == "__main__":
    main()
