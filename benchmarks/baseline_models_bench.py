"""Baseline-model train-step benchmarks — perf evidence outside the
DCRNN family (VERDICT r4 #8), one entry per reference model family:

- LSTM  (reference ``model/lstm.py:9-61``): B=128, T=60, 19x100 FFT
  feats, 2x64 — the flagship detection shape.
- CNN-LSTM (reference ``model/cnnlstm.py:6-36``): same input shape.
- DenseCNN (reference ``model/densecnn.py`` + dense_inception): the
  classification recipe shape (B=32, (60*100, 19) FFT plane, 4 classes).

Each measures the full jitted train step (fwd, loss, bwd, clip+Adam) on
the accelerator and EXECUTES the reference's own torch model on CPU
(its only backend here) for the same step.

Run: python benchmarks/baseline_models_bench.py
Writes benchmarks/baseline_models_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)

B, T, N, D, H, L = 128, 60, 19, 100, 64, 2


def bench_ours(dtype: str, iters=60, warmup=8):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from eeg_gnn_tpu.models.lstm import init_lstm_params, lstm_model_apply
    from eeg_gnn_tpu.train.losses import bce_with_logits
    from eeg_gnn_tpu.train.optim import make_optimizer

    params = init_lstm_params(jax.random.PRNGKey(0), N * D, H, L, 1)
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    opt_state = optimizer.init(params)
    rng = np.random.RandomState(0)
    # the LSTM baseline runs f32 (it exists for accuracy parity — no
    # compute_dtype surface like the DCRNN family); dtype kept for the
    # result key only
    del dtype
    x = jnp.asarray(rng.randn(B, T, N, D), np.float32)
    y = jnp.asarray(rng.randint(0, 2, (B,)), np.float32)
    lens = jnp.full((B,), T, jnp.int32)

    import optax

    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = lstm_model_apply(p, x, lens, num_layers=L,
                                      hidden_size=H)
            return bce_with_logits(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step)
    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)  # real D2H sync (axon tunnel)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, x, y)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


def bench_reference(iters=5, warmup=1):
    """Execute (not copy) the upstream LSTMModel on torch-CPU."""
    import argparse

    import torch

    sys.modules.setdefault("pyedflib", types.ModuleType("pyedflib"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.lstm import LSTMModel  # noqa (reference source)

    args = argparse.Namespace(num_nodes=N, rnn_units=H, num_rnn_layers=L,
                              input_dim=D, dropout=0.0)
    model = LSTMModel(args, num_classes=1, device="cpu")
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=5e-4)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.randn(B, T, N, D).astype(np.float32))
    y = torch.from_numpy(rng.randint(0, 2, (B,)).astype(np.float32))
    lens = torch.from_numpy(np.full((B,), T, np.int64))

    def step():
        opt.zero_grad()
        logits = model(x, lens).view(-1)
        loss = loss_fn(logits, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return B * iters / (time.perf_counter() - t0)


def _timed_jax(step_fn, state, iters=40, warmup=6):
    import time as _t

    for _ in range(warmup):
        state, loss = step_fn(state)
    float(loss)  # real D2H sync (axon tunnel)
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(iters):
            state, loss = step_fn(state)
        float(loss)
        best = min(best, _t.perf_counter() - t0)
    return best / iters


def _timed_torch(step, iters=5, warmup=1):
    import time as _t

    for _ in range(warmup):
        step()
    t0 = _t.perf_counter()
    for _ in range(iters):
        step()
    return (_t.perf_counter() - t0) / iters


def bench_cnnlstm():
    import jax
    import jax.numpy as jnp
    import optax

    from eeg_gnn_tpu.models.cnnlstm import cnnlstm_apply, init_cnnlstm_params
    from eeg_gnn_tpu.train.losses import bce_with_logits
    from eeg_gnn_tpu.train.optim import make_optimizer

    b = 64
    params = init_cnnlstm_params(jax.random.PRNGKey(0), 1)
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, T, N, D), np.float32)
    y = jnp.asarray(rng.randint(0, 2, (b,)), np.float32)
    lens = jnp.full((b,), T, jnp.int32)

    @jax.jit
    def step(state):
        params, opt_state = state

        def loss_fn(p):
            return bce_with_logits(cnnlstm_apply(p, x, lens), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    dt = _timed_jax(step, (params, optimizer.init(params)), iters=30)
    ours = b / dt

    # reference torch-CPU
    import torch

    sys.modules.setdefault("pyedflib", types.ModuleType("pyedflib"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.cnnlstm import CNN_LSTM  # noqa (reference source)

    model = CNN_LSTM(num_classes=1)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=5e-4)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    tx = torch.from_numpy(np.asarray(x))
    ty = torch.from_numpy(np.asarray(y))
    tl = torch.from_numpy(np.full((b,), T, np.int64))

    def tstep():
        opt.zero_grad()
        loss = loss_fn(model(tx, tl).view(-1), ty)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    ref = b / _timed_torch(tstep, iters=3)
    return ours, ref


def bench_densecnn():
    import jax
    import jax.numpy as jnp
    import optax

    from eeg_gnn_tpu.train.losses import cross_entropy
    from eeg_gnn_tpu.train.optim import make_optimizer

    b, classes = 32, 4
    data_shape = (T * 100, N)  # the classification recipe's FFT plane
    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.models.registry import build_model

    cfg = ExperimentConfig(do_train=True, task="classification",
                           model_name="densecnn", max_seq_len=T,
                           num_classes=classes, use_fft=True).finalize()
    bundle = build_model(cfg)
    params, state0 = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, data_shape[0], N), np.float32)
    y = jnp.asarray(rng.randint(0, classes, (b,)), np.int32)
    lens = jnp.full((b,), T, jnp.int32)

    @jax.jit
    def step(state):
        params, mstate, opt_state = state

        def loss_fn(p):
            batch = {"x": x, "seq_lengths": lens}
            logits, new_state = bundle.apply(
                p, mstate, batch, training=True, rng=jax.random.PRNGKey(0))
            return cross_entropy(logits, y), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state,
                opt_state), loss

    dt = _timed_jax(step, (params, state0, optimizer.init(params)),
                    iters=20)
    ours = b / dt

    # reference torch-CPU
    import json as _json

    import torch

    sys.modules.setdefault("pyedflib", types.ModuleType("pyedflib"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model import densecnn as ref_dc  # noqa (reference source)

    with open("/root/reference/model/dense_inception/params.json") as f:
        pjson = _json.load(f)

    class P:
        type = pjson["type"]
        dropout_rate = pjson["dropout_rate"]
        num_inception_layers = pjson["num_inception_layers"]
        num_channels = pjson["num_channels"]

    model = ref_dc.DenseCNN(P, data_shape=data_shape, num_classes=classes)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=5e-4)
    loss_fn = torch.nn.CrossEntropyLoss()
    tx = torch.from_numpy(np.asarray(x))
    ty = torch.from_numpy(np.asarray(y)).long()

    def tstep():
        opt.zero_grad()
        loss = loss_fn(model(tx), ty)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    ref = b / _timed_torch(tstep, iters=2)
    return ours, ref


def main():
    import jax

    results = {"config": {"batch": B, "t": T, "nodes": N, "input_dim": D,
                          "rnn_units": H, "layers": L,
                          "device": str(jax.devices()[0])}}
    clips = bench_ours("float32")
    results["float32"] = {"clips_per_s": round(clips, 1),
                          "step_ms": round(1000.0 * B / clips, 3)}
    print(f"lstm float32: {clips:.0f} clips/s", flush=True)
    ref = bench_reference()
    results["reference_torch_cpu"] = {"clips_per_s": round(ref, 1)}
    results["speedup_vs_reference"] = round(
        results["float32"]["clips_per_s"] / ref, 1)
    print(f"lstm reference torch-cpu: {ref:.0f} clips/s "
          f"-> {results['speedup_vs_reference']}x", flush=True)

    for name, fn in (("cnnlstm", bench_cnnlstm),
                     ("densecnn", bench_densecnn)):
        ours, ref = fn()
        results[name] = {
            "clips_per_s": round(ours, 1),
            "reference_torch_cpu_clips_per_s": round(ref, 1),
            "speedup_vs_reference": round(ours / ref, 1),
        }
        print(f"{name}: {ours:.0f} clips/s vs torch-cpu {ref:.0f} "
              f"-> {ours / ref:.0f}x", flush=True)

    out = os.path.join(os.path.dirname(__file__),
                       "baseline_models_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("->", out)


if __name__ == "__main__":
    main()
