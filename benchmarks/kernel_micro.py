"""Micro-benchmark of the whole-sequence DCGRU recurrence kernels in
isolation (no hoisted GEMMs, no optimizer): forward and forward+backward
wall time at the flagship shape, for kernel-variant A/B comparisons.

Run from the repo root: ``python benchmarks/kernel_micro.py [module_path]``
— optional arg is an alternative pallas_recurrent module file to time
(e.g. an old revision extracted with ``git show``), letting two kernel
generations race in the same session (the axon tunnel drifts ~10-15%
between sessions, so only same-session comparisons are meaningful).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_module(path=None):
    if path is None:
        from eeg_gnn_tpu.ops import pallas_recurrent as mod
        return mod
    spec = importlib.util.spec_from_file_location("kernel_variant", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["kernel_variant"] = mod
    spec.loader.exec_module(mod)
    return mod


def bench(mod, *, t=60, b=128, n=19, h=64, num_supports=1, k=2,
          shared=False, bf16=False, tile=32, iters=50, warmup=5):
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.ops.recurrent import chebyshev_operators

    rng = np.random.RandomState(0)
    m = num_supports * k + 1
    sup_shape = (num_supports, n, n) if shared else (num_supports, b, n, n)
    sup = jnp.asarray(np.abs(rng.randn(*sup_shape)) / n, jnp.float32)
    a = chebyshev_operators(sup, k)
    if a.ndim == 3:
        a = a[:, None]
    io = jnp.bfloat16 if bf16 else jnp.float32
    gx = jnp.asarray(rng.randn(t, b, n, 2 * h), jnp.float32).astype(io)
    cx = jnp.asarray(rng.randn(t, b, n, h), jnp.float32).astype(io)
    wg = jnp.asarray(rng.randn(m, h, 2 * h) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(m, h, h) * 0.1, jnp.float32)
    bg = jnp.asarray(rng.randn(2 * h) * 0.1, jnp.float32)
    bc = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.randn(b, n, h) * 0.1, jnp.float32)
    args = (gx, cx, wg, wc, bg, bc, h0)
    rdt = "bfloat16" if bf16 else "float32"

    fn = mod.dcgru_layer_recurrence_pallas

    fwd = jax.jit(lambda args: fn(a, *args, "tanh", tile, False, rdt)[1]
                  .sum())

    def loss(args):
        hl, hs = fn(a, *args, "tanh", tile, False, rdt)
        return jnp.sum(hs) + jnp.sum(hl)

    fwdbwd = jax.jit(lambda args: sum(
        jnp.sum(g.astype(jnp.float32)) for g in jax.grad(loss)(args)))

    out = {}
    for name, f in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        for _ in range(warmup):
            v = f(args)
        float(v)  # real sync (tunnel-safe)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                v = f(args)
            float(v)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(1e3 * best / iters, 4)
    return out


def main():
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    path = sys.argv[1] if len(sys.argv) > 1 else None
    mod = load_module(path)
    label = path or "current"
    for kw in (dict(shared=False, bf16=True, tile=32),
               dict(shared=False, bf16=True, tile=48),
               dict(shared=False, bf16=False, tile=32),
               dict(shared=True, bf16=True, tile=32),
               dict(shared=True, bf16=True, tile=64)):
        try:
            r = bench(mod, **kw)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(json.dumps({"module": label, **kw, **r}), flush=True)


if __name__ == "__main__":
    main()
