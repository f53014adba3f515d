"""Dense-Inception CNN baseline ("Dense-CNN").

Parity: reference ``model/densecnn.py`` + ``model/dense_inception/*``:
densely connected inception blocks of 1-D-in-time convs (kernel (k, 1) over
a (time, channels) plane), 1x1 squeeze convs, stage max-pools, FC head with
BatchNorm + dropout. Config from ``model/dense_inception/params.json``
(type dense_inception, dropout 0.2, num_channels 10, use_batchnorm 0).

Reference quirks reproduced:

- ``Inception4`` applies NO pooling in forward (inceptions.py:141-157),
  unlike the other variants; the duplicate ``branchC_*`` assignments mean
  the LAST construction wins for each attribute — branchC_1 ends up with
  kernel (21, 1) pad (10, 0) while branchC_2 keeps (filter_size[2], 1)
  (inceptions.py:148-151).
- ``DenseInception.forward`` reuses ``inception_4`` and ``inception_6``
  twice and never calls ``inception_5``/``inception_7``
  (dense_inception.py:80-95); those dead modules' params still exist in
  checkpoints, so we create them too.
- Conv weight init normal(0, sqrt(2/n)) with n = kh*kw*out_ch; BN weight 1
  bias 0; Linear bias 0 (dense_inception.py:57-66) while Linear weights
  keep torch's default kaiming-uniform.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.cnnlstm import max_pool


def _conv_params(key, out_ch, in_ch, kh, kw, dtype=jnp.float32):
    """Reference DenseInception conv init: N(0, sqrt(2/n)), n=kh*kw*out_ch;
    bias: torch Conv2d default U(±1/sqrt(fan_in))."""
    n = kh * kw * out_ch
    kw_, kb = jax.random.split(key)
    w = jax.random.normal(kw_, (out_ch, in_ch, kh, kw), dtype) * math.sqrt(2.0 / n)
    bound = 1.0 / ((in_ch * kh * kw) ** 0.5)
    b = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _conv_apply(p, x, pad_h):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(pad_h, pad_h), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jax.nn.relu(out + p["b"][None, :, None, None])


def _init_inception4(key, in_ch, pool_features, filter_size, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    f = filter_size
    return {
        "branchA_1": _conv_params(ks[0], pool_features, in_ch, f[0], 1, dtype),
        "branchA_2": _conv_params(ks[1], pool_features, pool_features, f[0], 1, dtype),
        "branchB_1": _conv_params(ks[2], pool_features, in_ch, f[1], 1, dtype),
        "branchB_2": _conv_params(ks[3], pool_features, pool_features, f[1], 1, dtype),
        "branchB_3": _conv_params(ks[4], pool_features, pool_features, f[1], 1, dtype),
        # branchC_1 is the (21,1) construction (last assignment wins);
        # branchC_2 is the (filter_size[2],1) one.
        "branchC_1": _conv_params(ks[5], pool_features, in_ch, 21, 1, dtype),
        "branchC_2": _conv_params(ks[6], pool_features, pool_features, f[2], 1, dtype),
    }


def _apply_inception4(p, x, filter_size):
    f = filter_size
    a = _conv_apply(p["branchA_2"], _conv_apply(p["branchA_1"], x, (f[0] - 1) // 2),
                    (f[0] - 1) // 2)
    b = _conv_apply(p["branchB_1"], x, (f[1] - 1) // 2)
    b = _conv_apply(p["branchB_2"], b, (f[1] - 1) // 2)
    b = _conv_apply(p["branchB_3"], b, (f[1] - 1) // 2)
    c = _conv_apply(p["branchC_2"], _conv_apply(p["branchC_1"], x, 10),
                    (f[2] - 1) // 2)
    return jnp.concatenate([a, b, c], axis=1)


# The 8 inception stages' (filter_size, in_ch multiplier, pool_features
# multiplier) in construction order (dense_inception.py:16-46); nc = 10.
_STAGES = {
    0: ([9, 15, 21], None, 1),     # in_ch literal 1
    1: ([9, 13, 17], 3, 3),
    2: ([7, 11, 15], 9, 9),
    3: ([5, 7, 9], 18, 18),
    4: ([3, 5, 7], 18, 18),
    5: ([3, 5, 7], 18, 18),        # dead (never called in forward)
    6: ([3, 5, 7], 18, 18),
    7: ([3, 5, 7], 18, 18),        # dead
}


def init_densecnn_params(key, data_shape: Tuple[int, int], num_classes: int,
                         num_channels: int = 10, dtype=jnp.float32):
    """``data_shape`` = (time_len, num_electrode_channels), e.g.
    (max_seq_len*100, 19) under FFT (reference train.py:119)."""
    nc = num_channels
    params: Dict = {}
    for i, (fs, mult, pf) in _STAGES.items():
        key, sub = jax.random.split(key)
        in_ch = 1 if mult is None else nc * mult
        params[f"inception_{i}"] = _init_inception4(sub, in_ch, nc * pf, fs, dtype)

    squeezes = {
        "conv1x1_10": (nc * 12, nc * 9),
        "conv1x1_2": (nc * 27, nc * 18),
        "conv1x1_3": (nc * 54, nc * 18),
        "conv1x1_32": (nc * 36, nc * 18),
        "conv1x1_4": (nc * 54, nc * 18),
        "conv1x1_5": (nc * 54, nc * 27),
        "conv1x1_54": (nc * 45, nc * 18),
        "conv1x1_6": (nc * 54, nc * 18),
        "conv1x1_7": (nc * 54, nc * 27),
        "conv1x1_76": (nc * 45, nc * 36),
    }
    for name, (cin, cout) in squeezes.items():
        key, sub = jax.random.split(key)
        params[name] = _conv_params(sub, cout, cin, 1, 1, dtype)

    fc1_in = data_shape[1] * nc * 36 * int(data_shape[0] / (7 * 5 * 5 * 4))
    key, k1, k2 = jax.random.split(key, 3)
    bound1 = 1.0 / (fc1_in ** 0.5)
    params["fc1"] = {
        "w": jax.random.uniform(k1, (128, fc1_in), dtype, -bound1, bound1),
        "b": jnp.zeros((128,), dtype),  # reference zeroes Linear biases
    }
    params["fcbn1"] = {
        "scale": jnp.ones((128,), dtype), "bias": jnp.zeros((128,), dtype),
    }
    bound2 = 1.0 / (128 ** 0.5)
    params["fc2"] = {
        "w": jax.random.uniform(k2, (num_classes, 128), dtype, -bound2, bound2),
        "b": jnp.zeros((num_classes,), dtype),
    }
    state = {
        "fcbn1": {"mean": jnp.zeros((128,), dtype), "var": jnp.ones((128,), dtype)}
    }
    return params, state


def _batchnorm1d(p, s, x, training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """torch BatchNorm1d: batch stats in training (+ running update), running
    stats in eval."""
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_s


def densecnn_apply(params, state, x, *, num_classes: int,
                   training: bool = False, rng=None,
                   dropout_rate: float = 0.2):
    """(B, time_len, num_channels) -> logits; returns (logits, new_state).

    Parity: reference ``DenseInception.forward`` (dense_inception.py:68-105)
    including the stage reuse / dead-module quirks and the final
    ``view(-1)`` squeeze for binary heads.
    """
    s = x[:, None, :, :]  # (B, 1, T, C)

    def inc(i, val):
        return _apply_inception4(params[f"inception_{i}"], val, _STAGES[i][0])

    def squeeze(name, val):
        return _conv_apply(params[name], val, 0)

    s_0 = inc(0, s)
    s_1 = inc(1, s_0)
    s = squeeze("conv1x1_10", jnp.concatenate([s_0, s_1], axis=1))
    s = max_pool(s, 7, 1)

    s_0 = squeeze("conv1x1_2", inc(2, s))
    s_1 = squeeze("conv1x1_3", inc(3, s_0))
    s = squeeze("conv1x1_32", jnp.concatenate([s_0, s_1], axis=1))
    s = max_pool(s, 5, 1)

    s_0 = squeeze("conv1x1_4", inc(4, s))
    s_1 = squeeze("conv1x1_5", inc(4, s_0))  # inception_4 reused (quirk)
    s = squeeze("conv1x1_54", jnp.concatenate([s_0, s_1], axis=1))
    s = max_pool(s, 5, 1)

    s_0 = squeeze("conv1x1_6", inc(6, s))
    s_1 = squeeze("conv1x1_7", inc(6, s_0))  # inception_6 reused (quirk)
    s = squeeze("conv1x1_76", jnp.concatenate([s_0, s_1], axis=1))
    s = max_pool(s, 4, 1)

    flat = s.reshape(s.shape[0], -1)
    h = jnp.matmul(flat, params["fc1"]["w"].T) + params["fc1"]["b"]
    h, new_bn = _batchnorm1d(params["fcbn1"], state["fcbn1"], h, training)
    h = jax.nn.relu(h)
    if training and dropout_rate > 0:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keep = 1.0 - dropout_rate
        h = jnp.where(jax.random.bernoulli(rng, keep, h.shape), h / keep, 0.0)
    logits = jnp.matmul(h, params["fc2"]["w"].T) + params["fc2"]["b"]
    if num_classes == 1:
        logits = logits.reshape(-1)
    return logits, {"fcbn1": new_bn}
