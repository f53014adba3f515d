"""CNN-LSTM baseline: per-timestep 2D convs -> FC -> 2-layer LSTM -> FC.

Parity: reference ``model/cnnlstm.py:6-37``. Two deliberate reference
quirks are reproduced (both affect the published baseline's behavior):

- ``nn.LSTM`` is constructed WITHOUT ``batch_first=True`` but fed a
  (batch, seq, feature) tensor (cnnlstm.py:17,33), so torch treats the
  *batch* dimension as time. We scan over axis 0 of the (B, T, 512) tensor
  exactly the same way.
- ``last_relevant_pytorch(..., batch_first=True)`` then gathers along the
  true time axis of that mis-ordered output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.dcrnn import last_relevant
from eeg_gnn_tpu.models.lstm import lstm_forward


def _conv_init(key, out_ch, in_ch, kh, kw, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    for weight; U(±1/sqrt(fan_in)) for bias."""
    fan_in = in_ch * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    kw_, kb = jax.random.split(key)
    return (
        jax.random.uniform(kw_, (out_ch, in_ch, kh, kw), dtype, -bound, bound),
        jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    )


def _linear_init(key, out_f, in_f, dtype=jnp.float32):
    bound = 1.0 / (in_f ** 0.5)
    kw_, kb = jax.random.split(key)
    return (
        jax.random.uniform(kw_, (out_f, in_f), dtype, -bound, bound),
        jax.random.uniform(kb, (out_f,), dtype, -bound, bound),
    )


def conv2d(x, w, b, padding="VALID"):
    """NCHW conv with torch-layout weights (out, in, kh, kw)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def max_pool(x, kh, kw):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, kh, kw), (1, 1, kh, kw), "VALID")


def init_cnnlstm_params(key, num_classes: int = 1, num_nodes: int = 19,
                        input_dim: int = 100, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    params = {}
    params["conv1_w"], params["conv1_b"] = _conv_init(ks[0], 32, 1, 3, 3, dtype)
    params["conv2_w"], params["conv2_b"] = _conv_init(ks[1], 32, 32, 3, 3, dtype)
    params["fc1_w"], params["fc1_b"] = _linear_init(ks[2], 512, 32 * 48 * 7, dtype)
    hidden = 128
    bound = 1.0 / (hidden ** 0.5)
    for layer, in_sz in ((0, 512), (1, hidden)):
        for name, shape in (
            (f"weight_ih_l{layer}", (4 * hidden, in_sz)),
            (f"weight_hh_l{layer}", (4 * hidden, hidden)),
            (f"bias_ih_l{layer}", (4 * hidden,)),
            (f"bias_hh_l{layer}", (4 * hidden,)),
        ):
            key, sub = jax.random.split(key)
            params[name] = jax.random.uniform(sub, shape, dtype, -bound, bound)
    params["fc2_w"], params["fc2_b"] = _linear_init(ks[8], num_classes, hidden, dtype)
    return params


def cnnlstm_apply(params, x_seq, seq_lengths, *, training: bool = False,
                  rng=None):
    """(B, T, N, D) -> (B, num_classes) logits (reference cnnlstm.py:19-37)."""
    b, t, n, d = x_seq.shape
    x = x_seq.reshape(b * t, 1, n, d)
    out = conv2d(x, params["conv1_w"], params["conv1_b"])   # (BT,32,17,98)
    out = conv2d(out, params["conv2_w"], params["conv2_b"])  # (BT,32,15,96)
    out = max_pool(out, 2, 2)                                # (BT,32,7,48)
    out = out.reshape(b * t, -1)
    out = jnp.matmul(out, params["fc1_w"].T) + params["fc1_b"]
    out = out.reshape(b, t, -1)
    # QUIRK: scan over the BATCH axis, exactly like the reference's
    # non-batch_first nn.LSTM fed a batch-first tensor.
    lstm_out = lstm_forward(params, out, num_layers=2, hidden_size=128)
    last = last_relevant(lstm_out, seq_lengths)
    return jnp.matmul(last, params["fc2_w"].T) + params["fc2_b"]
