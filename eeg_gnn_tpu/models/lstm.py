"""LSTM baseline: flattened-electrode LSTM -> last-relevant -> FC head.

Parity: reference ``model/lstm.py:9-61`` (``nn.LSTM(input_dim*num_nodes,
rnn_units, num_rnn_layers, batch_first=True)`` with torch's default
uniform(-1/sqrt(H), 1/sqrt(H)) init and i,f,g,o gate layout), re-expressed
as a ``lax.scan`` per layer. Param names mirror torch's state dict so
checkpoints import directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.dcrnn import last_relevant, _dropout


def init_lstm_params(key, input_size: int, hidden_size: int, num_layers: int,
                     num_classes: int, dtype=jnp.float32):
    params = {}
    bound_h = 1.0 / (hidden_size ** 0.5)
    keys = jax.random.split(key, num_layers * 4 + 2)
    ki = 0
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden_size
        params[f"weight_ih_l{layer}"] = jax.random.uniform(
            keys[ki], (4 * hidden_size, in_sz), dtype, -bound_h, bound_h); ki += 1
        params[f"weight_hh_l{layer}"] = jax.random.uniform(
            keys[ki], (4 * hidden_size, hidden_size), dtype, -bound_h, bound_h); ki += 1
        params[f"bias_ih_l{layer}"] = jax.random.uniform(
            keys[ki], (4 * hidden_size,), dtype, -bound_h, bound_h); ki += 1
        params[f"bias_hh_l{layer}"] = jax.random.uniform(
            keys[ki], (4 * hidden_size,), dtype, -bound_h, bound_h); ki += 1
    bound_fc = 1.0 / (hidden_size ** 0.5)
    params["fc_w"] = jax.random.uniform(keys[ki], (num_classes, hidden_size),
                                        dtype, -bound_fc, bound_fc); ki += 1
    params["fc_b"] = jax.random.uniform(keys[ki], (num_classes,), dtype,
                                        -bound_fc, bound_fc)
    return params


def lstm_layer(w_ih, w_hh, b_ih, b_hh, x_seq, hidden_size: int):
    """One LSTM layer over (T, B, in) -> (T, B, H), torch gate order i,f,g,o.

    TPU note: the input GEMM ``x @ W_ih^T`` for all T is hoisted out of the
    scan (same trick as the DCGRU encoder); only the H x 4H recurrent matmul
    stays sequential.
    """
    x_proj = jnp.einsum("tbi,gi->tbg", x_seq, w_ih) + b_ih + b_hh

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.matmul(h, w_hh.T)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    b = x_seq.shape[1]
    h0 = jnp.zeros((b, hidden_size), x_seq.dtype)
    (_, _), h_seq = jax.lax.scan(step, (h0, h0), x_proj)
    return h_seq


def lstm_forward(params, x_seq, num_layers: int, hidden_size: int):
    """Multi-layer LSTM over a (T, B, in) sequence -> (T, B, H)."""
    cur = x_seq
    for layer in range(num_layers):
        cur = lstm_layer(
            params[f"weight_ih_l{layer}"], params[f"weight_hh_l{layer}"],
            params[f"bias_ih_l{layer}"], params[f"bias_hh_l{layer}"],
            cur, hidden_size)
    return cur


def lstm_model_apply(params, x_seq, seq_lengths, *, num_layers: int,
                     hidden_size: int, dropout: float = 0.0,
                     training: bool = False, rng=None):
    """(B, T, N, D) inputs -> (B, num_classes) logits.

    Parity: reference ``LSTMModel.forward`` (lstm.py:33-54): flatten nodes
    into features, LSTM, last-relevant gather, dropout -> ReLU -> FC.
    """
    b, t = x_seq.shape[0], x_seq.shape[1]
    flat = x_seq.reshape(b, t, -1)
    h_seq = lstm_forward(params, jnp.swapaxes(flat, 0, 1), num_layers,
                         hidden_size)
    out = jnp.swapaxes(h_seq, 0, 1)  # (B, T, H)
    last = last_relevant(out, seq_lengths)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    hidden = jax.nn.relu(_dropout(last, dropout, rng, training))
    return jnp.matmul(hidden, params["fc_w"].T) + params["fc_b"]
