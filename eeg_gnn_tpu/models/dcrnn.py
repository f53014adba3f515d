"""DCRNN task models: seizure classification/detection and self-supervised
next-window prediction.

Parity: reference ``model/model.py:208-361``. Re-designed for TPU (see
``models/dcgru.py``); divergences from reference quirks are documented where
they occur.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.dcgru import (
    DCGRUConfig,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_configs,
    encoder_init,
)


@dataclasses.dataclass(frozen=True)
class DCRNNConfig:
    """Static model configuration (the subset of the reference args surface
    consumed by the DCRNN models, args.py:80-128)."""

    input_dim: int = 100
    output_dim: int = 100
    rnn_units: int = 64
    num_rnn_layers: int = 2
    max_diffusion_step: int = 2
    num_nodes: int = 19
    num_supports: int = 1  # 1 for laplacian, 2 for dual_random_walk
    num_classes: int = 1
    dcgru_activation: str = "tanh"
    dropout: float = 0.0
    cl_decay_steps: int = 3000
    use_curriculum_learning: bool = False
    use_pallas: bool = False
    scan_unroll: int = 1
    compute_dtype: str = "float32"
    recurrence: str = "pallas"
    batch_tile: int = 32  # Pallas whole-sequence kernel clip-packing tile
    input_fusion: bool = False  # in-kernel input diffusion + projection
    # (ops/pallas_recurrent.dcgru_layer_recurrence_pallas_xin)

    def encoder_cfgs(self):
        return encoder_configs(
            self.input_dim, self.rnn_units, self.max_diffusion_step,
            self.num_nodes, self.num_supports, self.num_rnn_layers,
            self.dcgru_activation, self.use_pallas, self.scan_unroll,
            self.compute_dtype, self.recurrence, self.batch_tile,
            self.input_fusion,
        )


def compute_sampling_threshold(cl_decay_steps, global_step):
    """Scheduled-sampling teacher-forcing ratio (reference utils.py:385-390)."""
    return cl_decay_steps / (cl_decay_steps + jnp.exp(global_step / cl_decay_steps))


def last_relevant(output, lengths):
    """Gather each sequence's last valid timestep.

    Args:
        output: (B, T, ...) batch-first sequence outputs.
        lengths: (B,) true lengths.

    Parity: reference ``utils.last_relevant_pytorch`` (utils.py:346-357).
    """
    idx = (lengths - 1).astype(jnp.int32)
    idx = idx.reshape((-1,) + (1,) * (output.ndim - 1))
    return jnp.take_along_axis(output, idx, axis=1).squeeze(1)


def _dropout(x, rate, rng, training):
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Classification / detection model
# ---------------------------------------------------------------------------


def init_classification_model(key, cfg: DCRNNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Params: encoder cell list + per-node FC head (reference model.py:208-233).
    FC uses torch ``nn.Linear`` layout/init."""
    k_enc, k_w, k_b = jax.random.split(key, 3)
    bound = 1.0 / (cfg.rnn_units ** 0.5)
    return {
        "encoder": encoder_init(k_enc, cfg.encoder_cfgs(), dtype),
        "fc_w": jax.random.uniform(k_w, (cfg.num_classes, cfg.rnn_units), dtype,
                                   -bound, bound),
        "fc_b": jax.random.uniform(k_b, (cfg.num_classes,), dtype, -bound, bound),
    }


def classification_apply(cfg: DCRNNConfig, params, x_seq, seq_lengths, supports,
                         *, training: bool = False, rng=None):
    """Forward pass -> (B, num_classes) logits.

    Args:
        x_seq: (B, T, N, input_dim) batch-first input clips.
        seq_lengths: (B,) valid lengths.
        supports: (S, ..., N, N) stacked supports.

    Parity: reference ``DCRNNModel_classification.forward``
    (model.py:235-272): encoder -> last-relevant state -> dropout -> ReLU ->
    per-node FC -> max-pool over nodes.
    """
    x_tmajor = jnp.swapaxes(x_seq, 0, 1)  # (T, B, N, D)
    _, top_seq = encoder_apply(cfg.encoder_cfgs(), params["encoder"], supports,
                               x_tmajor)
    # gather the last valid timestep directly in time-major layout (the
    # (B, T) transpose of the full output sequence — and its backward
    # scatter-transpose — was pure HBM traffic)
    idx = (seq_lengths - 1).astype(jnp.int32).reshape(
        (1, -1) + (1,) * (top_seq.ndim - 2))
    last = jnp.take_along_axis(top_seq, idx, axis=0)[0]  # (B, N, H)
    last = last.astype(x_seq.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    hidden = jax.nn.relu(_dropout(last, cfg.dropout, rng, training))
    logits = jnp.matmul(hidden, params["fc_w"].T) + params["fc_b"]  # (B, N, C)
    return jnp.max(logits, axis=1)  # (B, C)


# ---------------------------------------------------------------------------
# Next-time-prediction (SSL) model
# ---------------------------------------------------------------------------


def init_next_time_pred_model(key, cfg: DCRNNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Params: encoder + (tied-weight) decoder (reference model.py:277-311)."""
    k_enc, k_dec = jax.random.split(key)
    dec_params, _ = decoder_init(
        k_dec, cfg.output_dim, cfg.rnn_units, cfg.max_diffusion_step,
        cfg.num_nodes, cfg.num_supports, cfg.num_rnn_layers, cfg.output_dim,
        cfg.dcgru_activation, dtype,
    )
    return {
        "encoder": encoder_init(k_enc, cfg.encoder_cfgs(), dtype),
        "decoder": dec_params,
    }


def _decoder_cfgs(cfg: DCRNNConfig):
    # recurrence/batch_tile/compute_dtype ride along so decoder_apply can
    # dispatch to the whole-sequence Pallas decoder kernels (and fall
    # back consistently with the encoder's backend selection)
    mk = lambda d: DCGRUConfig(d, cfg.rnn_units, cfg.max_diffusion_step,
                               cfg.num_nodes, cfg.num_supports,
                               cfg.dcgru_activation,
                               compute_dtype=cfg.compute_dtype,
                               recurrence=cfg.recurrence,
                               batch_tile=cfg.batch_tile)
    return (mk(cfg.output_dim), mk(cfg.rnn_units))


def next_time_pred_apply(cfg: DCRNNConfig, params, enc_inputs, dec_inputs,
                         supports, *, batches_seen=None, training: bool = False,
                         rng=None):
    """Seq2seq forward -> (B, T_out, N, output_dim) predictions.

    Args:
        enc_inputs: (B, T_in, N, input_dim); dec_inputs: (B, T_out, N,
        output_dim) ground truth for scheduled sampling.
        batches_seen: sample counter driving the curriculum schedule.

    Parity: reference ``DCRNNModel_nextTimePred.forward`` (model.py:313-360).
    Divergence (documented quirk policy): the reference hard-codes
    ``.cuda()`` for the encoder init state (model.py:336) — we are
    device-agnostic.
    """
    enc_t = jnp.swapaxes(enc_inputs, 0, 1)
    dec_t = jnp.swapaxes(dec_inputs, 0, 1)

    hidden_stack, _ = encoder_apply(cfg.encoder_cfgs(), params["encoder"],
                                    supports, enc_t)

    if training and cfg.use_curriculum_learning and batches_seen is not None:
        tf_ratio = compute_sampling_threshold(cfg.cl_decay_steps, batches_seen)
    else:
        tf_ratio = None

    outputs = decoder_apply(
        _decoder_cfgs(cfg), params["decoder"], supports, dec_t, hidden_stack,
        cfg.num_rnn_layers, teacher_forcing_ratio=tf_ratio,
        dropout_rate=cfg.dropout, rng=rng, training=training,
    )
    return jnp.swapaxes(outputs, 0, 1)  # (B, T_out, N, output_dim)
