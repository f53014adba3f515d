"""Model registry: a uniform (init, apply) interface over the four model
families selectable via ``--model_name`` (reference train.py:112-126).

Bundle contract:
    init(key)                      -> (params, model_state)
    apply(params, model_state, batch, *, training, rng)
                                   -> (logits, new_model_state)
where ``batch`` is the dict produced by the trainer (x, y, seq_lengths,
supports). Stateless models return their input state unchanged ({}).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.config import ExperimentConfig


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    name: str
    init: Callable[[Any], Tuple[Any, Any]]
    apply: Callable[..., Tuple[Any, Any]]


def build_model(cfg: ExperimentConfig) -> ModelBundle:
    if cfg.model_name == "dcrnn":
        return _dcrnn_bundle(cfg)
    if cfg.model_name == "lstm":
        return _lstm_bundle(cfg)
    if cfg.model_name == "cnnlstm":
        return _cnnlstm_bundle(cfg)
    if cfg.model_name == "densecnn":
        return _densecnn_bundle(cfg)
    raise NotImplementedError(cfg.model_name)


def _dcrnn_bundle(cfg: ExperimentConfig) -> ModelBundle:
    from eeg_gnn_tpu.models.dcrnn import (
        classification_apply,
        init_classification_model,
    )

    model_cfg = cfg.dcrnn_config()

    def init(key):
        return init_classification_model(key, model_cfg), {}

    def apply(params, state, batch, *, training=False, rng=None):
        logits = classification_apply(
            model_cfg, params, batch["x"], batch["seq_lengths"],
            batch["supports"], training=training, rng=rng)
        return logits, state

    return ModelBundle("dcrnn", init, apply)


def _lstm_bundle(cfg: ExperimentConfig) -> ModelBundle:
    from eeg_gnn_tpu.models.lstm import init_lstm_params, lstm_model_apply

    def init(key):
        return init_lstm_params(
            key, cfg.input_dim * cfg.num_nodes, cfg.rnn_units,
            cfg.num_rnn_layers, cfg.num_classes), {}

    def apply(params, state, batch, *, training=False, rng=None):
        logits = lstm_model_apply(
            params, batch["x"], batch["seq_lengths"],
            num_layers=cfg.num_rnn_layers, hidden_size=cfg.rnn_units,
            dropout=cfg.dropout, training=training, rng=rng)
        return logits, state

    return ModelBundle("lstm", init, apply)


def _cnnlstm_bundle(cfg: ExperimentConfig) -> ModelBundle:
    from eeg_gnn_tpu.models.cnnlstm import cnnlstm_apply, init_cnnlstm_params

    def init(key):
        return init_cnnlstm_params(key, cfg.num_classes), {}

    def apply(params, state, batch, *, training=False, rng=None):
        logits = cnnlstm_apply(params, batch["x"], batch["seq_lengths"],
                               training=training, rng=rng)
        return logits, state

    return ModelBundle("cnnlstm", init, apply)


def _densecnn_bundle(cfg: ExperimentConfig) -> ModelBundle:
    from eeg_gnn_tpu.models.densecnn import densecnn_apply, init_densecnn_params

    freq_dim = 100 if cfg.use_fft else 200
    data_shape = (cfg.max_seq_len * freq_dim, cfg.num_nodes)

    def init(key):
        return init_densecnn_params(key, data_shape, cfg.num_classes)

    def apply(params, state, batch, *, training=False, rng=None):
        x = batch["x"]
        # QUIRK reproduced: the reference driver scrambles the flat clip via
        # transpose(-1,-2).reshape(B, -1, num_nodes) before DenseCNN
        # (train.py:260) — transpose then a row-major reshape interleaves
        # time and channel axes. Published baseline behavior, kept as-is.
        b = x.shape[0]
        x = jnp.swapaxes(x, -1, -2).reshape(b, -1, cfg.num_nodes)
        logits, new_state = densecnn_apply(
            params, state, x, num_classes=cfg.num_classes, training=training,
            rng=rng, dropout_rate=0.2)
        if logits.ndim == 1:
            logits = logits[:, None]
        return logits, new_state

    return ModelBundle("densecnn", init, apply)
