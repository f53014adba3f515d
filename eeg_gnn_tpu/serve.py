"""Serving / batched-inference API.

The reference's closest counterpart is the eval-only entry
(``train.py`` without ``--do_train``, args.py:211-213): load a checkpoint,
run the test loader, print metrics. This module packages that capability as
a deployable predictor designed for TPU serving:

- ONE jitted program at a fixed batch shape (no recompiles in steady state;
  short batches are zero-padded and the padding sliced off on host);
- probabilities computed on device (sigmoid / softmax fused into the same
  program as the model);
- an optional **raw-clip front door**: with a
  :class:`~eeg_gnn_tpu.data.device_pipeline.DevicePipeline`, the input is
  the raw (B, C, L) signal window and FFT featurization, standardization,
  correlation-graph + support construction all fuse into the same XLA
  program — raw EEG in, seizure probability out, one device round trip;
- optional `jax.sharding` mesh for data-parallel inference across chips.

Checkpoints load from this framework's ``.npz`` files or directly from the
reference's torch ``.pth.tar`` files (io/torch_import.py).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eeg_gnn_tpu.config import ExperimentConfig
from eeg_gnn_tpu.constants import FREQUENCY

_TORCH_SUFFIXES = (".pth.tar", ".pth", ".pt", ".tar")


def _pad_to(a: np.ndarray, size: int, axis: int = 0) -> np.ndarray:
    if a.shape[axis] == size:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return np.pad(a, pad)


def load_params_for(cfg: ExperimentConfig, checkpoint_path: str,
                    template_params) -> Any:
    """Load ``.npz`` (ours) or ``.pth.tar`` (reference torch) weights into
    the template's structure (same dispatch as train/trainer.py warm start).
    """
    if checkpoint_path.endswith(_TORCH_SUFFIXES):
        from eeg_gnn_tpu.io import load_torch_state_dict
        from eeg_gnn_tpu.io.torch_import import (
            import_classification_params,
            import_cnnlstm_params,
            import_densecnn_params,
            import_lstm_params,
        )

        state = load_torch_state_dict(checkpoint_path)
        if cfg.model_name == "dcrnn":
            return import_classification_params(state, cfg.num_rnn_layers)
        if cfg.model_name == "lstm":
            return import_lstm_params(state, cfg.num_rnn_layers)
        if cfg.model_name == "cnnlstm":
            return import_cnnlstm_params(state)
        if cfg.model_name == "densecnn":
            return import_densecnn_params(state, template_params)
        raise NotImplementedError(cfg.model_name)
    from eeg_gnn_tpu.train.checkpoint import load_params_like

    return load_params_like(checkpoint_path, template_params)


class Predictor:
    """Fixed-shape batched predictor over any registry model.

    Args:
        cfg: experiment config (model family, graph type, shapes).
        params / model_state: trained parameters (see
            :meth:`from_checkpoint`).
        batch_size: the compiled batch shape; inputs of any length are
            chunked/padded to it. Defaults to ``cfg.test_batch_size``.
        threshold: decision threshold for detection (use the dev-tuned
            ``best_thresh`` from training for parity with the reference's
            final-eval protocol, train.py:166-194).
        pipeline: optional DevicePipeline enabling :meth:`predict_proba_raw`
            and supports-free featurized prediction.
        mesh: optional `jax.sharding.Mesh` for data-parallel inference.
    """

    def __init__(self, cfg: ExperimentConfig, params, model_state=None, *,
                 batch_size: Optional[int] = None, threshold: float = 0.5,
                 pipeline=None, mesh=None):
        from eeg_gnn_tpu.models.registry import build_model

        self.cfg = cfg
        self.bundle = build_model(cfg)
        self.params = params
        self.model_state = model_state or {}
        self.batch_size = int(batch_size or cfg.test_batch_size)
        self.threshold = float(threshold)
        self.pipeline = pipeline
        self.mesh = mesh
        n_cls = cfg.num_classes

        def probs_of(logits):
            if n_cls == 1:
                return jax.nn.sigmoid(logits.reshape(-1))
            return jax.nn.softmax(logits, axis=-1)

        def infer(params, model_state, batch):
            logits, _ = self.bundle.apply(params, model_state, batch,
                                          training=False, rng=None)
            return probs_of(logits)

        def infer_raw(params, model_state, raw, seq_lengths):
            x, supports = pipeline(raw, jax.random.PRNGKey(0), False)
            batch = {"x": x, "seq_lengths": seq_lengths, "supports": supports}
            logits, _ = self.bundle.apply(params, model_state, batch,
                                          training=False, rng=None)
            return probs_of(logits)

        self._infer = jax.jit(infer)
        self._infer_raw = jax.jit(infer_raw) if pipeline is not None else None

    # -- construction -----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str,
                        cfg: Optional[ExperimentConfig] = None,
                        **kwargs) -> "Predictor":
        """Build a predictor straight from a checkpoint file (.npz or
        reference .pth.tar)."""
        from eeg_gnn_tpu.models.registry import build_model

        cfg = cfg or ExperimentConfig(load_model_path=checkpoint_path).finalize()
        template, model_state = build_model(cfg).init(jax.random.PRNGKey(0))
        params = load_params_for(cfg, checkpoint_path, template)
        return cls(cfg, params, model_state, **kwargs)

    # -- helpers ----------------------------------------------------------

    def _default_supports(self, batch: int):
        if self.pipeline is not None and self.pipeline.dist_supports is not None:
            sup = self.pipeline.dist_supports  # (S, N, N)
            return jnp.broadcast_to(sup[:, None], (sup.shape[0], batch)
                                    + sup.shape[1:])
        raise ValueError(
            "supports required: pass `supports`/`adjacency`, or construct "
            "the Predictor with a DevicePipeline (combined graph) so the "
            "distance-graph supports are available.")

    def _chunks(self, n: int) -> Iterator[Tuple[int, int]]:
        for lo in range(0, n, self.batch_size):
            yield lo, min(lo + self.batch_size, n)

    # -- featurized front door --------------------------------------------

    def predict_proba(self, x: np.ndarray,
                      seq_lengths: Optional[np.ndarray] = None,
                      supports: Optional[np.ndarray] = None,
                      adjacency: Optional[np.ndarray] = None) -> np.ndarray:
        """Probabilities for featurized clips.

        Args:
            x: (n, T, N, D) featurized clips (any n — chunked internally).
            seq_lengths: (n,) true lengths; defaults to full T.
            supports: (S, n, N, N) precomputed supports; or
            adjacency: (n, N, N) per-clip adjacency — supports are then
                built on device (graphs.compute_supports_jnp).

        Returns:
            (n,) seizure probabilities (detection) or (n, C) class
            probabilities (classification).
        """
        x = np.asarray(x, np.float32)
        n, t = x.shape[0], x.shape[1]
        if seq_lengths is None:
            seq_lengths = np.full((n,), t, np.int64)
        out = []
        for lo, hi in self._chunks(n):
            bs = self.batch_size
            xb = jnp.asarray(_pad_to(x[lo:hi], bs))
            lb = jnp.asarray(_pad_to(np.asarray(seq_lengths[lo:hi]), bs))
            if supports is not None:
                sb = jnp.asarray(_pad_to(np.asarray(supports[:, lo:hi]), bs,
                                         axis=1))
            elif adjacency is not None:
                from eeg_gnn_tpu.graphs import compute_supports_jnp

                ab = jnp.asarray(_pad_to(
                    np.asarray(adjacency[lo:hi], np.float32), bs))
                sb = compute_supports_jnp(ab, self.cfg.filter_type)
            else:
                sb = self._default_supports(bs)
            batch = {"x": xb, "seq_lengths": lb, "supports": sb}
            if self.mesh is not None:
                from eeg_gnn_tpu.train.step import shard_batch

                batch = shard_batch(batch, self.mesh)
            probs = self._infer(self.params, self.model_state, batch)
            out.append(np.asarray(probs)[:hi - lo])
        return np.concatenate(out) if out else np.empty((0,), np.float32)

    # -- raw-signal front door ---------------------------------------------

    def predict_proba_raw(self, raw: np.ndarray,
                          seq_lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """Probabilities straight from raw (n, C, L) signal windows: FFT
        featurization, standardization and graph/support construction run
        inside the same XLA program as the model (device_pipeline.py)."""
        if self._infer_raw is None:
            raise ValueError("predict_proba_raw needs a DevicePipeline — "
                             "construct the Predictor with `pipeline=`.")
        raw = np.asarray(raw, np.float32)
        n = raw.shape[0]
        t = raw.shape[-1] // (self.pipeline.time_step_size * FREQUENCY)
        if seq_lengths is None:
            seq_lengths = np.full((n,), t, np.int64)
        out = []
        for lo, hi in self._chunks(n):
            bs = self.batch_size
            rb = jnp.asarray(_pad_to(raw[lo:hi], bs))
            lb = jnp.asarray(_pad_to(np.asarray(seq_lengths[lo:hi]), bs))
            probs = self._infer_raw(self.params, self.model_state, rb, lb)
            out.append(np.asarray(probs)[:hi - lo])
        return np.concatenate(out) if out else np.empty((0,), np.float32)

    # -- decisions / streaming ---------------------------------------------

    def predict(self, *args, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
        """(predictions, probabilities); threshold applies to detection."""
        probs = self.predict_proba(*args, **kwargs)
        if self.cfg.num_classes == 1:
            return (probs > self.threshold).astype(np.int64), probs
        return probs.argmax(axis=-1), probs

    def stream(self, batches: Iterable[Dict[str, np.ndarray]]
               ) -> Iterator[np.ndarray]:
        """Stream probabilities over an iterable of feature dicts
        (keys as in :meth:`predict_proba`)."""
        for b in batches:
            yield self.predict_proba(
                b["x"], b.get("seq_lengths"), b.get("supports"),
                b.get("adjacency"))
