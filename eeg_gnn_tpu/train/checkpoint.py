"""Checkpointing: best/last semantics, resume, fine-tune transplant.

Parity: reference ``utils.CheckpointSaver`` (utils.py:83-153) — every eval
writes ``last``; when the monitored metric improves (direction from
``maximize_metric``) it is copied to ``best`` — and
``utils.build_finetune_model`` (utils.py:166-176), which transplants only
the encoder's gate/candidate diffusion weights from a (deeper) pretrained
SSL model into a fresh task model.

Storage is a flat ``.npz`` of path-keyed arrays plus a JSON sidecar of
metadata — dependency-free and mesh-agnostic (params are replicated;
sharded state is pulled to host first).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path: str, params, metadata: Optional[Dict[str, Any]] = None):
    flat = _flatten(jax.device_get(params))
    np.savez(path, **flat)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, sort_keys=True, default=str)


def load_params_like(path: str, template):
    """Load a flat npz back into the structure of ``template``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(
                rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)
            )
        key = prefix[:-1]
        arr = data[key]
        want = np.asarray(tree).shape
        if arr.shape != want:
            raise ValueError(f"checkpoint {key}: shape {arr.shape} != {want}")
        return arr

    return rebuild(template)


class CheckpointSaver:
    """best/last checkpoint manager (reference utils.py:83-153 semantics)."""

    def __init__(self, save_dir: str, metric_name: str,
                 maximize_metric: bool = False, log=None):
        self.save_dir = save_dir
        self.metric_name = metric_name
        self.maximize_metric = maximize_metric
        self.best_val = None
        self.log = log
        os.makedirs(save_dir, exist_ok=True)
        self._print(
            f"Saver will {'max' if maximize_metric else 'min'}imize {metric_name}..."
        )

    def _print(self, msg):
        if self.log is not None:
            self.log.info(msg)

    def is_best(self, metric_val) -> bool:
        if metric_val is None:
            return False
        if self.best_val is None:
            return True
        return (
            (self.maximize_metric and self.best_val <= metric_val)
            or (not self.maximize_metric and self.best_val >= metric_val)
        )

    @property
    def last_path(self):
        return os.path.join(self.save_dir, "last.npz")

    @property
    def best_path(self):
        return os.path.join(self.save_dir, "best.npz")

    def save(self, epoch: int, params, opt_state, metric_val, model_state=None):
        meta = {"epoch": epoch, self.metric_name: metric_val}
        save_params(self.last_path[:-4], params, metadata=meta)
        # Optimizer state saved alongside for exact resume — the reference
        # stores it too but never restores it (utils.py:156-163 called
        # without optimizer from train.py); we restore it when asked.
        save_params(self.last_path[:-4] + ".opt", opt_state)
        if model_state:
            save_params(self.last_path[:-4] + ".state", model_state)
        if self.is_best(metric_val):
            self.best_val = metric_val
            shutil.copy(self.last_path, self.best_path)
            shutil.copy(self.last_path[:-4] + ".opt.npz",
                        self.best_path[:-4] + ".opt.npz")
            if model_state:
                shutil.copy(self.last_path[:-4] + ".state.npz",
                            self.best_path[:-4] + ".state.npz")
            if os.path.exists(self.last_path + ".json"):
                shutil.copy(self.last_path + ".json", self.best_path + ".json")
            self._print(f"New best checkpoint at epoch {epoch}...")


def build_finetune_params(new_params, pretrained_params, num_rnn_layers: int):
    """Transplant encoder diffusion-conv weights from a pretrained SSL model.

    Parity: reference ``build_finetune_model`` (utils.py:166-176): only the
    first ``num_rnn_layers`` encoder cells' gate/candidate transforms are
    copied (the pretrained model may be deeper); decoder/head stay fresh.
    """
    out = dict(new_params)
    enc = [dict(c) for c in new_params["encoder"]]
    for layer in range(num_rnn_layers):
        for k in ("gate_w", "gate_b", "cand_w", "cand_b"):
            enc[layer][k] = pretrained_params["encoder"][layer][k]
    out["encoder"] = enc
    return out


def get_save_dir(base_dir: str, training: bool, id_max: int = 500) -> str:
    """Unique numbered run dir (reference utils.py:61-80)."""
    subdir = "train" if training else "test"
    for uid in range(1, id_max):
        save_dir = os.path.join(base_dir, subdir, f"{subdir}-{uid:02d}")
        if not os.path.exists(save_dir):
            os.makedirs(save_dir)
            return save_dir
    raise RuntimeError("Too many save directories created with the same name.")
