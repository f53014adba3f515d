"""Export eeg_gnn_tpu params to reference-compatible torch state dicts.

The inverse of ``io/torch_import.py``: models trained here can be loaded by
the upstream PyTorch implementation (same weight layout), so migration
works in both directions.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _cell_to(state: Dict[str, Any], prefix: str, cell):
    state[f"{prefix}.dconv_gate.weight"] = np.asarray(cell["gate_w"])
    state[f"{prefix}.dconv_gate.biases"] = np.asarray(cell["gate_b"])
    state[f"{prefix}.dconv_candidate.weight"] = np.asarray(cell["cand_w"])
    state[f"{prefix}.dconv_candidate.biases"] = np.asarray(cell["cand_b"])


def export_next_time_pred_state(params, num_rnn_layers: int) -> Dict[str, np.ndarray]:
    """Our SSL enc-dec params -> ``DCRNNModel_nextTimePred`` state dict.

    The tied decoder cell is written under every layer index >= 1, exactly
    like torch's state_dict of the reference's shared module objects.
    """
    state: Dict[str, np.ndarray] = {}
    for i, cell in enumerate(params["encoder"]):
        _cell_to(state, f"encoder.encoding_cells.{i}", cell)
    dec = params["decoder"]
    _cell_to(state, "decoder.decoding_cells.0", dec["layer0"])
    for i in range(1, num_rnn_layers):
        _cell_to(state, f"decoder.decoding_cells.{i}", dec["shared"])
    state["decoder.projection_layer.weight"] = np.asarray(dec["proj_w"])
    state["decoder.projection_layer.bias"] = np.asarray(dec["proj_b"])
    return state


def export_classification_state(params) -> Dict[str, np.ndarray]:
    """Our classifier params -> ``DCRNNModel_classification`` state dict."""
    state: Dict[str, np.ndarray] = {}
    for i, cell in enumerate(params["encoder"]):
        _cell_to(state, f"encoder.encoding_cells.{i}", cell)
    state["fc.weight"] = np.asarray(params["fc_w"])
    state["fc.bias"] = np.asarray(params["fc_b"])
    return state


def save_torch_checkpoint(path: str, state: Dict[str, np.ndarray],
                          epoch: int = 0):
    """Write a ``.pth.tar`` the reference's ``load_model_checkpoint`` reads
    (utils.py:156-163: dict with 'model_state')."""
    import torch

    torch_state = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in state.items()}
    torch.save({"epoch": epoch, "model_state": torch_state,
                "optimizer_state": {}}, path)
