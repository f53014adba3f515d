"""Import reference PyTorch checkpoints into eeg_gnn_tpu param pytrees.

The reference ships 4 pretrained SSL encoder-decoder checkpoints
(``pretrained/*.pth.tar``, each ``{'model_state': ...}`` — README.md:102)
and saves training checkpoints as ``{'epoch','model_state','optimizer_state'}``
(utils.py:130-153). Because our parameter layout matches the reference's
weight layout exactly (see ``ops/diffusion.py``), import is a pure renaming.

torch (CPU) is only needed to deserialize ``.pth.tar`` files; it is imported
lazily so the rest of the framework has no torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint -> {name: np.ndarray} model state."""
    import torch  # lazy; CPU-only deserialization

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _cell_from(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "gate_w": jnp.asarray(state[f"{prefix}.dconv_gate.weight"]),
        "gate_b": jnp.asarray(state[f"{prefix}.dconv_gate.biases"]),
        "cand_w": jnp.asarray(state[f"{prefix}.dconv_candidate.weight"]),
        "cand_b": jnp.asarray(state[f"{prefix}.dconv_candidate.biases"]),
    }


def _encoder_from(state: Dict[str, np.ndarray], num_layers: int):
    return [
        _cell_from(state, f"encoder.encoding_cells.{i}") for i in range(num_layers)
    ]


def import_next_time_pred_params(state: Dict[str, np.ndarray], num_rnn_layers: int):
    """Map a ``DCRNNModel_nextTimePred`` state dict to our param tree.

    Decoder layers >= 1 are one tied cell in the reference (model.py:126-143);
    its state dict stores identical tensors under each layer index — we read
    layer 1 as the shared cell.
    """
    dec: Dict[str, Any] = {"layer0": _cell_from(state, "decoder.decoding_cells.0")}
    if num_rnn_layers > 1:
        dec["shared"] = _cell_from(state, "decoder.decoding_cells.1")
    dec["proj_w"] = jnp.asarray(state["decoder.projection_layer.weight"])
    dec["proj_b"] = jnp.asarray(state["decoder.projection_layer.bias"])
    return {"encoder": _encoder_from(state, num_rnn_layers), "decoder": dec}


def import_classification_params(state: Dict[str, np.ndarray], num_rnn_layers: int):
    """Map a ``DCRNNModel_classification`` state dict to our param tree."""
    return {
        "encoder": _encoder_from(state, num_rnn_layers),
        "fc_w": jnp.asarray(state["fc.weight"]),
        "fc_b": jnp.asarray(state["fc.bias"]),
    }


def import_lstm_params(state: Dict[str, np.ndarray], num_layers: int):
    """Map a reference ``LSTMModel`` state dict (model/lstm.py) to ours."""
    params = {}
    for layer in range(num_layers):
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            params[f"{name}_l{layer}"] = jnp.asarray(state[f"lstm.{name}_l{layer}"])
    params["fc_w"] = jnp.asarray(state["fc.weight"])
    params["fc_b"] = jnp.asarray(state["fc.bias"])
    return params


def import_cnnlstm_params(state: Dict[str, np.ndarray]):
    """Map a reference ``CNN_LSTM`` state dict (model/cnnlstm.py) to ours."""
    params = {
        "conv1_w": jnp.asarray(state["conv1.weight"]),
        "conv1_b": jnp.asarray(state["conv1.bias"]),
        "conv2_w": jnp.asarray(state["conv2.weight"]),
        "conv2_b": jnp.asarray(state["conv2.bias"]),
        "fc1_w": jnp.asarray(state["fc1.weight"]),
        "fc1_b": jnp.asarray(state["fc1.bias"]),
        "fc2_w": jnp.asarray(state["fc2.weight"]),
        "fc2_b": jnp.asarray(state["fc2.bias"]),
    }
    for layer in range(2):
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            params[f"{name}_l{layer}"] = jnp.asarray(state[f"lstm.{name}_l{layer}"])
    return params


def import_densecnn_params(state: Dict[str, np.ndarray], template):
    """Map a reference ``DenseCNN`` state dict (model/densecnn.py +
    model/dense_inception/*) into our (params, state) trees. ``template``
    is ``init_densecnn_params(...)`` output used for the ``_meta`` entry."""
    params, bn_state = template
    out = {}
    prefix = "dense_inception."
    for key in params:
        if key.startswith("inception_"):
            out[key] = {
                br: {
                    "w": jnp.asarray(state[f"{prefix}{key}.{br}.conv.weight"]),
                    "b": jnp.asarray(state[f"{prefix}{key}.{br}.conv.bias"]),
                }
                for br in params[key]
            }
        elif key.startswith("conv1x1_"):
            out[key] = {
                "w": jnp.asarray(state[f"{prefix}{key}.conv.weight"]),
                "b": jnp.asarray(state[f"{prefix}{key}.conv.bias"]),
            }
    out["fc1"] = {"w": jnp.asarray(state[f"{prefix}fc1.weight"]),
                  "b": jnp.asarray(state[f"{prefix}fc1.bias"])}
    out["fc2"] = {"w": jnp.asarray(state[f"{prefix}fc2.weight"]),
                  "b": jnp.asarray(state[f"{prefix}fc2.bias"])}
    out["fcbn1"] = {"scale": jnp.asarray(state[f"{prefix}fcbn1.weight"]),
                    "bias": jnp.asarray(state[f"{prefix}fcbn1.bias"])}
    new_state = {"fcbn1": {
        "mean": jnp.asarray(state[f"{prefix}fcbn1.running_mean"]),
        "var": jnp.asarray(state[f"{prefix}fcbn1.running_var"]),
    }}
    return out, new_state
