"""Baseline model parity: LSTM / CNN-LSTM / DenseCNN vs the executing
reference torch modules with transplanted weights."""

import argparse

import numpy as np
import pytest

from conftest import import_reference_module, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")


@needs_ref
def test_lstm_matches_reference(rng):
    import torch

    ref_mod = import_reference_module("model.lstm")
    from eeg_gnn_tpu.io.torch_import import import_lstm_params
    from eeg_gnn_tpu.models.lstm import lstm_model_apply

    args = argparse.Namespace(num_nodes=19, rnn_units=64, num_rnn_layers=2,
                              input_dim=100, dropout=0.0)
    ref = ref_mod.LSTMModel(args, num_classes=1, device="cpu")
    ref.eval()

    b, t = 3, 10
    x = rng.randn(b, t, 19, 100).astype(np.float32)
    lengths = np.array([10, 7, 9], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()

    params = import_lstm_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    ours = np.asarray(lstm_model_apply(params, x, lengths, num_layers=2,
                                       hidden_size=64))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


@needs_ref
def test_cnnlstm_matches_reference(rng):
    import torch

    ref_mod = import_reference_module("model.cnnlstm")
    from eeg_gnn_tpu.io.torch_import import import_cnnlstm_params
    from eeg_gnn_tpu.models.cnnlstm import cnnlstm_apply

    ref = ref_mod.CNN_LSTM(num_classes=1)
    ref.eval()

    b, t = 2, 6
    x = rng.randn(b, t, 19, 100).astype(np.float32)
    lengths = np.array([6, 4], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()

    params = import_cnnlstm_params(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    ours = np.asarray(cnnlstm_apply(params, x, lengths))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


@needs_ref
@pytest.mark.parametrize("training", [False, True])
def test_densecnn_matches_reference(rng, training):
    import json

    import torch

    ref_dc = import_reference_module("model.densecnn")
    from eeg_gnn_tpu.io.torch_import import import_densecnn_params
    from eeg_gnn_tpu.models.densecnn import densecnn_apply, init_densecnn_params

    with open("/root/reference/model/dense_inception/params.json") as f:
        pjson = json.load(f)

    class P:
        type = pjson["type"]
        dropout_rate = 0.0  # disable dropout for determinism
        num_inception_layers = pjson["num_inception_layers"]
        num_channels = pjson["num_channels"]

    data_shape = (12 * 100, 19)  # 12 s FFT config
    ref = ref_dc.DenseCNN(P, data_shape=data_shape, num_classes=1)
    ref.train(training)

    b = 4 if training else 2  # BN batch stats need > 1 sample
    x = rng.randn(b, data_shape[0], 19).astype(np.float32)
    # snapshot params BEFORE the torch forward (train mode mutates BN
    # running stats in-place)
    sd_before = {k: v.numpy().copy() for k, v in ref.state_dict().items()}
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    import jax

    template = init_densecnn_params(jax.random.PRNGKey(0), data_shape, 1,
                                    P.num_channels)
    params, state = import_densecnn_params(sd_before, template)
    ours, new_state = densecnn_apply(params, state, x, num_classes=1,
                                     training=training, dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-3, atol=2e-3)

    if training:
        # running-stat update matches torch's BN momentum rule
        sd = ref.state_dict()
        np.testing.assert_allclose(
            np.asarray(new_state["fcbn1"]["mean"]),
            sd["dense_inception.fcbn1.running_mean"].numpy(), rtol=1e-3, atol=1e-4)
