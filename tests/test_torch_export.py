"""Two-way checkpoint compatibility: our params -> torch .pth.tar -> the
executing reference model reproduces our activations."""

import numpy as np
import pytest

from conftest import import_reference_module, reference_available
from test_model_parity import _batched_supports, _patch_cuda_to_cpu, _ref_args

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")


@needs_ref
def test_export_roundtrip_through_reference(rng, tmp_path):
    import jax
    import torch

    from eeg_gnn_tpu.io.torch_export import (
        export_next_time_pred_state,
        save_torch_checkpoint,
    )
    from eeg_gnn_tpu.models.dcrnn import (
        DCRNNConfig,
        init_next_time_pred_model,
        next_time_pred_apply,
    )

    _patch_cuda_to_cpu()
    model_mod = import_reference_module("model.model")

    cfg = DCRNNConfig(num_rnn_layers=3, num_supports=1)
    params = init_next_time_pred_model(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "ours.pth.tar")
    save_torch_checkpoint(path, export_next_time_pred_state(params, 3))

    ref = model_mod.DCRNNModel_nextTimePred(
        args=_ref_args(num_rnn_layers=3), device="cpu")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    missing = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in ckpt["model_state"].items()})
    assert not missing.missing_keys and not missing.unexpected_keys
    ref.eval()

    b = 2
    sup = _batched_supports(b, "laplacian", rng)
    enc_in = rng.randn(b, 6, 19, 100).astype(np.float32)
    dec_in = rng.randn(b, 4, 19, 100).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(enc_in), torch.from_numpy(dec_in),
                      [torch.from_numpy(s) for s in sup]).numpy()
    ours = np.asarray(
        next_time_pred_apply(cfg, params, enc_in, dec_in, sup, training=False))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_decoder_single_layer_path(rng):
    """num_rnn_layers=1 decoder has no 'shared' cell; forward works."""
    import jax

    from eeg_gnn_tpu.models.dcrnn import (
        DCRNNConfig,
        init_next_time_pred_model,
        next_time_pred_apply,
    )

    cfg = DCRNNConfig(num_rnn_layers=1, rnn_units=8, input_dim=10,
                      output_dim=10, max_diffusion_step=1, num_supports=1)
    params = init_next_time_pred_model(jax.random.PRNGKey(0), cfg)
    assert "shared" not in params["decoder"]
    sup = np.abs(rng.rand(1, 2, 19, 19)).astype(np.float32)
    out = next_time_pred_apply(
        cfg, params,
        rng.randn(2, 3, 19, 10).astype(np.float32),
        rng.randn(2, 3, 19, 10).astype(np.float32),
        sup, training=False)
    assert np.isfinite(np.asarray(out)).all()
