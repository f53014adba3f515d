"""Activation-parity tests: our TPU-native DCRNN vs the executing reference
PyTorch models, using the shipped pretrained checkpoints where possible
(BASELINE.md north star: per-layer allclose)."""

import argparse

import numpy as np
import pytest

from conftest import import_reference_module, reference_available

from eeg_gnn_tpu.graphs import compute_supports, load_distance_adjacency
from eeg_gnn_tpu.io import (
    import_classification_params,
    import_next_time_pred_params,
    load_torch_state_dict,
)
from eeg_gnn_tpu.models import (
    DCGRUConfig,
    DCRNNConfig,
    classification_apply,
    dcgru_cell_apply,
    encoder_apply,
    next_time_pred_apply,
)

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")

ADJ_PKL = "/root/reference/data/electrode_graph/adj_mx_3d.pkl"
CKPT_60S = "/root/reference/pretrained/pretrained_distance_graph_60s.pth.tar"
CKPT_CORR_12S = "/root/reference/pretrained/pretrained_correlation_graph_12s.pth.tar"


def _patch_cuda_to_cpu():
    """The reference hard-codes .cuda() (model.py:336); run it on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self


def _ref_args(**over):
    base = dict(
        num_nodes=19, num_rnn_layers=2, rnn_units=64, input_dim=100,
        output_dim=100, max_diffusion_step=2, dcgru_activation="tanh",
        filter_type="laplacian", dropout=0.0, cl_decay_steps=3000,
        use_curriculum_learning=False, num_classes=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def _batched_supports(batch, filter_type, rng, same=True):
    adj = load_distance_adjacency(ADJ_PKL)
    if not same:
        adjs = [np.abs(rng.rand(19, 19).astype(np.float32)) for _ in range(batch)]
        for a in adjs:
            np.fill_diagonal(a, 1.0)
    else:
        adjs = [adj] * batch
    per_sample = [compute_supports(a, filter_type) for a in adjs]
    num_s = len(per_sample[0])
    return np.stack(
        [np.stack([per_sample[b][s] for b in range(batch)]) for s in range(num_s)]
    )  # (S, B, 19, 19)


def _cell_params_from_torch(cell):
    sd = cell.state_dict()
    return {
        "gate_w": np.asarray(sd["dconv_gate.weight"]),
        "gate_b": np.asarray(sd["dconv_gate.biases"]),
        "cand_w": np.asarray(sd["dconv_candidate.weight"]),
        "cand_b": np.asarray(sd["dconv_candidate.biases"]),
    }


@needs_ref
def test_dcgru_cell_matches_reference(rng):
    import torch

    cell_mod = import_reference_module("model.cell")
    b, n, d, h = 3, 19, 100, 64
    ref_cell = cell_mod.DCGRUCell(
        input_dim=d, num_units=h, max_diffusion_step=2, num_nodes=n,
        filter_type="dual_random_walk", nonlinearity="tanh",
    )
    sup = _batched_supports(b, "dual_random_walk", rng, same=False)
    x = rng.randn(b, n, d).astype(np.float32)
    h0 = rng.randn(b, n, h).astype(np.float32)

    with torch.no_grad():
        t_sup = [torch.from_numpy(s) for s in sup]
        _, t_state = ref_cell(
            t_sup, torch.from_numpy(x.reshape(b, -1)), torch.from_numpy(h0.reshape(b, -1))
        )
    ref_out = t_state.numpy().reshape(b, n, h)

    cfg = DCGRUConfig(d, h, 2, n, 2, "tanh")
    ours = np.asarray(
        dcgru_cell_apply(cfg, _cell_params_from_torch(ref_cell), sup, x, h0)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


@needs_ref
def test_encoder_matches_reference(rng):
    import torch

    model_mod = import_reference_module("model.model")
    b, t, n, d, h, layers = 2, 12, 19, 100, 64, 3
    enc = model_mod.DCRNNEncoder(
        input_dim=d, max_diffusion_step=2, hid_dim=h, num_nodes=n,
        num_rnn_layers=layers, dcgru_activation="tanh", filter_type="laplacian",
    )
    sup = _batched_supports(b, "laplacian", rng)
    x = rng.randn(t, b, n, d).astype(np.float32)

    with torch.no_grad():
        t_sup = [torch.from_numpy(s) for s in sup]
        h0 = enc.init_hidden(b)
        hid_stack, out_seq = enc(
            torch.from_numpy(x.reshape(t, b, -1)), h0, t_sup
        )
    ref_stack = hid_stack.numpy().reshape(layers, b, n, h)
    ref_seq = out_seq.numpy().reshape(t, b, n, h)

    cfgs = [DCGRUConfig(d, h, 2, n, 1, "tanh")] + [DCGRUConfig(h, h, 2, n, 1, "tanh")] * 2
    params = [_cell_params_from_torch(enc.encoding_cells[i]) for i in range(layers)]
    our_stack, our_seq = encoder_apply(cfgs, params, sup, x)
    np.testing.assert_allclose(np.asarray(our_stack), ref_stack, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_seq), ref_seq, rtol=1e-4, atol=1e-5)


@needs_ref
@pytest.mark.parametrize(
    "ckpt,filter_type,t_in",
    [(CKPT_60S, "laplacian", 12), (CKPT_CORR_12S, "dual_random_walk", 12)],
)
def test_next_time_pred_matches_pretrained_reference(rng, ckpt, filter_type, t_in):
    """Full SSL enc-dec forward with the shipped pretrained weights."""
    import torch

    _patch_cuda_to_cpu()
    model_mod = import_reference_module("model.model")
    args = _ref_args(num_rnn_layers=3, filter_type=filter_type)
    ref = model_mod.DCRNNModel_nextTimePred(args=args, device="cpu")
    sd = torch.load(ckpt, map_location="cpu")["model_state"]
    ref.load_state_dict(sd)
    ref.eval()

    b = 2
    sup = _batched_supports(b, filter_type, rng, same=(filter_type == "laplacian"))
    enc_in = rng.randn(b, t_in, 19, 100).astype(np.float32)
    dec_in = rng.randn(b, 12, 19, 100).astype(np.float32)

    with torch.no_grad():
        t_sup = [torch.from_numpy(s) for s in sup]
        ref_out = ref(
            torch.from_numpy(enc_in), torch.from_numpy(dec_in), t_sup
        ).numpy()

    cfg = DCRNNConfig(
        num_rnn_layers=3,
        num_supports=2 if filter_type == "dual_random_walk" else 1,
    )
    params = import_next_time_pred_params(load_torch_state_dict(ckpt), 3)
    ours = np.asarray(
        next_time_pred_apply(cfg, params, enc_in, dec_in, sup, training=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


@needs_ref
def test_classification_matches_reference(rng):
    import torch

    _patch_cuda_to_cpu()
    model_mod = import_reference_module("model.model")
    args = _ref_args(num_rnn_layers=2)
    ref = model_mod.DCRNNModel_classification(args=args, num_classes=1, device="cpu")
    ref.eval()

    b, t = 3, 12
    sup = _batched_supports(b, "laplacian", rng)
    x = rng.randn(b, t, 19, 100).astype(np.float32)
    lengths = np.array([t, t - 3, t - 1], dtype=np.int64)

    with torch.no_grad():
        t_sup = [torch.from_numpy(s) for s in sup]
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(lengths), t_sup
        ).numpy()

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = import_classification_params(state, 2)
    cfg = DCRNNConfig(num_rnn_layers=2, num_supports=1, num_classes=1)
    ours = np.asarray(
        classification_apply(cfg, params, x, lengths, sup, training=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


@needs_ref
def test_decoder_weight_tying_gradient_semantics():
    """Shared decoder cell: one leaf, gradients accumulate across layers —
    the functional analogue of the reference's tied module objects
    (model.py:126-143, verified `decoding_cells[1] is decoding_cells[2]`)."""
    import jax
    import jax.numpy as jnp

    params = import_next_time_pred_params(load_torch_state_dict(CKPT_60S), 3)
    # exactly one shared cell leaf set regardless of layer count
    assert set(params["decoder"].keys()) == {"layer0", "shared", "proj_w", "proj_b"}

    cfg = DCRNNConfig(num_rnn_layers=3, num_supports=1)
    rng = np.random.RandomState(0)
    sup = _batched_supports(1, "laplacian", rng)
    enc_in = jnp.asarray(rng.randn(1, 4, 19, 100).astype(np.float32))
    dec_in = jnp.asarray(rng.randn(1, 4, 19, 100).astype(np.float32))

    def loss(p):
        out = next_time_pred_apply(cfg, p, enc_in, dec_in, sup, training=False)
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["decoder"]["shared"]["gate_w"]).sum()) > 0.0


def test_bfloat16_compute_path_close_to_f32(rng):
    """compute_dtype='bfloat16' routes the hoisted GEMM through the MXU
    bf16 path; logits stay within bf16 tolerance of the f32 path."""
    import jax
    import numpy as np

    from eeg_gnn_tpu.models import DCRNNConfig, classification_apply
    from eeg_gnn_tpu.models.dcrnn import init_classification_model

    cfg32 = DCRNNConfig(num_rnn_layers=1, rnn_units=16, input_dim=20,
                        max_diffusion_step=1)
    cfg16 = DCRNNConfig(num_rnn_layers=1, rnn_units=16, input_dim=20,
                        max_diffusion_step=1, compute_dtype="bfloat16")
    params = init_classification_model(jax.random.PRNGKey(0), cfg32)
    x = rng.randn(4, 6, 19, 20).astype(np.float32)
    lengths = np.full((4,), 6, np.int64)
    sup = _batched_supports(4, "laplacian", rng)
    o32 = np.asarray(classification_apply(cfg32, params, x, lengths, sup))
    o16 = np.asarray(classification_apply(cfg16, params, x, lengths, sup))
    np.testing.assert_allclose(o16, o32, rtol=0.05, atol=0.05)
    assert not np.array_equal(o16, o32)  # path actually differs
