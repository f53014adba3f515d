"""Equivalence of the operator-stacked DCGRU recurrence (hand-written BPTT,
ops/recurrent.py) with the naive per-step path (XLA auto-adjoint)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.dcgru import encoder_apply, encoder_configs, encoder_init


def _setup(rng, num_supports, batched, activation="tanh", t=7, b=4, n=19,
           din=12, h=16, k=2, layers=2):
    cfgs = encoder_configs(din, h, k, n, num_supports, layers,
                           activation=activation, recurrence="naive")
    params = encoder_init(jax.random.PRNGKey(0), cfgs)
    x_seq = jnp.asarray(rng.randn(t, b, n, din), jnp.float32)
    shape = (num_supports, b, n, n) if batched else (num_supports, n, n)
    supports = jnp.asarray(np.abs(rng.randn(*shape)) / n, jnp.float32)
    return cfgs, params, supports, x_seq


def _with_recurrence(cfgs, name):
    return [dataclasses.replace(c, recurrence=name) for c in cfgs]


@pytest.mark.parametrize("num_supports,batched,activation", [
    (1, True, "tanh"),
    (2, True, "tanh"),
    (1, False, "tanh"),
    (2, True, "relu"),
])
def test_stacked_matches_naive_forward(rng, num_supports, batched, activation):
    cfgs, params, supports, x_seq = _setup(rng, num_supports, batched,
                                           activation)
    stack_n, seq_n = encoder_apply(cfgs, params, supports, x_seq)
    stack_s, seq_s = encoder_apply(_with_recurrence(cfgs, "stacked"), params,
                                   supports, x_seq)
    np.testing.assert_allclose(np.asarray(stack_s), np.asarray(stack_n),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seq_s), np.asarray(seq_n),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("num_supports,batched", [(1, True), (2, True)])
def test_stacked_matches_naive_gradients(rng, num_supports, batched):
    cfgs, params, supports, x_seq = _setup(rng, num_supports, batched)
    # weight the loss over both encoder outputs so every grad path is hit
    w_stack = jnp.asarray(rng.randn(len(cfgs), *x_seq.shape[1:3],
                                    cfgs[0].num_units), jnp.float32)
    w_seq = jnp.asarray(rng.randn(*x_seq.shape[:3], cfgs[0].num_units),
                        jnp.float32)

    def loss(params, cfgs, x):
        stack, seq = encoder_apply(cfgs, params, supports, x)
        return jnp.sum(stack * w_stack) + jnp.sum(seq * w_seq)

    ln, gn = jax.value_and_grad(
        lambda p: loss(p, cfgs, x_seq))(params)
    gxn = jax.grad(lambda x: loss(params, cfgs, x))(x_seq)

    cfgs_s = _with_recurrence(cfgs, "stacked")
    ls, gs = jax.value_and_grad(
        lambda p: loss(p, cfgs_s, x_seq))(params)
    gxs = jax.grad(lambda x: loss(params, cfgs_s, x))(x_seq)

    np.testing.assert_allclose(float(ls), float(ln), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gxs), np.asarray(gxn),
                               rtol=5e-3, atol=2e-3)


def test_chebyshev_operators_match_diffusion(rng):
    """A_m @ x must equal the term-by-term chebyshev_diffusion features."""
    from eeg_gnn_tpu.ops.diffusion import chebyshev_diffusion
    from eeg_gnn_tpu.ops.recurrent import chebyshev_operators

    s, b, n, d, k = 2, 3, 19, 8, 2
    supports = jnp.asarray(np.abs(rng.randn(s, b, n, n)) / n, jnp.float32)
    x = jnp.asarray(rng.randn(b, n, d), jnp.float32)

    feats = chebyshev_diffusion(supports, x, k)  # (B, N, D, M)
    a_ops = chebyshev_operators(supports, k)  # (M, B, N, N)
    via_ops = jnp.einsum("mbij,bjd->bidm", a_ops, x)
    np.testing.assert_allclose(np.asarray(via_ops), np.asarray(feats),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("num_supports,batch,tile,activation", [
    (1, 6, 4, "tanh"),   # padding (6 -> 8)
    (2, 4, 4, "tanh"),   # dual-support, exact tile
    (1, 5, 2, "relu"),   # padding + relu
])
def test_pallas_recurrence_matches_stacked(rng, num_supports, batch, tile,
                                           activation):
    """Whole-sequence Pallas kernels (Mosaic interpreter on CPU) vs the
    stacked XLA implementation: forward and every gradient."""
    from eeg_gnn_tpu.ops.pallas_recurrent import dcgru_layer_recurrence_pallas
    from eeg_gnn_tpu.ops.recurrent import (
        chebyshev_operators,
        dcgru_layer_recurrence,
    )

    t, n, h, k = 5, 19, 16, 2
    m = num_supports * k + 1
    sup = jnp.asarray(np.abs(rng.randn(num_supports, batch, n, n)) / n,
                      jnp.float32)
    a = chebyshev_operators(sup, k)
    gx = jnp.asarray(rng.randn(t, batch, n, 2 * h), jnp.float32)
    cx = jnp.asarray(rng.randn(t, batch, n, h), jnp.float32)
    wg = jnp.asarray(rng.randn(m, h, 2 * h) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(m, h, h) * 0.1, jnp.float32)
    bg = jnp.asarray(rng.randn(2 * h) * 0.1, jnp.float32)
    bc = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.randn(batch, n, h) * 0.1, jnp.float32)
    wl = jnp.asarray(rng.randn(t, batch, n, h), jnp.float32)
    wlast = jnp.asarray(rng.randn(batch, n, h), jnp.float32)

    args = (gx, cx, wg, wc, bg, bc, h0)

    def loss_s(args):
        hl, hs = dcgru_layer_recurrence(a, *args, activation)
        return jnp.sum(hs * wl) + jnp.sum(hl * wlast)

    def loss_p(args):
        hl, hs = dcgru_layer_recurrence_pallas(a, *args, activation, tile,
                                               True)
        return jnp.sum(hs * wl) + jnp.sum(hl * wlast)

    _, hs_s = dcgru_layer_recurrence(a, *args, activation)
    _, hs_p = dcgru_layer_recurrence_pallas(a, *args, activation, tile, True)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)

    gs = jax.grad(loss_s)(args)
    gp = jax.grad(loss_p)(args)
    for name, a_, b_ in zip(("gx", "cx", "wg", "wc", "bg", "bc", "h0"),
                            gs, gp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_recurrence_shared_graph(rng):
    """Shared (batch-broadcast) operator stack through the Pallas path."""
    from eeg_gnn_tpu.ops.pallas_recurrent import dcgru_layer_recurrence_pallas
    from eeg_gnn_tpu.ops.recurrent import (
        chebyshev_operators,
        dcgru_layer_recurrence,
    )

    t, b, n, h, k = 4, 4, 19, 8, 2
    sup = jnp.asarray(np.abs(rng.randn(1, n, n)) / n, jnp.float32)
    a = chebyshev_operators(sup, k)[:, None]  # (M, 1, N, N)
    m = a.shape[0]
    gx = jnp.asarray(rng.randn(t, b, n, 2 * h), jnp.float32)
    cx = jnp.asarray(rng.randn(t, b, n, h), jnp.float32)
    wg = jnp.asarray(rng.randn(m, h, 2 * h) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(m, h, h) * 0.1, jnp.float32)
    bg = jnp.zeros(2 * h, jnp.float32)
    bc = jnp.zeros(h, jnp.float32)
    h0 = jnp.zeros((b, n, h), jnp.float32)

    _, hs_s = dcgru_layer_recurrence(a, gx, cx, wg, wc, bg, bc, h0, "tanh")
    _, hs_p = dcgru_layer_recurrence_pallas(a, gx, cx, wg, wc, bg, bc, h0,
                                            "tanh", 2, True)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)


def test_pallas_tile_legalization():
    """With the node dim padded to a multiple of 8, every slab slice is
    sublane-aligned, so any tile <= batch is legal (round-1's divisibility
    rule is gone)."""
    from eeg_gnn_tpu.ops.pallas_recurrent import _legal_tile

    n = 19
    assert _legal_tile(16, 64, n) == 16
    assert _legal_tile(8, 64, n) == 8
    assert _legal_tile(4, 64, n) == 4      # no longer bumped
    assert _legal_tile(4, 6, n) == 4
    assert _legal_tile(32, 12, n) == 12    # clipped to batch
    assert _legal_tile(3, 12, n) == 3
    assert _legal_tile(16, 8, n) == 8      # capped at batch
    # an even node count relaxes the divisibility requirement
    assert _legal_tile(4, 64, 16) == 4     # 64 % 8 == 0


def test_pallas_recurrence_bf16_streams(rng):
    """bf16 gate_x/cand_x streams + bf16 ru/c residuals (compute_dtype
    bfloat16 path): forward and grads track the f32 stacked oracle within
    bf16 tolerance; cotangent dtypes match the primal streams."""
    from eeg_gnn_tpu.ops.pallas_recurrent import dcgru_layer_recurrence_pallas
    from eeg_gnn_tpu.ops.recurrent import (
        chebyshev_operators,
        dcgru_layer_recurrence,
    )

    t, b, n, h, k = 5, 4, 19, 16, 2
    m = k + 1
    sup = jnp.asarray(np.abs(rng.randn(1, b, n, n)) / n, jnp.float32)
    a = chebyshev_operators(sup, k)
    gx = jnp.asarray(rng.randn(t, b, n, 2 * h), jnp.float32)
    cx = jnp.asarray(rng.randn(t, b, n, h), jnp.float32)
    wg = jnp.asarray(rng.randn(m, h, 2 * h) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(m, h, h) * 0.1, jnp.float32)
    bg = jnp.zeros(2 * h)
    bc = jnp.zeros(h)
    h0 = jnp.zeros((b, n, h))

    _, hs_ref = dcgru_layer_recurrence(a, gx, cx, wg, wc, bg, bc, h0, "tanh")

    gx16, cx16 = gx.astype(jnp.bfloat16), cx.astype(jnp.bfloat16)
    _, hs_16 = dcgru_layer_recurrence_pallas(
        a, gx16, cx16, wg, wc, bg, bc, h0, "tanh", 2, True, "bfloat16")
    # h_seq streams in the residual dtype (round 3: halves its HBM write,
    # the bwd h_prev re-read and the d_seq cotangent stream); the in-kernel
    # state carry stays f32
    assert hs_16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(hs_16, np.float32),
                               np.asarray(hs_ref),
                               rtol=0.05, atol=0.05)

    def loss16(args):
        gx_, cx_, wg_ = args
        hl, hs = dcgru_layer_recurrence_pallas(
            a, gx_, cx_, wg_, wc, bg, bc, h0, "tanh", 2, True, "bfloat16")
        return jnp.sum(hl) + jnp.sum(hs)

    g16 = jax.grad(loss16)((gx16, cx16, wg))
    assert g16[0].dtype == jnp.bfloat16 and g16[1].dtype == jnp.bfloat16
    assert g16[2].dtype == jnp.float32

    def loss_ref(wg_):
        hl, hs = dcgru_layer_recurrence(a, gx, cx, wg_, wc, bg, bc, h0,
                                        "tanh")
        return jnp.sum(hl) + jnp.sum(hs)

    gref = jax.grad(loss_ref)(wg)
    np.testing.assert_allclose(np.asarray(g16[2]), np.asarray(gref),
                               rtol=0.1, atol=0.3)


@pytest.mark.parametrize("num_supports,batch,tile,bf16", [
    (1, 6, 4, False),   # padding (6 -> 8)
    (2, 5, 2, False),   # dual-support + padding
    (1, 8, 4, True),    # bf16 streams/residuals
])
def test_pallas_xin_matches_stacked(rng, num_supports, batch, tile, bf16):
    """x-in-kernel recurrence (raw input + in-kernel input diffusion and
    projection, the round-4 default TPU path) vs the stacked oracle with a
    hoisted x_proj: forward and every gradient (Mosaic interpreter)."""
    from eeg_gnn_tpu.ops.diffusion import chebyshev_diffusion
    from eeg_gnn_tpu.ops.pallas_recurrent import (
        dcgru_layer_recurrence_pallas_xin,
    )
    from eeg_gnn_tpu.ops.recurrent import (
        chebyshev_operators,
        dcgru_layer_recurrence,
    )

    t, n, h, d, k = 5, 19, 16, 12, 2
    m = num_supports * k + 1
    sup = jnp.asarray(np.abs(rng.randn(num_supports, batch, n, n)) / n,
                      jnp.float32)
    a = chebyshev_operators(sup, k)
    io = jnp.bfloat16 if bf16 else jnp.float32
    x = jnp.asarray(rng.randn(t, batch, n, d), jnp.float32).astype(io)
    wxg = jnp.asarray(rng.randn(d * m, 2 * h) * 0.1, jnp.float32)
    wxc = jnp.asarray(rng.randn(d * m, h) * 0.1, jnp.float32)
    wg = jnp.asarray(rng.randn(m, h, 2 * h) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.randn(m, h, h) * 0.1, jnp.float32)
    bg = jnp.asarray(rng.randn(2 * h) * 0.1, jnp.float32)
    bc = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.randn(batch, n, h) * 0.1, jnp.float32)
    wl = jnp.asarray(rng.randn(t, batch, n, h), jnp.float32)
    rdt = "bfloat16" if bf16 else "float32"

    def loss_s(op):
        x_, wxg_, wxc_, wg_, wc_, bg_, bc_, h0_ = op
        xf = chebyshev_diffusion(sup, x_.astype(jnp.float32), k).reshape(
            t, batch, n, d * m)
        hl, hs = dcgru_layer_recurrence(a, xf @ wxg_, xf @ wxc_, wg_, wc_,
                                        bg_, bc_, h0_, "tanh")
        return jnp.sum(hs * wl)

    def loss_p(op):
        x_, wxg_, wxc_, wg_, wc_, bg_, bc_, h0_ = op
        wxg_f = wxg_.reshape(d, m, -1).transpose(1, 0, 2).reshape(m * d, -1)
        wxc_f = wxc_.reshape(d, m, -1).transpose(1, 0, 2).reshape(m * d, -1)
        hl, hs = dcgru_layer_recurrence_pallas_xin(
            a, x_, wxg_f, wxc_f, wg_, wc_, bg_, bc_, h0_, "tanh", tile,
            True, rdt)
        return jnp.sum(hs * wl)

    op = (x, wxg, wxc, wg, wc, bg, bc, h0)
    np.testing.assert_allclose(float(loss_p(op)), float(loss_s(op)),
                               rtol=2e-2 if bf16 else 1e-4)
    gs = jax.grad(loss_s)(op)
    gp = jax.grad(loss_p)(op)
    for name, a_, b_ in zip(("x", "wxg", "wxc", "wg", "wc", "bg", "bc",
                             "h0"), gs, gp):
        a_, b_ = np.asarray(a_, np.float32), np.asarray(b_, np.float32)
        if bf16:
            # bf16 streams/residuals accumulate quantization noise over
            # the recurrence: bound the NORMALIZED inf-norm error (same
            # criterion + tolerance as the on-chip parity harness,
            # benchmarks/tpu_kernel_parity.py BF16_TOL)
            scale = max(np.abs(a_).max(), 1e-9)
            assert np.abs(a_ - b_).max() / scale <= 2e-2, name
        else:
            np.testing.assert_allclose(b_, a_, rtol=1e-4, atol=1e-5,
                                       err_msg=name)


def test_xin_tile_budget_sweep():
    """VERDICT r4 #7: no hard-coded pass/fail byte constant in the tile
    selection — budgets perturbed +-30% around the device-derived default
    still yield a legal tile (monotone in the budget), and a shape whose
    MINIMAL tile exceeds the budget raises a clear ValueError instead of
    reaching the Mosaic compiler (ADVICE r4 low)."""
    from eeg_gnn_tpu.ops.pallas_recurrent import (
        _XIN_VMEM_FRACTION,
        _group_size,
        _xin_tile,
        vmem_budget_bytes,
    )

    base = vmem_budget_bytes(_XIN_VMEM_FRACTION)
    tiles = {}
    for f in (0.7, 0.85, 1.0, 1.15, 1.3):
        # flagship shape: Np=24, H=64, D=100, shared graph, bf16 streams
        tb = _xin_tile(512, 512, 3, 24, 64, 100, True, 2,
                       budget_bytes=int(base * f))
        assert tb >= 1
        assert tb % _group_size(tb, 24) == 0
        tiles[f] = tb
    assert tiles[1.3] >= tiles[1.0] >= tiles[0.7]
    # the default budget must keep the calibrated flagship tile reachable
    assert tiles[1.0] >= 36

    # per-clip operator slabs at a huge padded node count: even tile=1
    # cannot fit a tiny budget -> explicit error naming the shape
    with pytest.raises(ValueError, match="minimal batch tile"):
        _xin_tile(8, 8, 7, 512, 256, 256, False, 4, budget_bytes=2 * 10 ** 6)


def test_xin_tile_env_override(monkeypatch):
    """EEG_GNN_TPU_VMEM_BYTES scales the default budget for devices with
    more (or less) VMEM than the 16 MiB baseline."""
    from eeg_gnn_tpu.ops import pallas_recurrent as pr

    small = pr._xin_tile(512, 512, 3, 24, 64, 100, True, 2)
    monkeypatch.setenv("EEG_GNN_TPU_VMEM_BYTES", str(32 * 2 ** 20))
    large = pr._xin_tile(512, 512, 3, 24, 64, 100, True, 2)
    assert large >= small
