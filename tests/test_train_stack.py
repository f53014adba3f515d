"""Training-stack unit tests: losses vs reference formulas, optimizer vs
torch Adam semantics, checkpoint round-trip + transplant."""

import numpy as np
import pytest

from conftest import import_reference_module, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")


@needs_ref
def test_losses_match_reference(rng):
    import torch

    ref = import_reference_module("utils")
    from eeg_gnn_tpu.train.losses import (
        compute_regression_loss,
        masked_mae_loss,
        masked_mse_loss,
    )

    y_pred = rng.randn(4, 12, 19, 100).astype(np.float32)
    y_true = rng.randn(4, 12, 19, 100).astype(np.float32)
    y_true[0, :3] = 0.0  # masked region

    np.testing.assert_allclose(
        float(masked_mae_loss(y_pred, y_true)),
        float(ref.masked_mae_loss(torch.tensor(y_pred), torch.tensor(y_true))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(masked_mse_loss(y_pred, y_true)),
        float(ref.masked_mse_loss(torch.tensor(y_pred), torch.tensor(y_true))),
        rtol=1e-5,
    )

    # inverse-scaled path, incl. the 'MAE'-hits-MSE-branch quirk
    scaler = ref.StandardScaler(mean=np.float64(1.5), std=np.float64(2.5))
    for name in ("mae", "MAE"):
        theirs = float(
            ref.compute_regression_loss(
                torch.tensor(y_true), torch.tensor(y_pred),
                standard_scaler=scaler, loss_fn=name)
        )
        ours = float(
            compute_regression_loss(y_true, y_pred, mean=1.5, std=2.5,
                                    loss_fn=name)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4)


@needs_ref
def test_bce_ce_match_torch(rng):
    import torch

    from eeg_gnn_tpu.train.losses import bce_with_logits, cross_entropy

    logits = rng.randn(16).astype(np.float32)
    y = (rng.rand(16) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        float(bce_with_logits(logits, y)),
        float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(y))),
        rtol=1e-5,
    )
    logits4 = rng.randn(16, 4).astype(np.float32)
    y4 = rng.randint(0, 4, 16)
    np.testing.assert_allclose(
        float(cross_entropy(logits4, y4)),
        float(torch.nn.CrossEntropyLoss()(torch.tensor(logits4), torch.tensor(y4))),
        rtol=1e-5,
    )


@needs_ref
def test_optimizer_matches_torch_adam_recipe(rng):
    """One quadratic param, a few steps: optax chain == torch Adam(+wd) with
    grad clipping and per-epoch cosine annealing."""
    import torch

    from eeg_gnn_tpu.train.optim import make_optimizer

    import jax
    import jax.numpy as jnp

    lr, wd, clip, epochs, spe = 1e-2, 5e-4, 0.5, 5, 2
    w0 = rng.randn(7).astype(np.float32)
    target = rng.randn(7).astype(np.float32)

    # torch side
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    for epoch in range(epochs):
        for _ in range(spe):
            opt.zero_grad()
            loss = ((tw - torch.tensor(target)) ** 2).sum()
            loss.backward()
            torch.nn.utils.clip_grad_norm_([tw], clip)
            opt.step()
        sched.step()

    # ours
    optimizer = make_optimizer(lr, wd, clip, epochs, spe)
    params = jnp.asarray(w0)
    state = optimizer.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda w: jnp.sum((w - target) ** 2))(p)
        u, s = optimizer.update(g, s, p)
        return p + u, s

    for _ in range(epochs * spe):
        params, state = step(params, state)

    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip_and_transplant(tmp_path):
    import jax

    from eeg_gnn_tpu.models.dcrnn import (
        DCRNNConfig,
        init_classification_model,
        init_next_time_pred_model,
    )
    from eeg_gnn_tpu.train.checkpoint import (
        CheckpointSaver,
        build_finetune_params,
        load_params_like,
        save_params,
    )

    cfg = DCRNNConfig(num_rnn_layers=2, rnn_units=8, input_dim=10,
                      output_dim=10, max_diffusion_step=1)
    params = init_classification_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_params(path, params, metadata={"epoch": 3})
    loaded = load_params_like(path + ".npz", params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # transplant: 3-layer SSL encoder -> 2-layer classifier encoder
    pre_cfg = DCRNNConfig(num_rnn_layers=3, rnn_units=8, input_dim=10,
                          output_dim=10, max_diffusion_step=1)
    pre = init_next_time_pred_model(jax.random.PRNGKey(1), pre_cfg)
    merged = build_finetune_params(params, pre, 2)
    for layer in range(2):
        np.testing.assert_array_equal(
            np.asarray(merged["encoder"][layer]["gate_w"]),
            np.asarray(pre["encoder"][layer]["gate_w"]))
    # head untouched
    np.testing.assert_array_equal(np.asarray(merged["fc_w"]),
                                  np.asarray(params["fc_w"]))

    # best/last semantics (maximize)
    saver = CheckpointSaver(str(tmp_path / "run"), "auroc", maximize_metric=True)
    opt_state = {"m": np.zeros(3)}
    saver.save(1, params, opt_state, 0.5)
    assert saver.best_val == 0.5
    saver.save(2, params, opt_state, 0.4)
    assert saver.best_val == 0.5
    saver.save(3, params, opt_state, 0.6)
    assert saver.best_val == 0.6


@needs_ref
def test_thresh_max_f1_matches_reference(rng):
    ref = import_reference_module("utils")
    from eeg_gnn_tpu.train.metrics import thresh_max_f1

    y_true = (rng.rand(200) > 0.6).astype(int)
    y_prob = np.clip(y_true * 0.4 + rng.rand(200) * 0.6, 0, 1)
    assert thresh_max_f1(y_true, y_prob) == pytest.approx(
        ref.thresh_max_f1(y_true, y_prob))


@needs_ref
def test_eval_dict_matches_reference(rng):
    ref = import_reference_module("utils")
    from eeg_gnn_tpu.train.metrics import eval_dict

    y_true = rng.randint(0, 2, 100)
    y_prob = rng.rand(100)
    y_pred = (y_prob > 0.5).astype(int)
    ours, _, _ = eval_dict(y_pred, y_true, y_prob, average="binary")
    theirs, _, _ = ref.eval_dict(y_pred, y_true, y_prob, average="binary")
    for k in theirs:
        assert ours[k] == pytest.approx(theirs[k]), k


def test_fused_multi_step_matches_sequential():
    """make_multi_train_step(K) must be numerically identical to K
    sequential make_train_step calls (same rng keys, same batches)."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.graphs import compute_supports_jnp
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import (
        make_multi_train_step,
        make_train_step,
        supervised_loss_fn,
    )

    K, B, T = 3, 4, 5
    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=1, rnn_units=16, input_dim=8,
                           max_diffusion_step=1).finalize()
    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3, 5e-4, 5.0, 10, 10)

    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(K, B, T, 19, 8), jnp.float32)
    ys = jnp.asarray(rs.randint(0, 2, size=(K, B)), jnp.float32)
    lens = jnp.full((K, B), T, jnp.int32)
    adj = jnp.asarray(np.abs(rs.randn(K, B, 19, 19)), jnp.float32)
    sups = jax.vmap(lambda a: compute_supports_jnp(a, "laplacian"))(adj)
    rngs = jax.random.split(jax.random.PRNGKey(7), K)

    loss_fn = supervised_loss_fn(bundle, "detection")

    # sequential
    p_seq, ms_seq = params, model_state
    opt_seq = optimizer.init(p_seq)
    step1 = make_train_step(loss_fn, optimizer, donate=False)
    seq_losses = []
    for i in range(K):
        batch = {"x": xs[i], "y": ys[i], "seq_lengths": lens[i],
                 "supports": sups[i]}
        p_seq, ms_seq, opt_seq, loss = step1(p_seq, ms_seq, opt_seq, batch,
                                             rngs[i])
        seq_losses.append(float(loss))

    # fused
    opt_f = optimizer.init(params)
    stepK = make_multi_train_step(loss_fn, optimizer, donate=False)
    batches = {"x": xs, "y": ys, "seq_lengths": lens, "supports": sups}
    p_f, ms_f, opt_f, losses = stepK(params, model_state, opt_f, batches, rngs)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_trainer_fused_steps_e2e(tmp_path):
    """Trainer with --fused_steps drives the fused program end-to-end
    (including the epoch-remainder single-step fallback)."""
    import os

    from eeg_gnn_tpu.cli.train import main
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path)
    p = make_synthetic_corpus(root, num_files=4, file_seconds=60, clip_len=12)
    res = main([
        "--task", "detection", "--do_train", "--graph_type", "combined",
        "--max_seq_len", "12", "--use_fft", "--num_rnn_layers", "1",
        "--rnn_units", "16", "--max_diffusion_step", "1",
        "--train_batch_size", "4", "--test_batch_size", "8",
        "--num_epochs", "1", "--num_workers", "0", "--fused_steps", "2",
        "--input_dir", p["input_dir"], "--raw_data_dir", p["raw_data_dir"],
        "--marker_dir", p["marker_dir"], "--adj_mat_dir", p["adj_mat_dir"],
        "--save_dir", os.path.join(root, "save"),
    ])
    assert np.isfinite(res["loss"])


def test_padded_batch_loss_and_grads_match_unpadded(rng):
    """A partial batch padded to the fixed step shape must give the same loss
    and gradients as the natural unpadded computation (VERDICT r1 #3; the
    reference trains on natural partial batches, train.py:236-275)."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.train.losses import (
        bce_with_logits,
        compute_regression_loss,
        cross_entropy,
    )

    valid, padded = 5, 8

    # detection: BCE over logits produced by a toy linear model
    w = jnp.asarray(rng.randn(7).astype(np.float32))
    x = jnp.asarray(rng.randn(valid, 7).astype(np.float32))
    y = jnp.asarray((rng.rand(valid) > 0.5).astype(np.float32))
    x_pad = jnp.concatenate([x, jnp.repeat(x[:1], padded - valid, 0)])
    y_pad = jnp.concatenate([y, jnp.repeat(y[:1], padded - valid, 0)])

    def loss_unpadded(w):
        return bce_with_logits(x @ w, y)

    def loss_padded(w):
        return bce_with_logits(x_pad @ w, y_pad, valid=jnp.int32(valid))

    l0, g0 = jax.value_and_grad(loss_unpadded)(w)
    l1, g1 = jax.value_and_grad(loss_padded)(w)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5,
                               atol=1e-7)

    # classification: CE
    wc = jnp.asarray(rng.randn(7, 4).astype(np.float32))
    yc = jnp.asarray(rng.randint(0, 4, size=(valid,)))
    yc_pad = jnp.concatenate([yc, jnp.repeat(yc[:1], padded - valid, 0)])

    def ce_unpadded(wc):
        return cross_entropy(x @ wc, yc)

    def ce_padded(wc):
        return cross_entropy(x_pad @ wc, yc_pad, valid=jnp.int32(valid))

    l0, g0 = jax.value_and_grad(ce_unpadded)(wc)
    l1, g1 = jax.value_and_grad(ce_padded)(wc)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5,
                               atol=1e-7)

    # SSL: masked regression (both MAE and the RMSE branch)
    yt = rng.randn(valid, 6, 3).astype(np.float32)
    yt[0, :2] = 0.0  # value-masked region
    yp = rng.randn(valid, 6, 3).astype(np.float32)
    yt_pad = np.concatenate([yt, np.repeat(yt[:1], padded - valid, 0)])
    yp_pad = np.concatenate([yp, np.repeat(yp[:1], padded - valid, 0)])
    for name in ("mae", "MAE"):
        ref = float(compute_regression_loss(yt, yp, mean=1.5, std=2.5,
                                            loss_fn=name))
        got = float(compute_regression_loss(yt_pad, yp_pad, mean=1.5,
                                            std=2.5, loss_fn=name,
                                            valid=jnp.int32(valid)))
        np.testing.assert_allclose(got, ref, rtol=1e-6)
