"""Training equivalence vs the executing reference (VERDICT r1 #2).

Forward parity was proven in round 1 (activation allclose against shipped
checkpoints); this proves the *training loop* reproduces reference learning
dynamics: both frameworks train on the identical synthetic corpus, from
identical initial weights (ours exported into the reference model), with
identical batch order and no augmentation. The reference side executes the
actual upstream code — ``DCRNNModel_classification`` forward/backward with
the recipe of ``train.py:197-329`` (BCEWithLogits, Adam + L2 weight decay,
grad-clip 5.0, CosineAnnealingLR stepped per epoch).

Compared: the per-step loss trajectory, the final parameters, and the final
dev-split probabilities/AUROC.
"""

import argparse

import numpy as np
import pytest

from conftest import reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="no reference mount")

LR, WD, CLIP, EPOCHS = 1e-4, 5e-4, 5.0, 3


def _torch_reference_trainer(params, num_rnn_layers, rnn_units, k,
                             steps_per_epoch, filter_type="laplacian",
                             epochs=EPOCHS, num_classes=1):
    import sys
    import types

    import torch

    sys.modules.setdefault("pyedflib", types.ModuleType("pyedflib"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.model import DCRNNModel_classification  # executing reference

    from eeg_gnn_tpu.io.torch_export import export_classification_state

    args = argparse.Namespace(
        num_nodes=19, num_rnn_layers=num_rnn_layers, rnn_units=rnn_units,
        input_dim=100, max_diffusion_step=k, dcgru_activation="tanh",
        filter_type=filter_type, dropout=0.0,
    )
    model = DCRNNModel_classification(args=args, num_classes=num_classes,
                                      device="cpu")
    state = {kk: torch.from_numpy(np.asarray(v))
             for kk, v in export_classification_state(params).items()}
    missing = model.load_state_dict(state, strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    # reference train.py:202-206: BCE for detection, CE for classification
    if num_classes == 1:
        loss_fn = torch.nn.BCEWithLogitsLoss()
    else:
        loss_fn = torch.nn.CrossEntropyLoss()

    def _sups(supports):
        return [torch.from_numpy(s) for s in supports]  # list of (B, N, N)

    def train_step(x, y, lengths, supports):
        model.train()
        opt.zero_grad()
        logits = model(torch.from_numpy(x), torch.from_numpy(lengths),
                       _sups(supports))
        if num_classes == 1:
            loss = loss_fn(logits.view(-1), torch.from_numpy(y).view(-1))
        else:
            loss = loss_fn(logits, torch.from_numpy(y).view(-1).long())
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        return float(loss)

    def predict(x, lengths, supports):
        model.eval()
        with torch.no_grad():
            logits = model(torch.from_numpy(x), torch.from_numpy(lengths),
                           _sups(supports))
        if num_classes == 1:
            return torch.sigmoid(logits.view(-1)).numpy()
        return torch.softmax(logits, dim=1).numpy()

    return model, train_step, predict, sched


def _run_detection_equivalence(tmp_path, *, units=16, layers=1, k=1, t=12,
                               graph_type="combined",
                               filter_type="laplacian", epochs=EPOCHS,
                               batch=8, num_files=4, file_seconds=60,
                               top_k=None, loss_rtol=0.02, loss_atol=5e-3,
                               check_dev=True):
    """Train both frameworks step-for-step from identical weights and batch
    order on the synthetic corpus; compare loss trajectory + dev metrics."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_detection
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.metrics import eval_dict
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

    p = make_synthetic_corpus(str(tmp_path), num_files=num_files,
                              file_seconds=file_seconds, clip_len=t)
    loaders, _, _ = load_dataset_detection(
        input_dir=p["input_dir"], raw_data_dir=p["raw_data_dir"],
        train_batch_size=batch, test_batch_size=batch, max_seq_len=t,
        standardize=True, num_workers=0, augmentation=False,
        adj_mat_dir=p["adj_mat_dir"], graph_type=graph_type, top_k=top_k,
        filter_type=filter_type, use_fft=True, marker_dir=p["marker_dir"],
        seed=123)

    cfg = ExperimentConfig(
        do_train=True, task="detection", graph_type=graph_type,
        max_seq_len=t, num_rnn_layers=layers, rnn_units=units,
        max_diffusion_step=k, num_epochs=epochs, lr_init=LR, l2_wd=WD,
        max_grad_norm=CLIP, dropout=0.0).finalize()
    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))

    # identical batch order on both sides: materialize each epoch's batches
    # once (full batches only — both sides see the same natural sizes)
    epoch_batches = [[(np.asarray(b.x, np.float32),
                       np.asarray(b.y, np.float32),
                       np.asarray(b.seq_lengths, np.int64),
                       np.asarray(b.supports, np.float32))
                      for b in loaders["train"]] for _ in range(epochs)]
    steps_per_epoch = len(epoch_batches[0])

    _, t_step, t_predict, t_sched = _torch_reference_trainer(
        params, layers, units, k, steps_per_epoch,
        filter_type=filter_type, epochs=epochs)

    optimizer = make_optimizer(LR, WD, CLIP, epochs, steps_per_epoch)
    opt_state = optimizer.init(params)
    loss_fn = supervised_loss_fn(bundle, "detection")
    step = make_train_step(loss_fn, optimizer, donate=False)
    rng = jax.random.PRNGKey(0)

    ours_losses, theirs_losses = [], []
    for epoch in epoch_batches:
        for x, y, lengths, supports in epoch:
            batch_dict = {"x": jnp.asarray(x), "y": jnp.asarray(y),
                          "seq_lengths": jnp.asarray(lengths),
                          "supports": jnp.asarray(supports)}
            params, model_state, opt_state, loss = step(
                params, model_state, opt_state, batch_dict, rng)
            ours_losses.append(float(loss))
            theirs_losses.append(t_step(x, y, lengths, supports))
        t_sched.step()  # reference steps the cosine LR per epoch

    ours_losses = np.asarray(ours_losses)
    theirs_losses = np.asarray(theirs_losses)
    assert len(ours_losses) == epochs * steps_per_epoch
    # step-1 losses come from identical weights -> near bit-equality
    np.testing.assert_allclose(ours_losses[0], theirs_losses[0], rtol=1e-5)
    # trajectories track each other (f32 drift compounds over steps)
    np.testing.assert_allclose(ours_losses, theirs_losses, rtol=loss_rtol,
                               atol=loss_atol)
    per_epoch_ours = ours_losses.reshape(epochs, -1).mean(1)
    per_epoch_theirs = theirs_losses.reshape(epochs, -1).mean(1)
    np.testing.assert_allclose(per_epoch_ours, per_epoch_theirs,
                               rtol=max(5e-3, loss_rtol / 4))

    if not check_dev:
        return len(ours_losses)

    # final dev metrics from the two trained models
    probs_o, probs_t, ys = [], [], []
    for b in loaders["dev"]:
        x = np.asarray(b.x, np.float32)
        lengths = np.asarray(b.seq_lengths, np.int64)
        supports = np.asarray(b.supports, np.float32)
        logits, _ = bundle.apply(
            params, model_state,
            {"x": jnp.asarray(x), "seq_lengths": jnp.asarray(lengths),
             "supports": jnp.asarray(supports)}, training=False,
            rng=jax.random.PRNGKey(0))
        probs_o.append(1.0 / (1.0 + np.exp(-np.asarray(logits).reshape(-1))))
        probs_t.append(t_predict(x, lengths, supports))
        ys.append(np.asarray(b.y).reshape(-1).astype(int))
    probs_o, probs_t = np.concatenate(probs_o), np.concatenate(probs_t)
    ys = np.concatenate(ys)
    np.testing.assert_allclose(probs_o, probs_t, rtol=0.05, atol=0.01)

    so, _, _ = eval_dict((probs_o > 0.5).astype(int), ys, probs_o,
                         average="binary")
    st, _, _ = eval_dict((probs_t > 0.5).astype(int), ys, probs_t,
                         average="binary")
    assert abs(so["auroc"] - st["auroc"]) < 0.01, (so["auroc"], st["auroc"])
    return len(ours_losses)


@needs_ref
@pytest.mark.slow
def test_training_trajectory_matches_reference(tmp_path):
    _run_detection_equivalence(tmp_path)


@needs_ref
@pytest.mark.slow
def test_training_trajectory_dual_random_walk(tmp_path):
    """Correlation graph + dual_random_walk supports IN TRAINING (VERDICT r2
    missing #2): the cross-support Chebyshev carry-over quirk
    (reference cell.py:83-93) and both random-walk directions
    (dataloader_detection.py:344-349) are live in forward AND backward."""
    _run_detection_equivalence(
        tmp_path, graph_type="individual", filter_type="dual_random_walk",
        top_k=3, k=2)


def _torch_ssl_trainer(params, layers, units, k, epochs, mean, std,
                       filter_type="laplacian"):
    """Executing-reference SSL trainer: ``DCRNNModel_nextTimePred`` forward
    /backward with the recipe of ``train_ssl.py:101-230`` — masked
    regression loss via ``utils.compute_regression_loss(loss_fn='MAE')``
    (the literal 'MAE' string dispatches to the RMSE branch,
    ``utils.py:492-495``), Adam + wd, clip 5.0, cosine LR per epoch."""
    import sys
    import types

    import torch

    sys.modules.setdefault("pyedflib", types.ModuleType("pyedflib"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import utils as ref_utils  # executing reference
    from model.model import DCRNNModel_nextTimePred

    from eeg_gnn_tpu.io.torch_export import export_next_time_pred_state

    torch.Tensor.cuda = lambda self, *a, **kk: self  # model.py:336 quirk

    args = argparse.Namespace(
        num_nodes=19, num_rnn_layers=layers, rnn_units=units, input_dim=100,
        output_dim=100, max_diffusion_step=k, dcgru_activation="tanh",
        filter_type=filter_type, dropout=0.0, cl_decay_steps=3000,
        use_curriculum_learning=False,
    )
    model = DCRNNModel_nextTimePred(args=args, device="cpu")
    state = {kk: torch.from_numpy(np.ascontiguousarray(v))
             for kk, v in export_next_time_pred_state(params, layers).items()}
    missing = model.load_state_dict(state, strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    # the shipped pickles hold numpy float64 *scalars* (shape ()), which the
    # reference's inverse_transform wraps in a list for torch.FloatTensor
    scaler = ref_utils.StandardScaler(np.float64(mean), np.float64(std))
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)

    def train_step(x, y, supports):
        model.train()
        opt.zero_grad()
        sups = [torch.from_numpy(s) for s in supports]
        preds = model(torch.from_numpy(x), torch.from_numpy(y), sups,
                      batches_seen=None)
        loss = ref_utils.compute_regression_loss(
            y_true=torch.from_numpy(y), y_predicted=preds, loss_fn="MAE",
            standard_scaler=scaler, device=None)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        return float(loss)

    return model, train_step, sched


@needs_ref
@pytest.mark.slow
def test_ssl_training_trajectory_matches_reference(tmp_path):
    """SSL seq2seq training dynamics vs the executing train_ssl.py recipe
    (VERDICT r2 missing #1): tied decoder weights accumulate gradients
    across layers >= 1 (3-layer model), the 'MAE'->RMSE dispatch quirk is
    live, teacher forcing off (deterministic on both sides)."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.data.datasets import load_dataset_ssl
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus
    from eeg_gnn_tpu.models.dcrnn import DCRNNConfig, init_next_time_pred_model
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, ssl_loss_fn

    units, layers, k, t = 16, 3, 1, 12
    epochs = 3

    p = make_synthetic_corpus(str(tmp_path), num_files=4, file_seconds=96,
                              clip_len=t)
    loaders, _, scaler = load_dataset_ssl(
        input_dir=p["input_dir"], raw_data_dir=p["raw_data_dir"],
        train_batch_size=8, test_batch_size=8, input_len=t, output_len=t,
        standardize=True, num_workers=0, augmentation=False,
        adj_mat_dir=p["adj_mat_dir"], graph_type="combined",
        filter_type="laplacian", use_fft=True, marker_dir=p["marker_dir"])

    mcfg = DCRNNConfig(
        rnn_units=units, num_rnn_layers=layers, max_diffusion_step=k,
        num_supports=1, dropout=0.0, use_curriculum_learning=False)
    params = init_next_time_pred_model(jax.random.PRNGKey(0), mcfg)

    epoch_batches = [[(np.asarray(b.x, np.float32),
                       np.asarray(b.y, np.float32),
                       np.asarray(b.supports, np.float32))
                      for b in loaders["train"]] for _ in range(epochs)]
    steps_per_epoch = len(epoch_batches[0])

    _, t_step, t_sched = _torch_ssl_trainer(
        params, layers, units, k, epochs, scaler.mean, scaler.std)

    optimizer = make_optimizer(LR, WD, CLIP, epochs, steps_per_epoch)
    opt_state = optimizer.init(params)
    loss_fn = ssl_loss_fn(mcfg, jnp.float32(scaler.mean),
                          jnp.float32(scaler.std))
    step = make_train_step(loss_fn, optimizer, donate=False,
                           has_batches_seen=True)
    rng = jax.random.PRNGKey(0)

    ours_losses, theirs_losses = [], []
    seen = 0
    for epoch in epoch_batches:
        for x, y, supports in epoch:
            batch = {"x": jnp.asarray(x), "y": jnp.asarray(y),
                     "supports": jnp.asarray(supports)}
            params, _, opt_state, loss = step(
                params, {}, opt_state, batch, rng, jnp.int32(seen))
            seen += x.shape[0]
            ours_losses.append(float(loss))
            theirs_losses.append(t_step(x, y, supports))
        t_sched.step()

    ours_losses = np.asarray(ours_losses)
    theirs_losses = np.asarray(theirs_losses)
    np.testing.assert_allclose(ours_losses[0], theirs_losses[0], rtol=1e-5)
    np.testing.assert_allclose(ours_losses, theirs_losses, rtol=0.02,
                               atol=5e-3)
    per_epoch_ours = ours_losses.reshape(epochs, -1).mean(1)
    per_epoch_theirs = theirs_losses.reshape(epochs, -1).mean(1)
    np.testing.assert_allclose(per_epoch_ours, per_epoch_theirs, rtol=5e-3)


@needs_ref
@pytest.mark.slow
def test_classification_training_trajectory(tmp_path):
    """Classification-task training dynamics vs the executing reference
    (VERDICT r3 item 6): CrossEntropy loss on 4-class logits
    (train.py:203-206), PADDED variable-length sequences with the
    ``last_relevant_pytorch`` seq_lengths gather (utils.py:346-357,
    dataloader_classification.py:334-352) live in the BACKWARD pass —
    the last corner where a gradient-masking bug could hide."""
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.config import ExperimentConfig
    from eeg_gnn_tpu.data.datasets import load_dataset_classification
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus
    from eeg_gnn_tpu.models.registry import build_model
    from eeg_gnn_tpu.train.metrics import eval_dict
    from eeg_gnn_tpu.train.optim import make_optimizer
    from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

    units, layers, k, t = 16, 1, 1, 12
    epochs, batch = 3, 4

    p = make_synthetic_corpus(str(tmp_path), num_files=8, file_seconds=120,
                              clip_len=t)
    loaders, datasets, _ = load_dataset_classification(
        input_dir=p["input_dir"], raw_data_dir=p["raw_data_dir"],
        train_batch_size=batch, test_batch_size=batch, max_seq_len=t,
        standardize=True, num_workers=0, padding_val=0.0,
        augmentation=False, adj_mat_dir=p["adj_mat_dir"],
        graph_type="combined", filter_type="laplacian", use_fft=True,
        marker_dir=p["marker_dir"])

    # the corner under test must actually be exercised: variable lengths
    lengths_seen = {int(datasets["train"][i][2])
                    for i in range(len(datasets["train"]))}
    assert len(lengths_seen) > 1, "corpus produced uniform seq_lengths"

    cfg = ExperimentConfig(
        do_train=True, task="classification", graph_type="combined",
        max_seq_len=t, num_rnn_layers=layers, rnn_units=units,
        max_diffusion_step=k, num_classes=4, num_epochs=epochs, lr_init=LR,
        l2_wd=WD, max_grad_norm=CLIP, dropout=0.0).finalize()
    bundle = build_model(cfg)
    params, model_state = bundle.init(jax.random.PRNGKey(0))

    epoch_batches = [[(np.asarray(b.x, np.float32),
                       np.asarray(b.y, np.float32),
                       np.asarray(b.seq_lengths, np.int64),
                       np.asarray(b.supports, np.float32))
                      for b in loaders["train"]] for _ in range(epochs)]
    steps_per_epoch = len(epoch_batches[0])
    assert steps_per_epoch >= 2

    _, t_step, t_predict, t_sched = _torch_reference_trainer(
        params, layers, units, k, steps_per_epoch, epochs=epochs,
        num_classes=4)

    optimizer = make_optimizer(LR, WD, CLIP, epochs, steps_per_epoch)
    opt_state = optimizer.init(params)
    loss_fn = supervised_loss_fn(bundle, "classification")
    step = make_train_step(loss_fn, optimizer, donate=False)
    rng = jax.random.PRNGKey(0)

    ours_losses, theirs_losses = [], []
    for epoch in epoch_batches:
        for x, y, lengths, supports in epoch:
            batch_dict = {"x": jnp.asarray(x), "y": jnp.asarray(y),
                          "seq_lengths": jnp.asarray(lengths),
                          "supports": jnp.asarray(supports)}
            params, model_state, opt_state, loss = step(
                params, model_state, opt_state, batch_dict, rng)
            ours_losses.append(float(loss))
            theirs_losses.append(t_step(x, y, lengths, supports))
        t_sched.step()

    ours_losses = np.asarray(ours_losses)
    theirs_losses = np.asarray(theirs_losses)
    np.testing.assert_allclose(ours_losses[0], theirs_losses[0], rtol=1e-5)
    np.testing.assert_allclose(ours_losses, theirs_losses, rtol=0.02,
                               atol=5e-3)
    per_epoch_ours = ours_losses.reshape(epochs, -1).mean(1)
    per_epoch_theirs = theirs_losses.reshape(epochs, -1).mean(1)
    np.testing.assert_allclose(per_epoch_ours, per_epoch_theirs, rtol=5e-3)

    # final dev probabilities + weighted-F1 from the two trained models
    probs_o, probs_t, ys = [], [], []
    for b in loaders["dev"]:
        x = np.asarray(b.x, np.float32)
        lengths = np.asarray(b.seq_lengths, np.int64)
        supports = np.asarray(b.supports, np.float32)
        logits, _ = bundle.apply(
            params, model_state,
            {"x": jnp.asarray(x), "seq_lengths": jnp.asarray(lengths),
             "supports": jnp.asarray(supports)}, training=False,
            rng=jax.random.PRNGKey(0))
        logits = np.asarray(logits)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs_o.append(e / e.sum(axis=1, keepdims=True))
        probs_t.append(t_predict(x, lengths, supports))
        ys.append(np.asarray(b.y).reshape(-1).astype(int))
    probs_o = np.concatenate(probs_o)
    probs_t = np.concatenate(probs_t)
    ys = np.concatenate(ys)
    np.testing.assert_allclose(probs_o, probs_t, rtol=0.05, atol=0.01)
    so, _, _ = eval_dict(probs_o.argmax(1), ys, None, average="weighted")
    st, _, _ = eval_dict(probs_t.argmax(1), ys, None, average="weighted")
    assert abs(so["F1"] - st["F1"]) < 1e-6, (so["F1"], st["F1"])


@needs_ref
@pytest.mark.slow
def test_training_trajectory_flagship_config(tmp_path):
    """Flagship-size detection (2 layers, 64 units, K=2, T=60 — reference
    README.md:71) for >= 20 steps: float-associativity differences compound
    hardest at this scale (VERDICT r2 missing/weak #2)."""
    steps = _run_detection_equivalence(
        tmp_path, units=64, layers=2, k=2, t=60, batch=4, num_files=4,
        file_seconds=480, epochs=10, check_dev=False)
    assert steps >= 20, f"only {steps} steps — corpus too small"
