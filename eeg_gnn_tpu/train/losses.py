"""Loss functions (jit-friendly).

Parity: detection uses BCE-with-logits, classification uses softmax cross
entropy (reference train.py:203-206); SSL uses masked MAE on
inverse-standardized signals (reference utils.py:431-495, train_ssl.py:165-170).

Padded batches: the trainer pads partial batches to a fixed shape (one XLA
program). The reference trains on natural partial batches
(train.py:236-275), so every loss takes an optional ``valid`` row count and
computes the mean over only the first ``valid`` rows — numerically the
unpadded computation (padded rows contribute exact zeros to the loss and,
because the backward is linear in the per-row cotangents, exact zeros to
every gradient). ``valid=None`` keeps the full-batch fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_mask(n_rows: int, valid, dtype):
    """(n_rows,) mask: 1.0 for valid rows.

    ``valid`` is either a scalar count (trainer-padded batches: the pad is
    a contiguous tail, rows < valid are real) or a (n_rows,) boolean mask
    (mesh-sharded cache plans, where each device pads its own shard so
    real rows are not contiguous in the global batch)."""
    valid = jnp.asarray(valid)
    if valid.ndim == 1:
        return valid.astype(dtype)
    return (jnp.arange(n_rows) < valid).astype(dtype)


def bce_with_logits(logits, targets, valid=None):
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss semantics).

    With ``valid``, the mean runs over only the first ``valid`` rows
    (reference semantics for natural partial batches, train.py:236-275).
    """
    logits = logits.reshape(-1)
    targets = targets.reshape(-1).astype(logits.dtype)
    # log(1+exp(-|x|)) + max(x,0) - x*y, numerically stable
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if valid is None:
        return jnp.mean(loss)
    mask = _row_mask(loss.shape[0], valid, loss.dtype)
    return jnp.sum(loss * mask) / jnp.sum(mask)


def cross_entropy(logits, targets, valid=None):
    """Mean softmax cross-entropy with integer targets (torch CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets.astype(jnp.int32)[:, None], axis=-1)
    if valid is None:
        return -jnp.mean(picked)
    picked = picked.reshape(-1)
    mask = _row_mask(picked.shape[0], valid, picked.dtype)
    return -jnp.sum(picked * mask) / jnp.sum(mask)


def masked_mae_loss(y_pred, y_true, mask_val: float = 0.0, valid=None):
    """MAE over entries where y_true != mask_val, normalized by mask mean.

    Parity: reference ``utils.masked_mae_loss`` (utils.py:431-442), including
    the mask-mean renormalization and nan-to-zero guard. Since
    ``mean(|d| * m / mean(m)) == sum(|d| * m) / sum(m)``, restricting the
    element mask to the first ``valid`` batch rows reproduces the reference's
    unpadded value exactly.
    """
    masks = (y_true != mask_val).astype(y_pred.dtype)
    if valid is not None:
        rm = _row_mask(y_true.shape[0], valid, y_pred.dtype)
        masks = masks * rm.reshape((-1,) + (1,) * (y_true.ndim - 1))
        loss = jnp.abs(y_pred - y_true) * masks
        loss = jnp.where(jnp.isnan(loss), 0.0, loss)
        return jnp.sum(loss) / jnp.sum(masks)
    masks = masks / jnp.mean(masks)
    loss = jnp.abs(y_pred - y_true) * masks
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return jnp.mean(loss)


def masked_mse_loss(y_pred, y_true, mask_val: float = 0.0, valid=None):
    """Parity: reference ``utils.masked_mse_loss`` (utils.py:445-457) — note
    the reference returns sqrt(mean(...)), i.e. an RMSE."""
    masks = (y_true != mask_val).astype(y_pred.dtype)
    if valid is not None:
        rm = _row_mask(y_true.shape[0], valid, y_pred.dtype)
        masks = masks * rm.reshape((-1,) + (1,) * (y_true.ndim - 1))
        loss = (y_pred - y_true) ** 2 * masks
        loss = jnp.where(jnp.isnan(loss), 0.0, loss)
        return jnp.sqrt(jnp.sum(loss) / jnp.sum(masks))
    masks = masks / jnp.mean(masks)
    loss = (y_pred - y_true) ** 2 * masks
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return jnp.sqrt(jnp.mean(loss))


def compute_regression_loss(y_true, y_predicted, mean=None, std=None,
                            loss_fn: str = "mae", mask_val: float = 0.0,
                            valid=None):
    """Masked regression loss on inverse-standardized signals.

    Parity: reference ``utils.compute_regression_loss`` (utils.py:460-495):
    both tensors are inverse-transformed (x*std + mean) before the masked
    loss; any loss_fn other than (case-insensitive) 'mae' selects MSE — the
    reference compares lowercase 'mae' but train_ssl passes 'MAE', matching
    its observable behavior requires treating the comparison case-sensitively.
    The reference's train loop passes loss_fn='MAE' (train_ssl.py:167) which
    therefore hits the *MSE* branch in training but 'mae' (MAE) in eval
    (train_ssl.py:255). QUIRK reproduced: we keep case-sensitive dispatch.
    """
    if mean is not None:
        y_true = y_true * std + mean
        y_predicted = y_predicted * std + mean
    if loss_fn == "mae":
        return masked_mae_loss(y_predicted, y_true, mask_val, valid=valid)
    return masked_mse_loss(y_predicted, y_true, mask_val, valid=valid)
