"""Jittable train/eval step factories for all tasks.

One compiled XLA program per (task, shapes): forward, loss, backward,
gradient clip, Adam+wd update, all fused on device. With a mesh, batch
dims ride the ``data`` axis (gradients all-reduce over ICI via psum
inserted by the partitioner); params/opt state are replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from eeg_gnn_tpu.models.dcrnn import (
    DCRNNConfig,
    classification_apply,
    next_time_pred_apply,
)
from eeg_gnn_tpu.train.losses import (
    bce_with_logits,
    compute_regression_loss,
    cross_entropy,
)


def supervised_loss_fn(cfg: DCRNNConfig, task: str):
    """Loss for detection (BCE) / classification (CE) on DCRNN logits
    (reference train.py:203-206, 257-268)."""

    def loss_fn(params, batch, rng, training):
        logits = classification_apply(
            cfg, params, batch["x"], batch["seq_lengths"], batch["supports"],
            training=training, rng=rng,
        )
        if task == "detection":
            return bce_with_logits(logits, batch["y"]), logits
        return cross_entropy(logits, batch["y"].astype(jnp.int32)), logits

    return loss_fn


def ssl_loss_fn(cfg: DCRNNConfig, mean, std, loss_name_train: str = "MAE"):
    """Masked regression loss on inverse-standardized next-window preds
    (reference train_ssl.py:163-170). ``loss_name_train`` defaults to the
    reference's literal 'MAE' string (which dispatches to the MSE branch —
    documented quirk in train/losses.py)."""

    def loss_fn(params, batch, rng, training, batches_seen=None):
        preds = next_time_pred_apply(
            cfg, params, batch["x"], batch["y"], batch["supports"],
            batches_seen=batches_seen, training=training, rng=rng,
        )
        loss = compute_regression_loss(
            batch["y"], preds, mean=mean, std=std,
            loss_fn=loss_name_train if training else "mae",
        )
        return loss, preds

    return loss_fn


def make_train_step(loss_fn, optimizer, *, has_batches_seen: bool = False,
                    donate: bool = True):
    """Build a jitted train step: (params, opt_state, batch, rng[, step])
    -> (params, opt_state, loss)."""

    if has_batches_seen:
        def step(params, opt_state, batch, rng, batches_seen):
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng, True, batches_seen),
                has_aux=True,
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        def step(params, opt_state, batch, rng):
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng, True), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(loss_fn):
    """Jitted eval step: (params, batch) -> (loss, outputs)."""

    def step(params, batch):
        return loss_fn(params, batch, jax.random.PRNGKey(0), False)

    return jax.jit(step)


def shard_batch(batch: Dict[str, Any], mesh, batch_axes: Optional[Dict[str, int]] = None):
    """Place a host batch onto the mesh, sharding batch dims on 'data'.

    ``supports`` are stacked (S, B, N, N) -> batch axis 1; everything else
    axis 0 by default.
    """
    from eeg_gnn_tpu.parallel.mesh import batch_sharding

    batch_axes = batch_axes or {}
    out = {}
    for k, v in batch.items():
        axis = batch_axes.get(k, 1 if k == "supports" else 0)
        out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim, axis))
    return out
