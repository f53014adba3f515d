"""Jittable train/eval step factories for all tasks and model families.

One compiled XLA program per (task, shapes): forward, loss, backward,
gradient clip, Adam+wd update, all fused on device. With a mesh, batch
dims ride the ``data`` axis (gradients all-reduce over ICI via psum
inserted by the partitioner); params/opt state are replicated.

Loss-fn contract: ``loss_fn(params, model_state, batch, rng, training[,
batches_seen]) -> (loss, (outputs, new_model_state))``. Model state covers
e.g. DenseCNN's BatchNorm running statistics; stateless models pass {}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from eeg_gnn_tpu.models.dcrnn import next_time_pred_apply
from eeg_gnn_tpu.train.losses import (
    bce_with_logits,
    compute_regression_loss,
    cross_entropy,
)


def _default_gather(cache_arr, idx):
    return jnp.take(cache_arr, idx, axis=0)


def supervised_loss_fn(bundle, task: str, input_pipeline=None,
                       cache_gather=None):
    """Loss for detection (BCE) / classification (CE) on model logits
    (reference train.py:203-206, 257-268). ``bundle`` is a
    ``models.registry.ModelBundle``.

    With ``input_pipeline`` (data/device_pipeline.py), the batch carries raw
    clips under 'raw' and featurization + graph construction fuse into the
    same XLA program as the model step.

    ``cache_gather`` overrides how cached splits are indexed (default: a
    plain axis-0 take). The mesh-sharded cached step passes a shard_map'd
    LOCAL gather so each device reads only its own cache shard
    (make_mesh_cached_train_step).
    """
    gather = cache_gather or _default_gather

    def loss_fn(params, model_state, batch, rng, training):
        if input_pipeline is not None and batch.get("raw") is not None:
            rng, k_pipe = jax.random.split(rng)
            x, supports = input_pipeline(batch["raw"], k_pipe, training)
            batch = {**batch, "x": x, "supports": supports}
        elif input_pipeline is not None and batch.get("cache_x") is not None:
            # HBM-resident dataset (data/device_cache.py): gather the batch
            # from the cached split INSIDE the program — the only per-step
            # H2D is the (B,) index vector — then run the device tail
            # (augment -> standardize -> supports) exactly like the host
            # loader would
            rng, k_pipe = jax.random.split(rng)
            feats = gather(batch["cache_x"], batch["idx"])
            y = gather(batch["cache_y"], batch["idx"])
            if task == "classification" and batch.get("cache_seq") is not None:
                # padded variable-length clips: gather the true lengths and
                # re-pin the padding after the device augment tail
                seq = gather(batch["cache_seq"], batch["idx"])
                x, supports = input_pipeline.classification_features(
                    feats, seq, k_pipe, training)
                batch = {**batch, "x": x, "supports": supports, "y": y,
                         "seq_lengths": seq}
            else:
                x, supports = input_pipeline.features(feats, k_pipe,
                                                      training)
                batch = {**batch, "x": x, "supports": supports, "y": y}
        logits, new_state = bundle.apply(params, model_state, batch,
                                         training=training, rng=rng)
        valid = batch.get("valid")  # padded rows masked out of the loss
        if task == "detection":
            return (bce_with_logits(logits, batch["y"], valid=valid),
                    (logits, new_state))
        return (
            cross_entropy(logits, batch["y"].astype(jnp.int32), valid=valid),
            (logits, new_state),
        )

    return loss_fn


def ssl_loss_fn(model_cfg, mean, std, loss_name_train: str = "MAE",
                input_pipeline=None, cache_gather=None):
    """Masked regression loss on inverse-standardized next-window preds
    (reference train_ssl.py:163-170). ``loss_name_train`` defaults to the
    reference's literal 'MAE' string (which dispatches to the MSE branch —
    documented quirk in train/losses.py)."""
    gather = cache_gather or _default_gather

    def loss_fn(params, model_state, batch, rng, training, batches_seen=None):
        if input_pipeline is not None and batch.get("raw") is not None:
            rng, k_pipe = jax.random.split(rng)
            x, y, supports = input_pipeline.ssl(
                batch["raw"], batch["raw_y"], k_pipe, training)
            batch = {**batch, "x": x, "y": y, "supports": supports}
        elif input_pipeline is not None and batch.get("cache_x") is not None:
            # HBM-resident SSL pairs: target features ride the cache's y
            # slot; one reflect decision + scale applies to both clips
            # (DevicePipeline.ssl_features; ref dataloader_ssl.py:282-361)
            rng, k_pipe = jax.random.split(rng)
            fx = gather(batch["cache_x"], batch["idx"])
            fy = gather(batch["cache_y"], batch["idx"])
            x, y, supports = input_pipeline.ssl_features(fx, fy, k_pipe,
                                                         training)
            batch = {**batch, "x": x, "y": y, "supports": supports}
        preds = next_time_pred_apply(
            model_cfg, params, batch["x"], batch["y"], batch["supports"],
            batches_seen=batches_seen, training=training, rng=rng,
        )
        loss = compute_regression_loss(
            batch["y"], preds, mean=mean, std=std,
            loss_fn=loss_name_train if training else "mae",
            valid=batch.get("valid"),
        )
        return loss, (preds, model_state)

    return loss_fn


def make_train_step(loss_fn, optimizer, *, has_batches_seen: bool = False,
                    donate: bool = True):
    """Build a jitted train step:
    (params, model_state, opt_state, batch, rng[, batches_seen])
    -> (params, model_state, opt_state, loss)."""

    def _update(params, model_state, opt_state, batch, rng, extra):
        def wrapped(p):
            if has_batches_seen:
                return loss_fn(p, model_state, batch, rng, True, extra)
            return loss_fn(p, model_state, batch, rng, True)

        (loss, (_, new_state)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    if has_batches_seen:
        def step(params, model_state, opt_state, batch, rng, batches_seen):
            return _update(params, model_state, opt_state, batch, rng,
                           batches_seen)
    else:
        def step(params, model_state, opt_state, batch, rng):
            return _update(params, model_state, opt_state, batch, rng, None)

    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


def make_multi_train_step(loss_fn, optimizer, *, has_batches_seen: bool = False,
                          donate: bool = True):
    """Fused K-step trainer: ``lax.scan`` over K minibatches inside ONE
    compiled program.

    Dispatch latency (host->device program launch, ~6 ms/step under a remote
    TPU runtime) dominates small-batch step time for this model family
    (~0.4 M params); scanning K steps amortizes it K-fold. No reference
    counterpart (the reference dispatches per batch); numerics are identical
    to K sequential ``make_train_step`` calls.

    Batches must be stacked with a leading K axis on every leaf; ``rngs`` is
    a (K, 2) key array; with ``has_batches_seen``, pass a (K,) int32 vector
    of per-step sample counters.

    Returns (params, model_state, opt_state, losses[K]).
    """

    def _one(params, model_state, opt_state, batch, rng, extra):
        def wrapped(p):
            if has_batches_seen:
                return loss_fn(p, model_state, batch, rng, True, extra)
            return loss_fn(p, model_state, batch, rng, True)

        (loss, (_, new_state)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    if has_batches_seen:
        def step(params, model_state, opt_state, batches, rngs, batches_seen):
            def body(carry, inp):
                p, ms, os_ = carry
                batch, rng, bs = inp
                p, ms, os_, loss = _one(p, ms, os_, batch, rng, bs)
                return (p, ms, os_), loss

            (params, model_state, opt_state), losses = jax.lax.scan(
                body, (params, model_state, opt_state),
                (batches, rngs, batches_seen))
            return params, model_state, opt_state, losses
    else:
        def step(params, model_state, opt_state, batches, rngs):
            def body(carry, inp):
                p, ms, os_ = carry
                batch, rng = inp
                p, ms, os_, loss = _one(p, ms, os_, batch, rng, None)
                return (p, ms, os_), loss

            (params, model_state, opt_state), losses = jax.lax.scan(
                body, (params, model_state, opt_state), (batches, rngs))
            return params, model_state, opt_state, losses

    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


def make_cached_train_step(loss_fn, optimizer, seq_len: int,
                           batch_size: int, *,
                           has_batches_seen: bool = False,
                           donate: bool = True):
    """Device-resident training step for HBM-cached splits: steady-state
    dispatches carry ZERO host data.

    Per-call host->device transfers (even a (B,) index vector or a fresh
    rng key) cost a blocking round-trip on high-latency runtimes —
    measured ~2 ms of an 11 ms step on the axon tunnel. Here everything
    the step consumes already lives on device: the epoch's shuffled
    permutation + per-batch valid counts (ONE upload per epoch), and a
    carried (key, counter, seen, loss-buffer) state — the key splits
    in-program, the counter picks the batch via ``dynamic_slice``, the
    sample counter (curriculum-learning ``batches_seen``) accumulates the
    valid counts, losses scatter into the buffer for a single epoch-end
    D2H.

    Call: (params, model_state, opt_state, key, counter, seen, loss_buf,
    cache (dict with x/y/seq), perm (K*B,) int32, valid_vec (K,) int32)
    -> (params, model_state, opt_state, key, counter+1, seen+valid,
    loss_buf).
    """

    def step(params, model_state, opt_state, key, counter, seen, loss_buf,
             cache, perm, valid_vec):
        idx = jax.lax.dynamic_slice(perm, (counter * batch_size,),
                                    (batch_size,))
        batch = {
            "cache_x": cache["x"], "cache_y": cache["y"],
            "cache_seq": cache.get("seq"), "idx": idx,
            "x": None, "y": None,
            "seq_lengths": jnp.full((batch_size,), seq_len, jnp.int32),
            "supports": None, "valid": valid_vec[counter],
        }
        key, sub = jax.random.split(key)

        def wrapped(p):
            if has_batches_seen:
                return loss_fn(p, model_state, batch, sub, True, seen)
            return loss_fn(p, model_state, batch, sub, True)

        (loss, (_, new_state)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss_buf = loss_buf.at[counter].set(loss)
        return (params, new_state, opt_state, key, counter + 1,
                seen + valid_vec[counter], loss_buf)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5, 6) if donate
                   else ())


def make_cached_epoch_step(loss_fn, optimizer, seq_len: int, *,
                           has_batches_seen: bool = False,
                           donate: bool = True):
    """K-step trainer for HBM-resident datasets: ONE compiled program
    scans K optimizer steps over a (K, B) index matrix. The trainer calls
    it in chunks of ``--fused_steps`` batches (same N-step granularity as
    the streaming ``make_multi_train_step`` path; at most two distinct K
    values compile per run — the chunk size and the epoch remainder).

    With the split cached on device (data/device_cache.py), per-step host
    involvement is what kills throughput on high-latency links (measured:
    per-step dispatch + a (B,) index H2D cost ~10 ms on the axon tunnel vs
    a 9 ms step). Scanning K steps in-program drops host traffic to ONE
    dispatch + one small index upload per chunk. Numerics are identical
    to K sequential ``make_train_step`` calls (same argument as
    ``make_multi_train_step``).

    Args at call time: (params, model_state, opt_state, seen (int32),
    cache (dict with x/y/seq), idx_mat (K, B) int32, valid_vec (K,) int32,
    rngs (K, 2) keys) -> (params, model_state, opt_state, losses (K,)).
    """

    def step(params, model_state, opt_state, seen, cache, idx_mat,
             valid_vec, rngs):
        b = idx_mat.shape[1]
        seq_lengths = jnp.full((b,), seq_len, jnp.int32)
        seen_vec = seen + jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(valid_vec)[:-1]])

        def body(carry, inp):
            p, ms, os_ = carry
            idx, valid, rng, seen_k = inp
            batch = {
                "cache_x": cache["x"], "cache_y": cache["y"],
                "cache_seq": cache.get("seq"), "idx": idx,
                "x": None, "y": None, "seq_lengths": seq_lengths,
                "supports": None, "valid": valid,
            }

            def wrapped(p_):
                if has_batches_seen:
                    return loss_fn(p_, ms, batch, rng, True, seen_k)
                return loss_fn(p_, ms, batch, rng, True)

            (loss, (_, ms2)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(p)
            updates, os2 = optimizer.update(grads, os_, p)
            p = optax.apply_updates(p, updates)
            return (p, ms2, os2), loss

        (params, model_state, opt_state), losses = jax.lax.scan(
            body, (params, model_state, opt_state),
            (idx_mat, valid_vec, rngs, seen_vec))
        return params, model_state, opt_state, losses

    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


def local_cache_gather(mesh, axis_name: str = "data"):
    """Per-device gather for ROW-SHARDED dataset caches
    (data/device_cache.py:shard_cache): each device indexes only its own
    cache shard with LOCAL row indices — a ``shard_map`` whose output is
    batch-sharded over ``axis_name``, so the input path adds NO
    cross-device collective (gradients still all-reduce as usual)."""

    from jax.sharding import PartitionSpec as P

    def fn(cache_arr, idx):
        specs_c = P(*((axis_name,) + (None,) * (cache_arr.ndim - 1)))
        return jax.shard_map(
            lambda c, i: c[i], mesh=mesh,
            in_specs=(specs_c, P(axis_name)), out_specs=specs_c,
        )(cache_arr, idx)

    return fn


def make_mesh_cached_train_step(loss_fn, optimizer, seq_len: int,
                                batch_size: int, *,
                                has_batches_seen: bool = False,
                                donate: bool = True):
    """Data-parallel variant of :func:`make_cached_train_step` for
    ROW-SHARDED caches: per-device HBM holds 1/p of the split, each device
    gathers its batch rows from ITS OWN shard (``loss_fn`` must be built
    with ``cache_gather=local_cache_gather(mesh)``), and gradients
    all-reduce over ICI exactly like the streaming mesh path.

    The epoch plan comes from ``DeviceDatasetCache.mesh_epoch_plan``:
    ``idx_mat (K, B)`` holds LOCAL row indices laid out
    [dev0 rows | dev1 rows | ...], sharded ``P(None, 'data')``;
    ``mask_mat (K, B)`` bool marks real rows (per-device shard padding is
    not a contiguous tail, so the loss masks by row mask —
    train/losses.py:_row_mask).

    Call: (params, model_state, opt_state, key, counter, seen, loss_buf,
    cache (dict of row-sharded arrays), idx_mat, mask_mat)
    -> (params, model_state, opt_state, key, counter+1, seen+n_real,
    loss_buf).
    """

    def step(params, model_state, opt_state, key, counter, seen, loss_buf,
             cache, idx_mat, mask_mat):
        idx = jax.lax.dynamic_slice(
            idx_mat, (counter, 0), (1, batch_size))[0]
        mask = jax.lax.dynamic_slice(
            mask_mat, (counter, 0), (1, batch_size))[0]
        batch = {
            "cache_x": cache["x"], "cache_y": cache["y"],
            "cache_seq": cache.get("seq"), "idx": idx,
            "x": None, "y": None,
            "seq_lengths": jnp.full((batch_size,), seq_len, jnp.int32),
            "supports": None, "valid": mask,
        }
        key, sub = jax.random.split(key)

        def wrapped(p):
            if has_batches_seen:
                return loss_fn(p, model_state, batch, sub, True, seen)
            return loss_fn(p, model_state, batch, sub, True)

        (loss, (_, new_state)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss_buf = loss_buf.at[counter].set(loss)
        return (params, new_state, opt_state, key, counter + 1,
                seen + jnp.sum(mask.astype(jnp.int32)), loss_buf)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5, 6) if donate
                   else ())


def make_eval_step(loss_fn):
    """Jitted eval step: (params, model_state, batch) -> (loss, outputs)."""

    def step(params, model_state, batch):
        loss, (outputs, _) = loss_fn(params, model_state, batch,
                                     jax.random.PRNGKey(0), False)
        return loss, outputs

    return jax.jit(step)


def shard_batch(batch: Dict[str, Any], mesh, batch_axes: Optional[Dict[str, int]] = None):
    """Place a host batch onto the mesh, sharding batch dims on 'data'.

    ``supports`` are stacked (S, B, N, N) -> batch axis 1; everything else
    axis 0 by default. Multi-process: each process passes its host-local
    row slice and the shards assemble into one global jax.Array
    (``parallel.distributed.form_global_array``); replicated entries
    (scalars like ``valid``) must be identical on every process.
    """
    from eeg_gnn_tpu.parallel.distributed import form_global_array
    from eeg_gnn_tpu.parallel.mesh import batch_sharding, replicated_sharding

    batch_axes = batch_axes or {}
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        axis = batch_axes.get(k, 1 if k == "supports" else 0)
        if k == "valid" or v.ndim <= axis:  # scalars (e.g. valid counts)
            out[k] = form_global_array(v, replicated_sharding(mesh))
        else:
            out[k] = form_global_array(v, batch_sharding(mesh, v.ndim, axis))
    return out
