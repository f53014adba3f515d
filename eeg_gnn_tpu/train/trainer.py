"""Training/evaluation driver: the TPU-native equivalent of the reference's
``train.py``/``train_ssl.py`` entry flows.

Orchestration parity (train.py:30-194, train_ssl.py:24-284): unique run
dirs, args.json dump, logging + scalar metrics, dataset build, model build
per ``--model_name``, warm-start / fine-tune transplant, epoch loop with
per-epoch dev eval, best/last checkpointing, dev-loss early stopping,
cosine LR per epoch, final dev+test eval with dev-tuned decision threshold
for detection.

TPU specifics: one jitted train step (forward+backward+clip+adam fused);
batches are padded to a fixed shape (one XLA program, no recompiles) and
masked at the metrics stage; params replicated / batch sharded over the
mesh's ``data`` axis; model state (e.g. BatchNorm running stats) threaded
functionally through the step.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from eeg_gnn_tpu.config import ExperimentConfig
from eeg_gnn_tpu.train.checkpoint import (
    CheckpointSaver,
    build_finetune_params,
    load_params_like,
)
from eeg_gnn_tpu.train.metrics import AverageMeter, eval_dict, thresh_max_f1
from eeg_gnn_tpu.train.optim import make_optimizer
from eeg_gnn_tpu.train.step import (
    make_eval_step,
    make_train_step,
    ssl_loss_fn,
    supervised_loss_fn,
)


def _pad_batch(batch, target: int):
    """Pad a Batch to ``target`` rows (repeating row 0) and return the valid
    count; keeps every step the same XLA program."""
    n = len(batch)
    if n == target:
        return batch, n

    def pad(a, axis=0):
        if a is None:
            return None
        pad_n = target - n
        first = np.take(a, [0], axis=axis)
        return np.concatenate([a, np.repeat(first, pad_n, axis=axis)], axis=axis)

    return dataclasses.replace(
        batch,
        x=pad(batch.x),
        y=pad(batch.y),
        seq_lengths=pad(batch.seq_lengths),
        supports=pad(batch.supports, axis=1),
        adj=pad(batch.adj),
        names=batch.names + [batch.names[0]] * (target - n),
    ), n


class Trainer:
    """Drives training + evaluation for one task on one model bundle."""

    def __init__(self, cfg: ExperimentConfig, loaders, scaler, log,
                 metrics_writer, bundle=None, mesh=None, input_pipeline=None,
                 device_caches=None):
        self.cfg = cfg
        self.loaders = loaders
        self.scaler = scaler
        self.log = log
        self.tbx = metrics_writer
        self.mesh = mesh
        self.input_pipeline = input_pipeline
        # HBM-resident split caches {split: DeviceDatasetCache} — when a
        # split is cached, its batches are gathered on device and the
        # loader is bypassed entirely (data/device_cache.py). All three
        # task families cache (round 4); with a mesh the TRAIN cache is
        # row-sharded over the data axis and eval splits stream.
        self.is_ssl = cfg.task == "SS pre-training"
        self.device_caches = device_caches or {}
        # loader batches carry RAW clips only when the loaders were built in
        # raw_mode (--device_pipeline); with --hbm_cache alone the pipeline
        # serves cached features and streaming batches stay featurized
        self.raw_batches = (input_pipeline is not None
                            and getattr(cfg, "device_pipeline", False))
        # multi-host: every process holds 1/n_procs of each global batch
        # (parallel/distributed.py); batch dicts are assembled into global
        # jax.Arrays and the loss masks the global valid count.
        self.n_procs = jax.process_count()

        steps_per_epoch = max(1, len(loaders["train"]))
        self.optimizer = make_optimizer(
            cfg.lr_init, cfg.l2_wd, cfg.max_grad_norm, cfg.num_epochs,
            steps_per_epoch)

        if self.is_ssl:
            mean = None if scaler is None else jnp.float32(scaler.mean)
            std = None if scaler is None else jnp.float32(scaler.std)
            self.loss_mean, self.loss_std = mean, std
            self.loss_fn = ssl_loss_fn(cfg.dcrnn_config(), mean, std,
                                       input_pipeline=input_pipeline)
            self.train_step = make_train_step(self.loss_fn, self.optimizer,
                                              has_batches_seen=True)
        else:
            assert bundle is not None
            self.loss_fn = supervised_loss_fn(bundle, cfg.task,
                                              input_pipeline=input_pipeline)
            self.train_step = make_train_step(self.loss_fn, self.optimizer)
        self.eval_step = make_eval_step(self.loss_fn)

        from eeg_gnn_tpu.data.rotating_cache import RotatingDeviceCache

        self.fused_steps = max(1, getattr(cfg, "fused_steps", 1))
        self.cache_is_mesh = False
        self._rotating = isinstance(self.device_caches.get("train"),
                                    RotatingDeviceCache)
        if "train" in self.device_caches:
            seq_len = self.device_caches["train"].seq_len
            if mesh is not None:
                # row-shard the train cache over the data axis (per-device
                # HBM holds 1/p of the split); eval splits stream through
                # the regular mesh path. Rotating caches arrive with
                # mesh-aware (already row-sharded) slab uploads and use
                # the same mesh cached step per slab.
                from eeg_gnn_tpu.data.device_cache import shard_cache
                from eeg_gnn_tpu.train.step import (
                    local_cache_gather,
                    make_mesh_cached_train_step,
                )

                if not self._rotating:
                    self.device_caches = {
                        "train": shard_cache(self.device_caches["train"],
                                             mesh)}
                gather = local_cache_gather(mesh)
                if self.is_ssl:
                    mesh_loss = ssl_loss_fn(cfg.dcrnn_config(),
                                            self.loss_mean, self.loss_std,
                                            input_pipeline=input_pipeline,
                                            cache_gather=gather)
                else:
                    mesh_loss = supervised_loss_fn(bundle, cfg.task,
                                                   input_pipeline=input_pipeline,
                                                   cache_gather=gather)
                self.cached_train_step = make_mesh_cached_train_step(
                    mesh_loss, self.optimizer, seq_len,
                    cfg.train_batch_size, has_batches_seen=self.is_ssl)
                self.cache_is_mesh = True
                if self.fused_steps > 1:
                    log.warning("fused_steps is ignored on the mesh-sharded "
                                "cached path (per-step dispatch)")
            elif self.fused_steps > 1:
                from eeg_gnn_tpu.train.step import make_cached_epoch_step

                self.cached_epoch_step = make_cached_epoch_step(
                    self.loss_fn, self.optimizer, seq_len,
                    has_batches_seen=self.is_ssl)
            else:
                from eeg_gnn_tpu.train.step import make_cached_train_step

                self.cached_train_step = make_cached_train_step(
                    self.loss_fn, self.optimizer, seq_len,
                    cfg.train_batch_size, has_batches_seen=self.is_ssl)
        if self.fused_steps > 1:
            from eeg_gnn_tpu.train.step import make_multi_train_step

            self.multi_train_step = make_multi_train_step(
                self.loss_fn, self.optimizer,
                has_batches_seen=self.is_ssl)

    # -- batch placement ---------------------------------------------------

    def _host_batch(self, batch, batch_size: int):
        """Pad to the fixed per-process size and lay out as a dict of host
        numpy arrays. ``batch_size`` is the GLOBAL batch size; with
        multi-process loaders each process holds batch_size/n_procs rows and
        ``batch.valid`` carries the global valid count."""
        global_valid = batch.valid
        batch, valid = _pad_batch(batch, batch_size // self.n_procs)
        if global_valid is not None:
            valid = global_valid
        if self.raw_batches:
            d = {
                "raw": np.asarray(batch.x),  # (B, C, L) raw clips
                "seq_lengths": np.asarray(batch.seq_lengths),
                "supports": None,
            }
            if self.is_ssl:
                d["raw_y"] = np.asarray(batch.y)  # (B, C, L_out) raw next
                d["y"] = None  # produced on device by the pipeline
            else:
                d["y"] = np.asarray(batch.y)
        else:
            d = {
                "x": np.asarray(batch.x),
                "y": np.asarray(batch.y),
                "seq_lengths": np.asarray(batch.seq_lengths),
                "supports": None if batch.supports is None
                else np.asarray(batch.supports),
            }
        # padded rows are masked out of the loss (reference trains on natural
        # partial batches, train.py:236-275)
        d["valid"] = np.asarray(valid, np.int32)
        return d, valid, batch.names

    def _device_batch(self, batch, batch_size: int):
        d, valid, names = self._host_batch(batch, batch_size)
        if self.mesh is not None:
            from eeg_gnn_tpu.train.step import shard_batch

            d = shard_batch(d, self.mesh)
        else:
            d = {k: None if v is None else jnp.asarray(v)
                 for k, v in d.items()}
        return d, valid, names

    def _stacked_device_batches(self, batches, batch_size: int):
        """Stack K host batches with a leading K axis (single H2D transfer)
        for the fused multi-step program; returns (dict, true sizes)."""
        host, sizes = [], []
        for b in batches:
            d, valid, _ = self._host_batch(b, batch_size)
            host.append(d)
            sizes.append(valid)
        stacked = {
            k: None if host[0][k] is None
            else jnp.asarray(np.stack([h[k] for h in host]))
            for k in host[0]
        }
        if self.mesh is not None:
            from eeg_gnn_tpu.train.step import shard_batch

            # leading axis is the scan (step) axis; batch dims shift by one
            stacked = shard_batch(
                stacked, self.mesh,
                batch_axes={k: (2 if k == "supports" else 1) for k in stacked})
        return stacked, sizes

    # -- training ----------------------------------------------------------

    def _run_cached_steps(self, params, model_state, opt_state, rng,
                          cache_d, perm, valid_vec, seen_base):
        """Run the cached-step program over one (perm, valid_vec) plan —
        a whole resident epoch, or one rotating shard. Honors
        --fused_steps by scanning chunks of that many optimizer steps.
        Returns (params, model_state, opt_state, rng, losses np (K,))."""
        k_steps = len(valid_vec)
        if self.fused_steps > 1:
            rng, *subs = jax.random.split(rng, k_steps + 1)
            idx_mat = perm.reshape(k_steps, -1)
            subs = jnp.stack(subs)
            parts = []
            base = seen_base
            for lo in range(0, k_steps, self.fused_steps):
                hi = min(lo + self.fused_steps, k_steps)
                params, model_state, opt_state, ls = self.cached_epoch_step(
                    params, model_state, opt_state, jnp.int32(base),
                    cache_d, jnp.asarray(idx_mat[lo:hi]),
                    jnp.asarray(valid_vec[lo:hi]), subs[lo:hi])
                parts.append(np.asarray(ls))
                base += int(valid_vec[lo:hi].sum())
            return params, model_state, opt_state, rng, np.concatenate(parts)
        rng, epoch_key = jax.random.split(rng)
        perm_d = jnp.asarray(perm)
        valid_d = jnp.asarray(valid_vec)
        counter = jnp.int32(0)
        seen = jnp.int32(seen_base)
        losses = jnp.zeros((k_steps,), jnp.float32)
        for _ in range(k_steps):
            (params, model_state, opt_state, epoch_key, counter, seen,
             losses) = self.cached_train_step(
                params, model_state, opt_state, epoch_key, counter, seen,
                losses, cache_d, perm_d, valid_d)
        return params, model_state, opt_state, rng, np.asarray(losses)

    def _run_mesh_cached_steps(self, params, model_state, opt_state, rng,
                               cache_d, idx_mat, mask_mat, seen_base):
        """Run the mesh-sharded cached-step program over one
        (idx_mat, mask_mat) plan — a whole resident epoch, or one
        rotating slab. Returns (params, model_state, opt_state, rng,
        losses np (K,))."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from eeg_gnn_tpu.parallel.distributed import global_put

        spec = NamedSharding(self.mesh, P(None, "data"))
        # identical host plans on every process (seeded rng); multi-host
        # each process uploads only its column slice
        idx_d = global_put(idx_mat, spec, axis=1)
        mask_d = global_put(mask_mat, spec, axis=1)
        k_steps = idx_mat.shape[0]
        rng, epoch_key = jax.random.split(rng)
        counter = jnp.int32(0)
        seen = jnp.int32(seen_base)
        losses = jnp.zeros((k_steps,), jnp.float32)
        for _ in range(k_steps):
            (params, model_state, opt_state, epoch_key, counter, seen,
             losses) = self.cached_train_step(
                params, model_state, opt_state, epoch_key, counter, seen,
                losses, cache_d, idx_d, mask_d)
        return params, model_state, opt_state, rng, np.asarray(losses)

    def train(self, params, model_state, save_dir: str):
        cfg = self.cfg
        saver = CheckpointSaver(save_dir, cfg.metric_name,
                                cfg.maximize_metric, log=self.log)
        opt_state = self.optimizer.init(params)
        rng = jax.random.PRNGKey(cfg.rand_seed)

        step = 0
        prev_val_loss = 1e10
        patience_count = 0
        early_stop = False
        epoch = 0
        def run_one(params, model_state, opt_state, batch, step):
            dbatch, _, _ = self._device_batch(batch, cfg.train_batch_size)
            nonlocal rng
            rng, sub = jax.random.split(rng)
            if self.is_ssl:
                params, model_state, opt_state, loss = self.train_step(
                    params, model_state, opt_state, dbatch, sub,
                    jnp.int32(step))
            else:
                params, model_state, opt_state, loss = self.train_step(
                    params, model_state, opt_state, dbatch, sub)
            step += len(batch)
            self.tbx.add_scalar("train/Loss", float(loss), step)
            return params, model_state, opt_state, step

        def run_fused(params, model_state, opt_state, batches, step):
            dbatches, sizes = self._stacked_device_batches(
                batches, cfg.train_batch_size)
            nonlocal rng
            rng, *subs = jax.random.split(rng, len(batches) + 1)
            subs = jnp.stack(subs)
            if self.is_ssl:
                seen = step + np.concatenate([[0], np.cumsum(sizes[:-1])])
                params, model_state, opt_state, losses = self.multi_train_step(
                    params, model_state, opt_state, dbatches, subs,
                    jnp.asarray(seen, jnp.int32))
            else:
                params, model_state, opt_state, losses = self.multi_train_step(
                    params, model_state, opt_state, dbatches, subs)
            losses = np.asarray(losses)
            for bsz, loss in zip(sizes, losses):
                step += bsz
                self.tbx.add_scalar("train/Loss", float(loss), step)
            return params, model_state, opt_state, step

        train_cache = self.device_caches.get("train")
        cache_rng = np.random.RandomState(cfg.rand_seed)

        while epoch != cfg.num_epochs and not early_stop:
            epoch += 1
            self.log.info(f"Starting epoch {epoch}...")
            if train_cache is not None:
                # device-resident split: the epoch's shuffled permutation
                # uploads ONCE; every step slices its batch, splits its rng
                # key, and scatters its loss entirely on device — the
                # steady-state dispatch carries zero host data and the only
                # D2H is the epoch-end loss buffer. (--fused_steps N > 1
                # additionally scans chunks of N optimizer steps inside one
                # lax.scan program — same N-step granularity as the
                # streaming path; per-step dispatch pipelines better under
                # runtimes like the axon tunnel, so it is the default.)
                if self.cache_is_mesh and self._rotating:
                    # beyond-HBM split on a mesh: rotate ROW-SHARDED
                    # fixed-shape slabs (each device holds 1/p of every
                    # slab), prefetching slab i+1 while slab i trains —
                    # the multi-device analogue of the single-device
                    # rotation below (kills the round-4 streaming cliff
                    # for multi-device beyond-HBM runs)
                    order = train_cache.epoch_shard_order(cache_rng)
                    slab_next = train_cache.prefetch(order[0])
                    v_parts, l_parts, seen_base = [], [], step
                    for si, sid in enumerate(order):
                        slab = slab_next
                        if si + 1 < len(order):
                            slab_next = train_cache.prefetch(order[si + 1])
                        idx_mat, mask_mat = train_cache.mesh_shard_plan(
                            sid, cfg.train_batch_size, True, cache_rng)
                        (params, model_state, opt_state, rng,
                         ls) = self._run_mesh_cached_steps(
                            params, model_state, opt_state, rng, slab,
                            idx_mat, mask_mat, seen_base)
                        vv = mask_mat.sum(axis=1).astype(np.int32)
                        seen_base += int(vv.sum())
                        v_parts.append(vv)
                        l_parts.append(ls)
                    valid_vec = np.concatenate(v_parts)
                    losses = np.concatenate(l_parts)
                    slab = slab_next = None  # free before eval (ADVICE r4)
                elif self.cache_is_mesh:
                    cache_d = {"x": train_cache.x, "y": train_cache.y,
                               "seq": train_cache.seq}
                    idx_mat, mask_mat = train_cache.mesh_epoch_plan(
                        cfg.train_batch_size, self.mesh.shape["data"],
                        True, cache_rng)
                    valid_vec = mask_mat.sum(axis=1).astype(np.int32)
                    (params, model_state, opt_state, rng,
                     losses) = self._run_mesh_cached_steps(
                        params, model_state, opt_state, rng, cache_d,
                        idx_mat, mask_mat, step)
                elif self._rotating:
                    # beyond-HBM split: rotate fixed-shape shards through
                    # HBM, prefetching shard i+1 (async device_put) while
                    # shard i trains — the upload overlaps the steps, so
                    # steady state pays max(compute, link), not their sum
                    # (data/rotating_cache.py)
                    order = train_cache.epoch_shard_order(cache_rng)
                    slab_next = train_cache.prefetch(order[0])
                    v_parts, l_parts, seen_base = [], [], step
                    for si, sid in enumerate(order):
                        slab = slab_next
                        if si + 1 < len(order):
                            slab_next = train_cache.prefetch(order[si + 1])
                        perm, vv = train_cache.shard_plan(
                            sid, cfg.train_batch_size, True, cache_rng)
                        (params, model_state, opt_state, rng,
                         ls) = self._run_cached_steps(
                            params, model_state, opt_state, rng, slab,
                            perm, vv, seen_base)
                        seen_base += int(vv.sum())
                        v_parts.append(vv)
                        l_parts.append(ls)
                    valid_vec = np.concatenate(v_parts)
                    losses = np.concatenate(l_parts)
                    # release the last train slabs BEFORE eval prefetches
                    # its own (dev/test rotating caches size their shards
                    # for three resident slabs each — keeping two train
                    # slabs alive alongside them can exceed HBM; ADVICE r4)
                    slab = slab_next = None
                else:
                    cache_d = {"x": train_cache.x, "y": train_cache.y,
                               "seq": train_cache.seq}
                    perm, valid_vec = train_cache.epoch_plan(
                        cfg.train_batch_size, True, cache_rng)
                    (params, model_state, opt_state, rng,
                     losses) = self._run_cached_steps(
                        params, model_state, opt_state, rng, cache_d,
                        perm, valid_vec, step)
                for v, loss in zip(valid_vec, losses):
                    step += int(v)
                    self.tbx.add_scalar("train/Loss", float(loss), step)
            else:
                pending = []
                for batch in self.loaders["train"]:
                    if self.fused_steps > 1:
                        pending.append(batch)
                        if len(pending) == self.fused_steps:
                            params, model_state, opt_state, step = run_fused(
                                params, model_state, opt_state, pending, step)
                            pending = []
                    else:
                        params, model_state, opt_state, step = run_one(
                            params, model_state, opt_state, batch, step)
                # epoch remainder smaller than fused_steps: single-step
                for batch in pending:
                    params, model_state, opt_state, step = run_one(
                        params, model_state, opt_state, batch, step)

            if epoch % cfg.eval_every == 0:
                eval_results = self.evaluate(params, model_state, "dev")
                metric_val = eval_results.get(cfg.metric_name)
                saver.save(epoch, params, opt_state, metric_val,
                           model_state=model_state)

                if eval_results["loss"] < prev_val_loss:
                    patience_count = 0
                else:
                    patience_count += 1
                prev_val_loss = eval_results["loss"]
                if patience_count == cfg.patience:
                    early_stop = True

                self.log.info(
                    "Dev " + ", ".join(f"{k}: {v:.3f}" for k, v in
                                       eval_results.items()))
                for k, v in eval_results.items():
                    self.tbx.add_scalar(f"eval/{k}", v, step)

        return params, model_state, saver

    # -- evaluation --------------------------------------------------------

    def _eval_batches(self, split: str):
        """Yield (device_batch, valid, y_host, names) from the split's HBM
        cache when present (resident or rotating), else from its streaming
        loader."""
        from eeg_gnn_tpu.data.rotating_cache import RotatingDeviceCache

        cache = self.device_caches.get(split)
        if isinstance(cache, RotatingDeviceCache):
            bsz = self.cfg.test_batch_size
            seq_memo = {}
            slab_next = cache.prefetch(0)
            for sid in range(cache.num_shards):
                slab = slab_next
                if sid + 1 < cache.num_shards:
                    slab_next = cache.prefetch(sid + 1)
                labels = cache.shard_labels(sid)
                names = cache.shard_names(sid)
                perm, valid_vec = cache.shard_plan(
                    sid, bsz, False, np.random.RandomState(0))
                for k, valid in enumerate(valid_vec):
                    idx = perm[k * bsz:(k + 1) * bsz]
                    seq = seq_memo.get(bsz)
                    if seq is None:
                        seq = seq_memo[bsz] = jnp.full((bsz,),
                                                       cache.seq_len,
                                                       jnp.int32)
                    dbatch = {
                        "cache_x": slab["x"], "cache_y": slab["y"],
                        "cache_seq": slab["seq"],
                        "idx": np.ascontiguousarray(idx, np.int32),
                        "x": None, "y": None, "seq_lengths": seq,
                        "supports": None, "valid": np.int32(valid),
                    }
                    yield (dbatch, int(valid),
                           None if labels is None
                           else labels[idx[:valid]],
                           [names[i] for i in idx[:valid]])
            # drop slab refs eagerly: the generator may be kept alive by
            # the caller after exhaustion (ADVICE r4 co-residency)
            slab = slab_next = None
            return
        if cache is not None:
            rng = np.random.RandomState(0)  # unused: shuffle=False
            for idx, valid in cache.epoch_index_batches(
                    self.cfg.test_batch_size, False, rng):
                yield (cache.device_batch(idx, valid), valid,
                       None if cache._labels_host is None
                       else cache._labels_host[idx[:valid]],
                       [cache.names[i] for i in idx[:valid]])
            return
        for batch in self.loaders[split]:
            dbatch, valid, names = self._device_batch(
                batch, self.cfg.test_batch_size)
            if self.n_procs > 1:
                from eeg_gnn_tpu.parallel.distributed import all_gather_host

                y_host = all_gather_host(np.asarray(batch.y))
            else:
                y_host = np.asarray(batch.y)
            yield dbatch, valid, y_host, names

    def evaluate(self, params, model_state, split: str, is_test: bool = False,
                 best_thresh: float = 0.5) -> Dict[str, float]:
        cfg = self.cfg
        if self.is_ssl:
            return self._evaluate_ssl(params, model_state, split)

        nll = AverageMeter()
        y_pred_all, y_true_all, y_prob_all, names_all = [], [], [], []
        for dbatch, valid, y_host, names in self._eval_batches(split):
            loss, logits = self.eval_step(params, model_state, dbatch)
            if self.n_procs > 1:
                # logits are batch-sharded across processes; metrics are
                # computed on the gathered global rows (identical everywhere)
                from jax.experimental import multihost_utils

                logits = multihost_utils.process_allgather(logits, tiled=True)
            logits = np.asarray(logits)[:valid]
            y = y_host.reshape(-1)[:valid]
            if cfg.num_classes == 1:
                prob = 1.0 / (1.0 + np.exp(-logits.reshape(-1)))
                pred = (prob > best_thresh).astype(int)
            else:
                e = np.exp(logits - logits.max(axis=1, keepdims=True))
                prob = e / e.sum(axis=1, keepdims=True)
                pred = prob.argmax(axis=1).reshape(-1)
            nll.update(float(loss), valid)
            y_prob_all.append(prob)
            y_pred_all.append(pred)
            y_true_all.append(y.astype(int))
            names_all.extend(names[:valid])

        y_pred = np.concatenate(y_pred_all)
        y_true = np.concatenate(y_true_all)
        y_prob = np.concatenate(y_prob_all)

        if cfg.task == "detection" and split == "dev" and is_test:
            best_thresh = thresh_max_f1(y_true, y_prob)
            y_pred = (y_prob > best_thresh).astype(int)

        scores, _, _ = eval_dict(
            y_pred=y_pred, y=y_true, y_prob=y_prob, file_names=names_all,
            average="binary" if cfg.task == "detection" else "weighted")
        results = {"loss": nll.avg, "acc": scores["acc"], "F1": scores["F1"],
                   "recall": scores["recall"], "precision": scores["precision"],
                   "best_thresh": best_thresh}
        if "auroc" in scores:
            results["auroc"] = scores["auroc"]
        return results

    def _evaluate_ssl(self, params, model_state, split: str) -> Dict[str, float]:
        nll = AverageMeter()
        if self.device_caches.get(split) is not None:
            for dbatch, valid, _, _ in self._eval_batches(split):
                loss, _ = self.eval_step(params, model_state, dbatch)
                nll.update(float(loss), valid)
            return {"loss": nll.avg}
        for batch in self.loaders[split]:
            dbatch, valid, _ = self._device_batch(batch, self.cfg.test_batch_size)
            loss, _ = self.eval_step(params, model_state, dbatch)
            nll.update(float(loss), valid)
        return {"loss": nll.avg}


def run_experiment(cfg: ExperimentConfig, loaders, scaler, save_dir: str,
                   log, metrics_writer, mesh=None, init_params=None,
                   input_pipeline=None, device_caches=None) -> Dict[str, float]:
    """Full main() flow for all tasks/models; returns final test results."""
    key = jax.random.PRNGKey(cfg.rand_seed)

    bundle = None
    model_state = {}
    if cfg.task == "SS pre-training":
        from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model

        params = init_params or init_next_time_pred_model(key, cfg.dcrnn_config())
    else:
        from eeg_gnn_tpu.models.registry import build_model

        bundle = build_model(cfg)
        if init_params is None:
            params, model_state = bundle.init(key)
        else:
            params = init_params

    # Warm start / fine-tune transplant (train.py:128-151)
    if cfg.load_model_path:
        if cfg.fine_tune:
            from eeg_gnn_tpu.io import (
                import_next_time_pred_params,
                load_torch_state_dict,
            )

            if cfg.load_model_path.endswith((".pth.tar", ".pth", ".pt", ".tar")):
                pre = import_next_time_pred_params(
                    load_torch_state_dict(cfg.load_model_path),
                    cfg.pretrained_num_rnn_layers)
            else:
                from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model

                pre_cfg = cfg.dcrnn_config(cfg.pretrained_num_rnn_layers)
                pre = load_params_like(
                    cfg.load_model_path,
                    init_next_time_pred_model(key, pre_cfg))
            params = build_finetune_params(params, pre, cfg.num_rnn_layers)
        else:
            params = load_params_like(cfg.load_model_path, params)

    trainer = Trainer(cfg, loaders, scaler, log, metrics_writer,
                      bundle=bundle, mesh=mesh, input_pipeline=input_pipeline,
                      device_caches=device_caches)

    if cfg.do_train:
        params, model_state, saver = trainer.train(params, model_state, save_dir)
        if os.path.exists(saver.best_path):
            params = load_params_like(saver.best_path, params)
            state_path = saver.best_path[:-4] + ".state.npz"
            if model_state and os.path.exists(state_path):
                model_state = load_params_like(state_path, model_state)

    if cfg.task == "SS pre-training":
        test = trainer.evaluate(params, model_state, "test")
        log.info(f"Test set prediction MAE loss: {test['loss']:.3f}")
        return test

    dev = trainer.evaluate(params, model_state, "dev", is_test=True)
    log.info("DEV set prediction results: "
             + ", ".join(f"{k}: {v:.3f}" for k, v in dev.items()))
    test = trainer.evaluate(params, model_state, "test", is_test=True,
                            best_thresh=dev["best_thresh"])
    log.info("TEST set prediction results: "
             + ", ".join(f"{k}: {v:.3f}" for k, v in test.items()))
    return test
