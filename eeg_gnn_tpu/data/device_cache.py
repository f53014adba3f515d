"""HBM-resident dataset cache: upload the featurized split ONCE, then
serve every batch by on-device gather inside the jitted train step.

Why this exists: the measured end-to-end bottleneck on remote-accelerator
hosts is host->device transfer, not the step (benchmarks/
e2e_pipeline_results.json: H2D sustains ~0.03 GB/s over the axon tunnel —
a 29 MB feature batch costs ~100x the 11 ms step). The reference streams
every batch from host DataLoader workers each epoch
(dataloader_detection.py:356-416, dataloader_ssl.py:282-361); at TPU
speeds that wastes the chip whenever the link is slower than ~5 GB/s. The
flagship detection split is small — ~10k clips x (60, 19, 100) bf16 =
~2.3 GB — so the TPU-native answer is to keep the WHOLE split in HBM
(v5e: 16 GB) and move only a (B,) int32 index vector per step.

Per-step data math runs on device via ``DevicePipeline.features`` /
``ssl_features`` / ``classification_features`` — identical semantics to
the host loader (augment THEN standardize, reflection support choice);
the gather fuses into the same XLA program as the model. Shuffling stays
on host (a seeded permutation of indices per epoch, matching
``data/loader.py`` order when seeded identically).

All three task families are cacheable (round 4; round 3 was
detection-only): detection (x feats + float labels), SSL (x feats +
y-target feats), classification (PADDED x feats + int labels + per-clip
seq_lengths; combined graph only — see
``DevicePipeline.classification_features``).

Scale-out: :func:`shard_cache` re-places a cache's arrays row-sharded
over a mesh's ``data`` axis so per-device HBM holds 1/p of the split;
:meth:`DeviceDatasetCache.mesh_epoch_plan` builds per-device local index
plans (each device gathers ONLY its own shard — no cross-device
collective in the input path). See ``train/step.py:
make_mesh_cached_train_step``.

Memory guard: :func:`fits_in_hbm` estimates footprint so callers can fall
back to the streaming loader (or the chunked rotating cache,
``data/rotating_cache.py``) for splits that don't fit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DeviceDatasetCache:
    """Featurized clips + labels resident on device.

    Args:
        feats: (num_clips, T, N, D) UN-augmented, UN-standardized features
            (augment/standardize run on device per step — same order as the
            host path). For classification, zero-PADDED to T with the true
            lengths in ``seq_lengths``.
        labels: (num_clips,) float labels (detection), int labels
            (classification), or (num_clips, T_out, N, D) target features
            (SSL — rides the same ``cache_y`` slot; the SSL loss treats it
            as features).
        seq_len: value for the constant ``seq_lengths`` vector when
            ``seq_lengths`` is None.
        storage_dtype: 'bfloat16' halves HBM + upload (features are cast
            to the compute dtype by the model's first op anyway);
            'float32' for exact host-path parity.
        seq_lengths: optional (num_clips,) int32 per-clip true lengths
            (classification); gathered per batch on device.
    """

    def __init__(self, feats: np.ndarray, labels: np.ndarray, seq_len: int,
                 storage_dtype: str = "float32", names=None,
                 seq_lengths: Optional[np.ndarray] = None, mesh=None,
                 global_num_clips: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        dt = jnp.bfloat16 if storage_dtype == "bfloat16" else jnp.float32
        feats = np.asarray(feats)
        labels = np.asarray(labels, np.float32)
        # multi-host: ``feats`` holds only THIS process's padded row shard
        # (builders featurize per process via _process_rows) and
        # ``global_num_clips`` carries the real split size for the epoch
        # plans (identical on every process)
        rows_are_local = global_num_clips is not None
        self.num_clips = (int(global_num_clips) if rows_are_local
                          else int(feats.shape[0]))
        self.mesh = mesh
        if mesh is not None:
            # Build SHARDED from host numpy: casting + row padding happen on
            # host and each device receives only its 1/p row shard via one
            # sharded device_put — the whole split never materializes on any
            # single device (the unsharded jnp.asarray below would OOM
            # device 0 for any split that only fits when sharded; ADVICE r4
            # high). Multi-host: each process contributes its local rows via
            # make_array_from_process_local_data — no cross-host traffic.
            from jax.sharding import NamedSharding, PartitionSpec as P

            import ml_dtypes

            np_dt = (np.dtype(ml_dtypes.bfloat16)
                     if storage_dtype == "bfloat16" else np.float32)
            p = mesh.shape["data"]
            n_pad = -(-self.num_clips // p) * p

            def put(a):
                if a is None:
                    return None
                spec = NamedSharding(
                    mesh, P(*(("data",) + (None,) * (a.ndim - 1))))
                if rows_are_local:
                    return jax.make_array_from_process_local_data(spec, a)
                if n_pad != a.shape[0]:
                    reps = np.repeat(a[:1], n_pad - a.shape[0], axis=0)
                    a = np.concatenate([a, reps], axis=0)
                return jax.device_put(a, spec)

            self.x = put(feats.astype(np_dt))
            self.y = put(labels.astype(np_dt) if labels.ndim > 1 else labels)
            self.seq = (None if seq_lengths is None
                        else put(np.asarray(seq_lengths, np.int32)))
        else:
            # one bulk H2D each; everything after this is device-side
            self.x = jnp.asarray(feats, dtype=dt)
            # SSL target features share the label slot (and the storage
            # dtype)
            self.y = jnp.asarray(labels, dtype=dt if labels.ndim > 1
                                 else jnp.float32)
            self.seq = (None if seq_lengths is None
                        else jnp.asarray(np.asarray(seq_lengths, np.int32)))
        self.seq_len = int(seq_len)
        self.names = (list(names) if names is not None
                      else [str(i) for i in range(self.num_clips)])
        self._labels_host = labels if labels.ndim == 1 else None
        self._seq_host = (None if seq_lengths is None
                          else np.asarray(seq_lengths, np.int32))
        self._seq_cache = {}  # batch size -> resident seq_lengths vector

    def __len__(self):
        return self.num_clips

    def nbytes(self) -> int:
        n = self.x.size * self.x.dtype.itemsize
        n += self.y.size * self.y.dtype.itemsize
        if self.seq is not None:
            n += self.seq.size * 4
        return n

    def epoch_index_batches(self, batch_size: int, shuffle: bool,
                            rng: np.random.RandomState,
                            drop_last: bool = False):
        """Host-side index plan for one epoch: yields (idx (B,), valid).

        The final partial batch is padded by repeating its first index —
        same fixed-shape policy as ``train/trainer.py:_pad_batch``; the
        loss masks rows >= valid.
        """
        order = np.arange(self.num_clips)
        if shuffle:
            rng.shuffle(order)
        for lo in range(0, self.num_clips, batch_size):
            idx = order[lo:lo + batch_size]
            valid = len(idx)
            if valid < batch_size:
                if drop_last:
                    return
                idx = np.concatenate(
                    [idx, np.repeat(idx[:1], batch_size - valid)])
            yield idx.astype(np.int32), valid

    def epoch_plan(self, batch_size: int, shuffle: bool,
                   rng: np.random.RandomState, drop_last: bool = False):
        """Flat epoch plan for the device-resident step
        (train/step.py:make_cached_train_step): returns
        (perm (K*batch_size,) int32, valid (K,) int32) — uploaded ONCE per
        epoch; the step slices batch k with ``dynamic_slice``."""
        plan = list(self.epoch_index_batches(batch_size, shuffle, rng,
                                             drop_last))
        perm = np.concatenate([p[0] for p in plan])
        valid = np.asarray([p[1] for p in plan], np.int32)
        return perm, valid

    def mesh_epoch_plan(self, batch_size: int, num_devices: int,
                        shuffle: bool, rng: np.random.RandomState):
        """Per-device epoch plan for a row-sharded cache (:func:`shard_cache`).

        Device d owns rows [d*block, (d+1)*block) of the padded cache and
        draws its per-step rows ONLY from that shard (sharded shuffling —
        the standard data-parallel loader semantics; each epoch every real
        clip is visited exactly once). Returns
        (idx_mat (K, B) int32 of LOCAL row indices laid out
        [dev0 rows | dev1 rows | ...] per step, mask_mat (K, B) bool) —
        padded slots repeat a real local row with mask False, so every
        device runs the same K steps and the loss masks by the boolean
        row mask (train/losses.py:_row_mask).
        """
        block = -(-self.num_clips // num_devices)  # padded rows per device
        return mesh_plan(self.num_clips, block, num_devices, batch_size,
                         shuffle, rng)

    def device_batch(self, idx: np.ndarray, valid: int):
        """Assemble the train-step batch dict: the cache rides along as a
        device array argument (NOT a jit constant — passing it as an
        argument keeps the 100s-of-MB array out of the compiled program).
        The (B,) index vector and valid count stay numpy — the jit call
        transfers them with the dispatch; eager per-leaf ``jnp.asarray``
        would cost one tunnel round-trip EACH per step (measured ~2 ms of
        the 11 ms step on the axon runtime). ``seq_lengths`` is memoized
        on device per batch size (constant-length tasks only; for
        classification the true lengths are gathered in the loss)."""
        import jax.numpy as jnp

        b = len(idx)
        seq = self._seq_cache.get(b)
        if seq is None:
            seq = self._seq_cache[b] = jnp.full((b,), self.seq_len,
                                                jnp.int32)
        return {
            "cache_x": self.x,
            "cache_y": self.y,
            "cache_seq": self.seq,
            "idx": np.ascontiguousarray(idx, np.int32),
            "x": None, "y": None,
            "seq_lengths": seq,
            "supports": None,
            "valid": np.int32(valid),
        }


def mesh_plan(num_real: int, block: int, p: int, batch_size: int,
              shuffle: bool, rng: np.random.RandomState):
    """Per-device (idx_mat, mask_mat) plan core shared by resident
    (:meth:`DeviceDatasetCache.mesh_epoch_plan`) and rotating
    (:meth:`~eeg_gnn_tpu.data.rotating_cache.RotatingDeviceCache.
    mesh_shard_plan`) row-sharded caches: the real rows [0, num_real) lay
    out contiguously over p device blocks of ``block`` rows; device d
    draws only LOCAL indices within its block, padded slots repeat a real
    local row with mask False."""
    if batch_size % p:
        raise ValueError(f"batch size {batch_size} must divide over "
                         f"{p} devices")
    b_local = batch_size // p
    # real rows per device (the pad tail lives on the last device(s))
    real = [min(block, max(0, num_real - d * block)) for d in range(p)]
    k_steps = max(1, max(-(-r // b_local) for r in real))
    idx = np.zeros((k_steps, p, b_local), np.int32)
    mask = np.zeros((k_steps, p, b_local), bool)
    for d in range(p):
        order = np.arange(real[d], dtype=np.int32)
        if shuffle:
            rng.shuffle(order)
        flat = np.full((k_steps * b_local,),
                       order[0] if real[d] else 0, np.int32)
        flat[: real[d]] = order
        idx[:, d, :] = flat.reshape(k_steps, b_local)
        m = np.zeros((k_steps * b_local,), bool)
        m[: real[d]] = True
        mask[:, d, :] = m.reshape(k_steps, b_local)
    return idx.reshape(k_steps, p * b_local), mask.reshape(
        k_steps, p * b_local)


def fits_in_hbm(num_clips: int, t: int, n: int, d: int,
                storage_dtype: str = "bfloat16",
                budget_bytes: int = 12 * 2 ** 30, t_out: int = 0,
                num_devices: int = 1) -> bool:
    """Conservative footprint check (leaves >=4 GB of a 16 GB v5e for
    params/activations/workspace at flagship scale). ``t_out`` adds the
    SSL target-feature rows; ``num_devices`` scales the budget for
    row-sharded caches (each device holds 1/p of the split)."""
    itemsize = 2 if storage_dtype == "bfloat16" else 4
    need = num_clips * (t + t_out) * n * d * itemsize
    return need <= budget_bytes * num_devices


def _materialize(dataset, pick, num_workers: int = 0, rows=None):
    """Featurize clips of ``dataset`` via ``pick(item) -> tuple``,
    optionally with a thread pool (h5py/numpy release the GIL for the
    bulk of the work; a serial dataset[i] loop at flagship scale costs
    avoidable minutes of startup — ADVICE r3). ``rows`` restricts the
    featurization to an explicit index list (multi-host row shards)."""
    idx = range(len(dataset)) if rows is None else rows
    if num_workers and num_workers > 1 and len(idx) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            out = list(pool.map(lambda i: pick(dataset[i]), idx))
    else:
        out = [pick(dataset[i]) for i in idx]
    return out


def _process_rows(n_clips: int, mesh):
    """Dataset rows THIS process featurizes for a row-sharded cache.

    Returns (rows, global_num_clips): ``rows`` is None single-process
    (featurize everything); multi-host it is this process's contiguous
    block of the PADDED global row space (pad rows repeat global row 0 —
    the same layout single-process padding produces, so
    ``mesh_epoch_plan``'s per-device blocks line up), mapped back to real
    dataset indices. SURVEY §7 "input pipeline at pod scale": featurize
    cost and host RAM scale 1/processes.
    """
    import jax

    if jax.process_count() == 1:
        return None, None
    p = mesh.shape["data"]
    n_pad = -(-n_clips // p) * p
    per = n_pad // jax.process_count()
    lo = jax.process_index() * per
    rows = [(i if i < n_clips else 0) for i in range(lo, lo + per)]
    return rows, n_clips


def build_detection_cache(dataset, seq_len: int,
                          storage_dtype: str = "float32",
                          scaler=None, num_workers: int = 0, mesh=None
                          ) -> DeviceDatasetCache:
    """Materialize a cache from a Dataset yielding reference-layout tuples.

    The dataset must be constructed with ``augmentation=False`` and
    ``standardize=False`` (both transforms run on device per step);
    asserting that here would require peeking internals, so callers own it
    (cli/train.py does).
    """
    sel, n_global = (None, None) if mesh is None else _process_rows(
        len(dataset), mesh)
    rows = _materialize(
        dataset,
        lambda item: (np.asarray(item[0], np.float32),
                      np.float32(item[1]), item[5]),
        num_workers, rows=sel)
    xs, ys, names = zip(*rows)
    return DeviceDatasetCache(np.stack(xs), np.asarray(ys), seq_len,
                              storage_dtype=storage_dtype, names=names,
                              mesh=mesh, global_num_clips=n_global)


def build_ssl_cache(dataset, input_len: int,
                    storage_dtype: str = "float32",
                    num_workers: int = 0, mesh=None) -> DeviceDatasetCache:
    """SSL pair cache: x feats in ``x``, next-window target feats in the
    ``y`` slot. Dataset must be built with ``augmentation=False``,
    ``standardize=False`` (the joint augment + z-score run on device,
    ``DevicePipeline.ssl_features``). Ref hot loop being replaced:
    dataloader_ssl.py:282-361."""
    sel, n_global = (None, None) if mesh is None else _process_rows(
        len(dataset), mesh)
    rows = _materialize(
        dataset,
        lambda item: (np.asarray(item[0], np.float32),
                      np.asarray(item[1], np.float32), item[5]),
        num_workers, rows=sel)
    xs, ys, names = zip(*rows)
    return DeviceDatasetCache(np.stack(xs), np.stack(ys), input_len,
                              storage_dtype=storage_dtype, names=names,
                              mesh=mesh, global_num_clips=n_global)


def build_classification_cache(dataset, seq_len: int,
                               storage_dtype: str = "float32",
                               num_workers: int = 0, mesh=None
                               ) -> DeviceDatasetCache:
    """Classification cache: PADDED feats + int labels + true lengths.

    The un-augmented clip is padded with zeros here; the device tail
    re-pins the padding after augment+standardize
    (``DevicePipeline.classification_features``), reproducing the host
    order pad(standardize(augment(clip))). Combined graph only."""
    sel, n_global = (None, None) if mesh is None else _process_rows(
        len(dataset), mesh)
    rows = _materialize(
        dataset,
        lambda item: (np.asarray(item[0], np.float32),
                      np.int32(item[1]), np.int32(item[2]), item[5]),
        num_workers, rows=sel)
    xs, ys, lens, names = zip(*rows)
    return DeviceDatasetCache(np.stack(xs), np.asarray(ys, np.float32),
                              seq_len, storage_dtype=storage_dtype,
                              names=names,
                              seq_lengths=np.asarray(lens, np.int32),
                              mesh=mesh, global_num_clips=n_global)


def shard_cache(cache: DeviceDatasetCache, mesh) -> DeviceDatasetCache:
    """Re-place a cache row-sharded over the mesh's ``data`` axis.

    Rows are padded (repeating row 0; never indexed by
    :meth:`mesh_epoch_plan`'s masks) to a multiple of the axis size, then
    each array is ``device_put`` with a ``P('data', ...)`` sharding — one
    bulk transfer per device, per-device HBM = 1/p of the split.

    Caches built with ``mesh=`` are already sharded at upload (no single
    device ever held the full split) and pass through unchanged.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if getattr(cache, "mesh", None) is not None:
        return cache
    p = mesh.shape["data"]
    n = cache.num_clips
    n_pad = -(-n // p) * p

    def pad_rows(a):
        if a is None or n_pad == n:
            return a
        reps = jnp.repeat(a[:1], n_pad - n, axis=0)
        return jnp.concatenate([a, reps], axis=0)

    def put(a):
        if a is None:
            return None
        spec = P(*(("data",) + (None,) * (a.ndim - 1)))
        return jax.device_put(pad_rows(a), NamedSharding(mesh, spec))

    cache.x = put(cache.x)
    cache.y = put(cache.y)
    cache.seq = put(cache.seq)
    return cache
