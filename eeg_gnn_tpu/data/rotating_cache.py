"""Beyond-HBM rotating dataset cache: chunked, double-buffered HBM shards.

When a featurized split exceeds the HBM budget, the round-3 framework
silently fell back to the streaming loader — measured at ~1% of the
step-only ceiling on remote-accelerator hosts (benchmarks/
e2e_pipeline_results.json). This replaces that cliff (VERDICT r3 missing
#4): the split lives on HOST in storage dtype, cut into K equal fixed-
shape shards; the DEVICE holds at most two shards — the one being trained
on and the next one PREFETCHING via an asynchronous ``device_put`` that
overlaps the H2D transfer with the training steps of the current shard.

    epoch = permutation over shards x in-shard permutations

Each shard's steps reuse the same compiled cached-step program as the
fits-in-HBM path (train/step.py:make_cached_train_step — fixed shard
shape, fixed batch shape), so the steady-state cost model is

    throughput = min(step-only ceiling, link_bandwidth / bytes_per_clip)

i.e. the chip is busy whenever the link can feed it; on a link-bound host
the rotation pays the link roofline and nothing more (the double buffer
hides the latency, not the bandwidth). ``benchmarks/rotating_cache_bench.py``
measures achieved/roofline on the target host.

DIVERGENCE (documented): shard-local shuffling, not the reference's global
shuffle (dataloader_detection.py:356-416) — the standard large-dataset
loader semantics (every clip visited exactly once per epoch; shard order
and in-shard order both reshuffle each epoch).

With a mesh (round 5; kills ``train/trainer.py``'s former
NotImplementedError for beyond-HBM splits on multi-device runs), each
slab is ROW-SHARDED over the data axis at upload: ``budget_bytes``
stays the PER-DEVICE budget, shards carry p-times more rows, and the
per-slab step plans come from :meth:`RotatingDeviceCache.mesh_shard_plan`
(same contract as the resident mesh cache). Single-controller only —
multi-host beyond-HBM falls back to the streaming loader
(cli/train.py). Supervised + SSL payloads like
:class:`~eeg_gnn_tpu.data.device_cache.DeviceDatasetCache`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def rotating_geometry(num_clips: int, clip_bytes: int, budget_bytes: int,
                      p: int = 1, min_shards: int = 2):
    """(num_shards, shard_rows) for a rotating cache: shards sized so
    THREE fit the per-device budget, rows rounded to a multiple of the
    data-axis size ``p`` (equal per-device blocks). Shared by the cache
    itself and the multi-host builder (which must know the shard layout
    BEFORE featurizing its row stripes)."""
    max_rows = max(1, budget_bytes // (3 * clip_bytes)) * p
    num_shards = max(min_shards, -(-num_clips // max_rows))
    base_rows = -(-num_clips // num_shards)
    return num_shards, -(-base_rows // p) * p


class RotatingDeviceCache:
    """Host-resident featurized split served as rotating fixed-shape HBM
    shards with double-buffered prefetch.

    Args:
        feats: (num_clips, T, N, D) un-augmented, un-standardized features.
        labels: (num_clips,) labels or (num_clips, T_out, N, D) SSL
            target features.
        seq_len: constant ``seq_lengths`` value.
        storage_dtype: host + device storage dtype ('bfloat16' halves both
            the footprint and the per-rotation upload).
        budget_bytes: device HBM budget for cache slabs. The shard size
            is chosen so THREE shards fit inside it (live + prefetch +
            the transiently-still-referenced previous slab).
        seq_lengths: optional (num_clips,) int32 true lengths
            (classification).
        min_shards: lower bound on the shard count (benchmarks force >1 to
            exercise rotation on hosts where the split would fit).
    """

    def __init__(self, feats: np.ndarray, labels: np.ndarray, seq_len: int,
                 storage_dtype: str = "float32",
                 budget_bytes: int = 12 * 2 ** 30, names=None,
                 seq_lengths: Optional[np.ndarray] = None,
                 min_shards: int = 2, mesh=None,
                 global_num_clips: Optional[int] = None):
        import jax.numpy as jnp

        self._np_dtype = (np.dtype("bfloat16")
                          if storage_dtype == "bfloat16" and
                          hasattr(np, "bfloat16") else None)
        # ml_dtypes provides a numpy bfloat16; fall back to float16-width
        # via jnp cast at upload when unavailable
        if storage_dtype == "bfloat16":
            try:
                import ml_dtypes

                self._np_dtype = np.dtype(ml_dtypes.bfloat16)
            except Exception:  # pragma: no cover
                self._np_dtype = None
        self.storage_dtype = storage_dtype
        self._jnp_dtype = (jnp.bfloat16 if storage_dtype == "bfloat16"
                           else jnp.float32)

        feats = np.asarray(feats)
        if self._np_dtype is not None:
            feats = feats.astype(self._np_dtype)
        else:
            feats = feats.astype(np.float32)
        labels = np.asarray(labels, np.float32)
        self._x = feats
        self._y = (labels if labels.ndim == 1 else
                   (labels.astype(self._np_dtype)
                    if self._np_dtype is not None else labels))
        self._seq = (None if seq_lengths is None
                     else np.asarray(seq_lengths, np.int32))
        # multi-host STRIPE mode (``global_num_clips`` set): ``feats``
        # holds only THIS process's per-shard row stripes, laid out
        # shard-major — stripe s occupies local rows
        # [s*rows_pp, (s+1)*rows_pp) with rows_pp = shard_rows/n_procs;
        # the builder materializes exactly those rows (incl. the padded
        # shard tail, which the plans mask out of the loss).
        self._stripes = global_num_clips is not None
        self.num_clips = (int(global_num_clips) if self._stripes
                          else int(feats.shape[0]))
        self.seq_len = int(seq_len)
        self.names = (list(names) if names is not None
                      else [str(i) for i in range(feats.shape[0])])
        self._labels_host = labels if labels.ndim == 1 else None

        clip_bytes = int(np.prod(feats.shape[1:])) * feats.dtype.itemsize
        if labels.ndim > 1:
            clip_bytes += int(np.prod(labels.shape[1:])) * self._y.dtype.itemsize
        # size shards for THREE resident slabs, not two: during rotation
        # the just-finished slab may still be referenced by in-flight
        # computation while the live slab trains and the next one
        # prefetches — a transient third allocation that would overflow a
        # budget sized for the steady-state pair.
        # With a mesh, slabs are ROW-SHARDED over the data axis:
        # budget_bytes stays per-device, so each shard holds p times more
        # rows (and shard_rows rounds to a multiple of p so every device
        # gets an equal block).
        self.mesh = mesh
        p = 1 if mesh is None else mesh.shape["data"]
        self.num_shards, self.shard_rows = rotating_geometry(
            self.num_clips, clip_bytes, budget_bytes, p, min_shards)
        self.clip_bytes = clip_bytes
        if self._stripes:
            import jax

            self._rows_pp = self.shard_rows // jax.process_count()
            if feats.shape[0] != self.num_shards * self._rows_pp:
                raise ValueError(
                    f"stripe rows {feats.shape[0]} != shards "
                    f"{self.num_shards} x rows/process {self._rows_pp}")

    # -- host-side plan ----------------------------------------------------

    def shard_real_rows(self, shard: int) -> int:
        lo = shard * self.shard_rows
        return max(0, min(self.shard_rows, self.num_clips - lo))

    def epoch_shard_order(self, rng: np.random.RandomState,
                          shuffle: bool = True) -> np.ndarray:
        order = np.arange(self.num_shards)
        if shuffle:
            rng.shuffle(order)
        return order

    def shard_plan(self, shard: int, batch_size: int, shuffle: bool,
                   rng: np.random.RandomState):
        """(perm (K*B,) int32 LOCAL rows, valid (K,) int32) for one shard —
        same contract as ``DeviceDatasetCache.epoch_plan``."""
        real = self.shard_real_rows(shard)
        order = np.arange(real, dtype=np.int32)
        if shuffle:
            rng.shuffle(order)
        k = -(-real // batch_size)
        perm = np.full((k * batch_size,), order[0] if real else 0, np.int32)
        perm[:real] = order
        valid = np.full((k,), batch_size, np.int32)
        if real % batch_size:
            valid[-1] = real % batch_size
        return perm, valid

    # -- device-side slabs -------------------------------------------------

    def prefetch(self, shard: int):
        """Begin the (asynchronous) H2D upload of one shard; returns the
        slab dict the cached step consumes. ``jax.device_put`` enqueues the
        transfer without blocking, so calling this BEFORE training on the
        previous shard overlaps the upload with compute (double buffer:
        at most this slab + the live slab are resident)."""
        import jax
        import jax.numpy as jnp

        if self._stripes:
            # multi-host: each process contributes its stripe of the
            # row-sharded slab (no cross-host data movement)
            from jax.sharding import NamedSharding, PartitionSpec as P

            lo = shard * self._rows_pp
            hi = lo + self._rows_pp

            def up(a, dt=None):
                if a is None:
                    return None
                spec = NamedSharding(
                    self.mesh, P(*(("data",) + (None,) * (a.ndim - 1))))
                out = jax.make_array_from_process_local_data(spec, a[lo:hi])
                return (out.astype(dt) if dt is not None
                        and out.dtype != dt else out)

            return {
                "x": up(self._x, self._jnp_dtype),
                "y": up(self._y,
                        self._jnp_dtype if self._y.ndim > 1
                        else jnp.float32),
                "seq": up(self._seq),
            }

        lo = shard * self.shard_rows
        hi = min(lo + self.shard_rows, self.num_clips)
        pad = self.shard_rows - (hi - lo)

        def up(a, dt=None):
            if a is None:
                return None
            block = a[lo:hi]
            if pad:
                block = np.concatenate(
                    [block, np.repeat(block[:1], pad, axis=0)], axis=0)
            if self.mesh is not None:
                # row-sharded slab: each device receives 1/p of the shard
                # in one (still asynchronous) sharded transfer
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = NamedSharding(
                    self.mesh,
                    P(*(("data",) + (None,) * (block.ndim - 1))))
                out = jax.device_put(block, spec)
            else:
                out = jax.device_put(block)
            return out.astype(dt) if dt is not None and out.dtype != dt else out

        return {
            "x": up(self._x, self._jnp_dtype),
            "y": up(self._y,
                    self._jnp_dtype if self._y.ndim > 1 else jnp.float32),
            "seq": up(self._seq),
        }

    def mesh_shard_plan(self, shard: int, batch_size: int, shuffle: bool,
                        rng: np.random.RandomState):
        """Per-device (idx_mat (K, B), mask_mat (K, B)) plan for one
        ROW-SHARDED slab — local indices within each device's
        shard_rows/p block, same contract as
        ``DeviceDatasetCache.mesh_epoch_plan`` (consumed by
        ``train/step.py:make_mesh_cached_train_step``)."""
        from eeg_gnn_tpu.data.device_cache import mesh_plan

        p = self.mesh.shape["data"]
        return mesh_plan(self.shard_real_rows(shard), self.shard_rows // p,
                         p, batch_size, shuffle, rng)

    def shard_labels(self, shard: int):
        lo = shard * self.shard_rows
        hi = min(lo + self.shard_rows, self.num_clips)
        return (None if self._labels_host is None
                else self._labels_host[lo:hi])

    def shard_names(self, shard: int):
        lo = shard * self.shard_rows
        hi = min(lo + self.shard_rows, self.num_clips)
        return self.names[lo:hi]

    def nbytes_resident(self) -> int:
        """Worst-case device bytes: three slabs (live + prefetch + the
        transiently-referenced previous one)."""
        return 3 * self.shard_rows * self.clip_bytes


def _stripe_rows(dataset, kind: str, storage_dtype: str,
                 budget_bytes: int, min_shards: int, mesh):
    """Multi-host: the dataset rows THIS process featurizes — its stripe
    of every shard's padded row block (pad rows map to dataset row 0;
    the per-slab plans mask them out of the loss). Returns
    (rows or None, global_num_clips or None). Requires the shard
    geometry up front, computed from a probe item's clip bytes with the
    same formula the cache itself uses (:func:`rotating_geometry`)."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return None, None
    n = len(dataset)
    probe = dataset[0]
    itemsize = 2 if storage_dtype == "bfloat16" else 4
    clip_bytes = int(np.prod(np.asarray(probe[0]).shape)) * itemsize
    if kind == "ssl":
        clip_bytes += int(np.prod(np.asarray(probe[1]).shape)) * itemsize
    p = mesh.shape["data"]
    num_shards, shard_rows = rotating_geometry(
        n, clip_bytes, budget_bytes, p, min_shards)
    rows_pp = shard_rows // jax.process_count()
    q = jax.process_index()
    rows = []
    for s in range(num_shards):
        lo = s * shard_rows + q * rows_pp
        rows.extend(i if i < n else 0 for i in range(lo, lo + rows_pp))
    return rows, n


def build_rotating_cache(dataset, seq_len: int, kind: str,
                         storage_dtype: str = "float32",
                         budget_bytes: int = 12 * 2 ** 30,
                         num_workers: int = 0,
                         min_shards: int = 2,
                         mesh=None) -> RotatingDeviceCache:
    """Materialize a rotating cache from a plain (un-augmented,
    un-standardized) dataset. ``kind``: 'detection' | 'ssl' |
    'classification' (same item layouts as the device_cache builders).
    Multi-host (mesh + >1 process): each process featurizes only its
    per-shard row stripes (:func:`_stripe_rows`)."""
    from eeg_gnn_tpu.data.device_cache import _materialize

    sel, n_global = _stripe_rows(dataset, kind, storage_dtype,
                                 budget_bytes, min_shards, mesh)
    common = dict(storage_dtype=storage_dtype, budget_bytes=budget_bytes,
                  min_shards=min_shards, mesh=mesh,
                  global_num_clips=n_global)
    if kind == "detection":
        rows = _materialize(
            dataset, lambda it: (np.asarray(it[0], np.float32),
                                 np.float32(it[1]), it[5]), num_workers,
            rows=sel)
        xs, ys, names = zip(*rows)
        return RotatingDeviceCache(
            np.stack(xs), np.asarray(ys), seq_len, names=names, **common)
    if kind == "ssl":
        rows = _materialize(
            dataset, lambda it: (np.asarray(it[0], np.float32),
                                 np.asarray(it[1], np.float32), it[5]),
            num_workers, rows=sel)
        xs, ys, names = zip(*rows)
        return RotatingDeviceCache(
            np.stack(xs), np.stack(ys), seq_len, names=names, **common)
    if kind == "classification":
        rows = _materialize(
            dataset, lambda it: (np.asarray(it[0], np.float32),
                                 np.int32(it[1]), np.int32(it[2]), it[5]),
            num_workers, rows=sel)
        xs, ys, lens, names = zip(*rows)
        return RotatingDeviceCache(
            np.stack(xs), np.asarray(ys, np.float32), seq_len,
            names=names, seq_lengths=np.asarray(lens, np.int32), **common)
    raise ValueError(f"unknown rotating-cache kind: {kind!r}")
