"""Map-style datasets for the three tasks + loader factories.

Parity targets: ``data/dataloader_detection.py`` (SeizureDataset +
load_dataset_detection), ``data/dataloader_classification.py``,
``data/dataloader_ssl.py``. Same sample tuple layout
``(x, y, seq_len, supports, adj, writeout_fn)``, same marker parsing,
augmentation, standardization, and per-sample support computation.

TPU-native divergence: instead of 8 torch worker processes, batches are
assembled by a lightweight threaded prefetcher (``data/loader.py``) and the
heavy featurization/graph math can run on device
(``ops/fft_features.featurize_clip``, ``graphs/xcorr.correlation_adjacency_jnp``)
— the host path here remains the numerically-exact reference oracle and the
default for parity runs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from eeg_gnn_tpu.constants import INCLUDED_CHANNELS
from eeg_gnn_tpu.data import clips as clip_ops
from eeg_gnn_tpu.data.augment import random_reflect, random_scale
from eeg_gnn_tpu.data.markers import (
    parse_classification_markers,
    parse_detection_markers,
    parse_ssl_markers,
)
from eeg_gnn_tpu.data.scaler import StandardScaler
from eeg_gnn_tpu.data.loader import DataLoader
from eeg_gnn_tpu.graphs import (
    compute_supports,
    correlation_adjacency,
    load_distance_adjacency,
    swap_adjacency_nodes,
)


def _find_edf_files(raw_data_dir: str):
    edf_files = []
    for path, _, files in os.walk(raw_data_dir):
        for name in files:
            if ".edf" in name:
                edf_files.append(os.path.join(path, name))
    return edf_files


class _BaseEEGDataset:
    """Shared machinery: augmentation, standardization, graph/supports."""

    def __init__(self, input_dir, raw_data_dir, time_step_size, max_seq_len,
                 standardize, scaler, split, data_augment, adj_mat_dir,
                 graph_type, top_k, filter_type, use_fft, preproc_dir,
                 rng_seed=None):
        if standardize and scaler is None:
            raise ValueError("To standardize, please provide scaler.")
        if graph_type == "individual" and top_k is None:
            raise ValueError("Please specify top_k for individual graph.")
        self.input_dir = input_dir
        self.raw_data_dir = raw_data_dir
        self.time_step_size = time_step_size
        self.max_seq_len = max_seq_len
        self.standardize = standardize
        self.scaler = scaler
        self.split = split
        self.data_augment = data_augment
        self.adj_mat_dir = adj_mat_dir
        self.graph_type = graph_type
        self.top_k = top_k
        self.filter_type = filter_type
        self.use_fft = use_fft
        self.preproc_dir = preproc_dir
        self.edf_files = _find_edf_files(raw_data_dir) if raw_data_dir else []
        # O(1) lookup index (marker entries carry the exact file name);
        # the reference substring-scans the whole list per sample
        # (dataloader_detection.py:364-369) — O(files) per __getitem__
        self._edf_index = {}
        for f in self.edf_files:
            self._edf_index.setdefault(os.path.basename(f), []).append(f)
        self.sensor_ids = [x.split(" ")[-1] for x in INCLUDED_CHANNELS]
        # Unlike the reference (which relies on np.random global state in
        # worker processes), augmentation randomness is an explicit stream.
        self.rng = np.random.RandomState(rng_seed)

    def _lookup_edf(self, edf_name: str) -> str:
        hits = self._edf_index.get(os.path.basename(edf_name), ())
        if len(hits) == 1:
            return hits[0]
        # fall back to the reference's substring semantics (and its
        # uniqueness assert) for marker entries that aren't exact names
        matches = [f for f in self.edf_files if edf_name in f]
        assert len(matches) == 1, f"edf lookup for {edf_name}: {len(matches)} matches"
        return matches[0]

    def _augment(self, eeg_clip):
        if self.data_augment:
            feat, swap_nodes = random_reflect(eeg_clip, self.rng)
            feat = random_scale(feat, self.rng, self.use_fft)
        else:
            swap_nodes = None
            feat = eeg_clip.copy()
        return feat, swap_nodes

    def _graph_and_supports(self, eeg_clip, swap_nodes):
        """Per-sample adjacency + dense support matrices.

        Parity: the ``__getitem__`` tails (dataloader_detection.py:402-414).
        Correlation graphs are built from the UN-augmented clip and ignore
        swap_nodes (reference dead-code quirk, see graphs/xcorr.py).
        """
        if self.graph_type == "individual":
            adj = correlation_adjacency(eeg_clip, top_k=self.top_k,
                                        swap_nodes=swap_nodes)
            sups = compute_supports(adj, self.filter_type)
            if any(np.any(np.isnan(s)) for s in sups):
                raise ValueError("Nan found in indiv_supports!")
        elif self.adj_mat_dir is not None:
            adj = swap_adjacency_nodes(
                load_distance_adjacency(self.adj_mat_dir), swap_nodes
            )
            sups = compute_supports(adj, self.filter_type)
        else:
            adj, sups = [], []
        return sups, adj

    def _standardize(self, feat):
        return self.scaler.transform(feat) if self.standardize else feat


class DetectionDataset(_BaseEEGDataset):
    """Binary seizure-detection clips, train split class-balanced.

    Parity: ``data/dataloader_detection.py:130-416``.
    """

    def __init__(self, *, marker_dir, sampling_ratio=1, seed=123, **kw):
        super().__init__(**kw)
        seizure_file = os.path.join(
            marker_dir, f"{self.split}Set_seq2seq_{self.max_seq_len}s_sz.txt")
        nonseizure_file = os.path.join(
            marker_dir, f"{self.split}Set_seq2seq_{self.max_seq_len}s_nosz.txt")
        self.file_tuples = parse_detection_markers(
            self.split, seizure_file, nonseizure_file, cv_seed=seed,
            scale_ratio=sampling_ratio)
        self._targets = [0 if t[-1] == 0 else 1 for t in self.file_tuples]

    def __len__(self):
        return len(self.file_tuples)

    def targets(self):
        return self._targets

    def __getitem__(self, idx):
        h5_fn, seizure_label = self.file_tuples[idx]
        clip_idx = int(h5_fn.split("_")[-1].split(".h5")[0])

        if self.preproc_dir is None:
            edf_file = self._lookup_edf(h5_fn.split(".edf")[0] + ".edf")
            h5_path = os.path.join(self.input_dir, h5_fn.split(".edf")[0] + ".h5")
            eeg_clip, _ = clip_ops.slice_detection_clip(
                h5_path, edf_file, clip_idx, self.time_step_size,
                self.max_seq_len, self.use_fft)
        else:
            import h5py

            with h5py.File(os.path.join(self.preproc_dir, h5_fn), "r") as hf:
                eeg_clip = hf["clip"][()]

        feat, swap_nodes = self._augment(eeg_clip)
        feat = self._standardize(feat)
        sups, adj = self._graph_and_supports(eeg_clip, swap_nodes)
        return (
            feat.astype(np.float32),
            np.float32(seizure_label),
            np.int32(self.max_seq_len),
            sups,
            adj,
            h5_fn.split(".h5")[0],
        )


class RawDetectionDataset(DetectionDataset):
    """Detection clips in RAW form for the fused on-device pipeline: the
    host only reads + slices the signal; FFT/augment/standardize/graphs run
    inside the jitted train step (data/device_pipeline.py)."""

    def __getitem__(self, idx):
        h5_fn, seizure_label = self.file_tuples[idx]
        clip_idx = int(h5_fn.split("_")[-1].split(".h5")[0])
        h5_path = os.path.join(self.input_dir, h5_fn.split(".edf")[0] + ".h5")
        raw = clip_ops.slice_raw_clip(h5_path, clip_idx, self.max_seq_len)
        return (
            raw.astype(np.float32),  # (C, clip_len*FREQUENCY)
            np.float32(seizure_label),
            np.int32(self.max_seq_len),
            [],
            [],
            h5_fn.split(".h5")[0],
        )


class ClassificationDataset(_BaseEEGDataset):
    """4-class seizure-type clips, variable length, zero padded.

    Parity: ``data/dataloader_classification.py:90-368``.
    """

    def __init__(self, *, marker_dir, padding_val=0.0, **kw):
        super().__init__(**kw)
        self.padding_val = padding_val
        self.file_tuples = parse_classification_markers(
            os.path.join(marker_dir, f"{self.split}Set_seizure_files.txt"))

    def __len__(self):
        return len(self.file_tuples)

    def __getitem__(self, idx):
        edf_fn, seizure_class, seizure_idx = self.file_tuples[idx]

        if self.preproc_dir is None:
            edf_file = self._lookup_edf(edf_fn)
            h5_path = os.path.join(self.input_dir, edf_fn.split(".edf")[0] + ".h5")
            eeg_clip = clip_ops.slice_classification_clip(
                h5_path, edf_file, seizure_idx, self.time_step_size,
                self.max_seq_len, self.use_fft)
        else:
            import h5py

            path = os.path.join(self.preproc_dir, f"{edf_fn}_{seizure_idx}.h5")
            with h5py.File(path, "r") as hf:
                eeg_clip = hf["clip"][()]

        feat, swap_nodes = self._augment(eeg_clip)
        feat = self._standardize(feat)
        padded, seq_len = clip_ops.pad_clip(feat, self.max_seq_len, self.padding_val)
        if np.any(np.isnan(padded)):
            raise ValueError("Nan found in x!")
        sups, adj = self._graph_and_supports(eeg_clip, swap_nodes)
        return (
            padded.astype(np.float32),
            np.int32(seizure_class),
            np.int32(seq_len),
            sups,
            adj,
            f"{edf_fn}_{seizure_idx}",
        )


class SSLDataset(_BaseEEGDataset):
    """Consecutive-clip pairs for next-window prediction.

    Parity: ``data/dataloader_ssl.py:85-361`` — y is the first
    ``output_len`` windows of the next clip; reflection decision and scale
    factor are shared between x and y; the correlation graph comes from x.
    """

    def __init__(self, *, marker_dir, input_len, output_len, **kw):
        kw["max_seq_len"] = input_len
        super().__init__(**kw)
        self.input_len = input_len
        self.output_len = output_len
        self.file_tuples = parse_ssl_markers(
            os.path.join(marker_dir, f"{self.split}Set_seq2seq_{input_len}s.txt"))

    def __len__(self):
        return len(self.file_tuples)

    def __getitem__(self, idx):
        h5_fn_x, h5_fn_y = self.file_tuples[idx]
        clip_idx_x = int(h5_fn_x.split("_")[-1].split(".h5")[0])
        clip_idx_y = int(h5_fn_y.split("_")[-1].split(".h5")[0])

        if self.preproc_dir is None:
            h5_path = os.path.join(self.input_dir, h5_fn_x.split(".edf")[0] + ".h5")
            eeg_clip_x = clip_ops.slice_ssl_clip(
                h5_path, clip_idx_x, self.time_step_size, self.input_len,
                self.use_fft)
            eeg_clip_y = clip_ops.slice_ssl_clip(
                h5_path, clip_idx_y, self.time_step_size, self.input_len,
                self.use_fft)
        else:
            import h5py

            with h5py.File(os.path.join(self.preproc_dir, h5_fn_x), "r") as hf:
                eeg_clip_x = hf["clip"][()]
            with h5py.File(os.path.join(self.preproc_dir, h5_fn_y), "r") as hf:
                eeg_clip_y = hf["clip"][()]

        if self.data_augment:
            reflect = bool(self.rng.choice([True, False]))
            x_feat, swap_nodes = random_reflect(eeg_clip_x, self.rng, reflect)
            y_feat, _ = random_reflect(eeg_clip_y, self.rng, reflect)
            scale = self.rng.uniform(0.8, 1.2)
            x_feat = random_scale(x_feat, self.rng, self.use_fft, scale)
            y_feat = random_scale(y_feat, self.rng, self.use_fft, scale)
        else:
            swap_nodes = None
            x_feat, y_feat = eeg_clip_x.copy(), eeg_clip_y.copy()

        x_feat = self._standardize(x_feat)
        y_feat = self._standardize(y_feat)

        assert x_feat.shape[0] == self.input_len
        sups, adj = self._graph_and_supports(eeg_clip_x, swap_nodes)
        return (
            x_feat.astype(np.float32),
            y_feat[: self.output_len].astype(np.float32),
            np.int32(self.input_len),
            sups,
            adj,
            h5_fn_x.split(".h5")[0],
        )


class DenseCNNClassificationDataset(_BaseEEGDataset):
    """Flat (time, channels) clips for the Dense-CNN baseline.

    Parity: ``data/dataloader_densecnn_classification.py:27-226``: the whole
    variable-length seizure clip is FFT'd at once (n = clip length), padded
    with zeros to ``clip_len*FREQUENCY/2`` bins, transposed to
    (time, 19). No graphs. The reference's non-FFT branch references an
    undefined variable (``:76``) so only the FFT path exists in practice.
    """

    def __init__(self, *, marker_dir, **kw):
        super().__init__(**kw)
        self.file_tuples = parse_classification_markers(
            os.path.join(marker_dir, f"{self.split}Set_seizure_files.txt"))

    def __len__(self):
        return len(self.file_tuples)

    def _slice(self, edf_fn, seizure_idx):
        from eeg_gnn_tpu.constants import FREQUENCY
        from eeg_gnn_tpu.data.clips import get_seizure_times, read_resampled_h5
        from eeg_gnn_tpu.ops.fft_features import log_amplitude_fft_np

        edf_file = self._lookup_edf(edf_fn)
        h5_path = os.path.join(self.input_dir, edf_fn.split(".edf")[0] + ".h5")
        signal = read_resampled_h5(h5_path)
        times = get_seizure_times(edf_file.split(".edf")[0])
        cur = times[seizure_idx]
        pre_end = int(FREQUENCY * times[seizure_idx - 1][1]) if seizure_idx > 0 else 0
        start_t = max(pre_end + 1, int(FREQUENCY * (cur[0] - 2)))
        end_t = min(start_t + int(FREQUENCY * self.max_seq_len),
                    int(FREQUENCY * cur[1]))
        clip = signal[:, start_t:end_t]
        eeg_clip = log_amplitude_fft_np(clip, n=clip.shape[-1])
        seq_len = eeg_clip.shape[-1]
        diff = int(FREQUENCY * self.max_seq_len / 2) - eeg_clip.shape[-1]
        if diff > 0:
            eeg_clip = np.concatenate(
                [eeg_clip, np.zeros((eeg_clip.shape[0], diff))], axis=1)
        return eeg_clip.T, seq_len  # (time, channels)

    def __getitem__(self, idx):
        edf_fn, seizure_class, seizure_idx = self.file_tuples[idx]
        if self.preproc_dir is not None:
            import h5py

            path = os.path.join(self.preproc_dir, f"{edf_fn}_{seizure_idx}.h5")
            with h5py.File(path, "r") as hf:
                eeg_clip = hf["clip"][()]
            seq_len = eeg_clip.shape[0]
        else:
            eeg_clip, seq_len = self._slice(edf_fn, seizure_idx)

        if self.data_augment:
            # reference reflects channel pairs on axis 1 of (time, ch)
            reflected = eeg_clip.copy()
            if self.rng.choice([True, False]):
                from eeg_gnn_tpu.constants import get_swap_pairs

                for a, b in get_swap_pairs():
                    reflected[:, [a, b]] = eeg_clip[:, [b, a]]
            eeg_clip = random_scale(reflected, self.rng, self.use_fft)
        if self.standardize:
            eeg_clip = self.scaler.transform(eeg_clip)
        return (
            eeg_clip.astype(np.float32),
            np.int32(seizure_class),
            np.int32(seq_len),
            [],
            [],
            f"{edf_fn}_{seizure_idx}",
        )


class RawSSLDataset(SSLDataset):
    """SSL clip pairs in RAW form for the fused on-device pipeline (x = full
    input clip, y = first output_len seconds of the next clip)."""

    def __getitem__(self, idx):
        from eeg_gnn_tpu.constants import FREQUENCY

        h5_fn_x, h5_fn_y = self.file_tuples[idx]
        clip_idx_x = int(h5_fn_x.split("_")[-1].split(".h5")[0])
        clip_idx_y = int(h5_fn_y.split("_")[-1].split(".h5")[0])
        h5_path = os.path.join(self.input_dir, h5_fn_x.split(".edf")[0] + ".h5")
        raw_x = clip_ops.slice_raw_clip(h5_path, clip_idx_x, self.input_len)
        raw_y_full = clip_ops.slice_raw_clip(h5_path, clip_idx_y, self.input_len)
        raw_y = raw_y_full[:, : self.output_len * FREQUENCY]
        return (
            raw_x.astype(np.float32),
            raw_y.astype(np.float32),
            np.int32(self.input_len),
            [],
            [],
            h5_fn_x.split(".h5")[0],
        )


# ---------------------------------------------------------------------------
# Loader factories (reference load_dataset_* parity)
# ---------------------------------------------------------------------------


def _make_loaders(dataset_fn, train_batch_size, test_batch_size, num_workers,
                  build_loaders=True):
    # Multi-host: each process materializes only its slice of every global
    # batch (identical seeded shuffles across processes make this a true
    # partition; see parallel/distributed.py).
    # ``build_loaders=False`` returns only the datasets — HBM-cache
    # materialization (cli/train.py) reads datasets directly and would
    # otherwise construct DataLoaders that are immediately discarded.
    from eeg_gnn_tpu.parallel.distributed import process_shard

    shard = process_shard()
    dataloaders, datasets = {}, {}
    for split in ["train", "dev", "test"]:
        ds = dataset_fn(split)
        datasets[split] = ds
        if not build_loaders:
            continue
        is_train = split == "train"
        dataloaders[split] = DataLoader(
            ds,
            batch_size=train_batch_size if is_train else test_batch_size,
            shuffle=is_train,
            num_workers=num_workers,
            process_shard=shard,
        )
    return dataloaders, datasets


def _load_scaler(marker_dir: str, prefix: str, max_seq_len: int,
                 suffix: str) -> StandardScaler:
    means = os.path.join(marker_dir, f"means_{prefix}{max_seq_len}s{suffix}.pkl")
    stds = os.path.join(marker_dir, f"stds_{prefix}{max_seq_len}s{suffix}.pkl")
    return StandardScaler.from_pickles(means, stds)


def load_dataset_detection(input_dir, raw_data_dir, train_batch_size,
                           test_batch_size=None, time_step_size=1,
                           max_seq_len=60, standardize=True, num_workers=8,
                           augmentation=False, adj_mat_dir=None,
                           graph_type=None, top_k=None,
                           filter_type="laplacian", use_fft=False,
                           sampling_ratio=1, seed=123, preproc_dir=None,
                           marker_dir=None, raw_mode=False, build_loaders=True):
    """Parity: ``load_dataset_detection`` (dataloader_detection.py:419-525).
    ``marker_dir`` points at the file-marker directory (the reference
    hard-codes its repo-relative path). ``raw_mode`` emits raw clips for the
    fused on-device pipeline."""
    if graph_type is not None and graph_type not in ["individual", "combined"]:
        raise NotImplementedError
    scaler = (
        _load_scaler(marker_dir, "seq2seq_fft_", max_seq_len, "_szdetect_single")
        if standardize else None
    )
    cls = RawDetectionDataset if raw_mode else DetectionDataset

    def make(split):
        return cls(
            marker_dir=marker_dir, sampling_ratio=sampling_ratio, seed=seed,
            input_dir=input_dir, raw_data_dir=raw_data_dir,
            time_step_size=time_step_size, max_seq_len=max_seq_len,
            standardize=standardize, scaler=scaler, split=split,
            data_augment=augmentation if split == "train" else False,
            adj_mat_dir=adj_mat_dir, graph_type=graph_type, top_k=top_k,
            filter_type=filter_type, use_fft=use_fft, preproc_dir=preproc_dir,
            rng_seed=seed,
        )

    loaders, datasets = _make_loaders(make, train_batch_size, test_batch_size,
                                      num_workers, build_loaders)
    return loaders, datasets, scaler


def load_dataset_classification(input_dir, raw_data_dir, train_batch_size,
                                test_batch_size=None, time_step_size=1,
                                max_seq_len=60, standardize=True,
                                num_workers=8, padding_val=0.0,
                                augmentation=False, adj_mat_dir=None,
                                graph_type="combined", top_k=None,
                                filter_type="laplacian", use_fft=False,
                                preproc_dir=None, marker_dir=None, build_loaders=True):
    """Parity: ``load_dataset_classification``
    (dataloader_classification.py:372-469)."""
    if graph_type is not None and graph_type not in ["individual", "combined"]:
        raise NotImplementedError
    scaler = (
        _load_scaler(marker_dir, "fft_", max_seq_len, "_single")
        if standardize else None
    )

    def make(split):
        return ClassificationDataset(
            marker_dir=marker_dir, padding_val=padding_val,
            input_dir=input_dir, raw_data_dir=raw_data_dir,
            time_step_size=time_step_size, max_seq_len=max_seq_len,
            standardize=standardize, scaler=scaler, split=split,
            data_augment=augmentation if split == "train" else False,
            adj_mat_dir=adj_mat_dir, graph_type=graph_type, top_k=top_k,
            filter_type=filter_type, use_fft=use_fft, preproc_dir=preproc_dir,
        )

    loaders, datasets = _make_loaders(make, train_batch_size, test_batch_size,
                                      num_workers, build_loaders)
    return loaders, datasets, scaler


def load_dataset_densecnn_classification(input_dir, raw_data_dir,
                                         train_batch_size,
                                         test_batch_size=None, max_seq_len=60,
                                         standardize=True, num_workers=8,
                                         padding_val=0.0, augmentation=False,
                                         use_fft=True, preproc_dir=None,
                                         marker_dir=None):
    """Parity: ``load_dataset_densecnn_classification``
    (dataloader_densecnn_classification.py:228-307)."""
    scaler = (
        _load_scaler(marker_dir, "fft_", max_seq_len, "_single")
        if standardize else None
    )

    def make(split):
        return DenseCNNClassificationDataset(
            marker_dir=marker_dir, input_dir=input_dir,
            raw_data_dir=raw_data_dir, time_step_size=1,
            max_seq_len=max_seq_len, standardize=standardize, scaler=scaler,
            split=split,
            data_augment=augmentation if split == "train" else False,
            adj_mat_dir=None, graph_type=None, top_k=None,
            filter_type="laplacian", use_fft=use_fft, preproc_dir=preproc_dir,
        )

    loaders, datasets = _make_loaders(make, train_batch_size, test_batch_size,
                                      num_workers)
    return loaders, datasets, scaler


def load_dataset_ssl(input_dir, raw_data_dir, train_batch_size,
                     test_batch_size, time_step_size=1, input_len=60,
                     output_len=12, standardize=True, num_workers=8,
                     augmentation=False, adj_mat_dir=None, graph_type=None,
                     top_k=None, filter_type="laplacian", use_fft=False,
                     preproc_dir=None, marker_dir=None, raw_mode=False,
                     build_loaders=True):
    """Parity: ``load_dataset_ssl`` (dataloader_ssl.py:364-461)."""
    if graph_type is not None and graph_type not in ["individual", "combined"]:
        raise NotImplementedError
    scaler = (
        _load_scaler(marker_dir, "seq2seq_fft_", input_len, "_single")
        if standardize else None
    )
    cls = RawSSLDataset if raw_mode else SSLDataset

    def make(split):
        return cls(
            marker_dir=marker_dir, input_len=input_len, output_len=output_len,
            input_dir=input_dir, raw_data_dir=raw_data_dir,
            time_step_size=time_step_size, max_seq_len=input_len,
            standardize=standardize, scaler=scaler, split=split,
            data_augment=augmentation if split == "train" else False,
            adj_mat_dir=adj_mat_dir, graph_type=graph_type, top_k=top_k,
            filter_type=filter_type, use_fft=use_fft, preproc_dir=preproc_dir,
        )

    loaders, datasets = _make_loaders(make, train_batch_size, test_batch_size,
                                      num_workers, build_loaders)
    return loaders, datasets, scaler
