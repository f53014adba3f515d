"""Offline preprocessing CLIs.

Parity with the reference's three preprocessing entry points:

- ``resample``: EDF -> 200 Hz h5 (reference ``data/resample_signals.py``),
  using the pure-numpy EDF reader (no pyedflib).
- ``detection`` / ``classification`` / ``ssl``: ahead-of-time featurized
  clip caches consumed via ``--preproc_dir``
  (reference ``data/preprocess_detection.py`` / ``_classification.py``).

Usage:
    python -m eeg_gnn_tpu.cli.preprocess resample --raw_edf_dir D --save_dir S
    python -m eeg_gnn_tpu.cli.preprocess detection --resampled_dir R \
        --raw_data_dir D --marker_dir M --output_dir O --clip_len 60
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from eeg_gnn_tpu.constants import FREQUENCY, INCLUDED_CHANNELS


def _write_h5(path, signal):
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("resampled_signal", data=signal)
        f.create_dataset("resample_freq", data=FREQUENCY)


def resample_all(raw_edf_dir: str, save_dir: str) -> list:
    """Walk ``raw_edf_dir`` for .edf, reorder to INCLUDED_CHANNELS, resample
    to 200 Hz (FFT method, matching scipy.signal.resample semantics the
    reference uses, data_utils.py:158-170), write h5.

    Returns the list of failed files (reference resample_signals.py:49-52
    swallows per-file failures the same way).
    """
    from scipy.signal import resample

    from eeg_gnn_tpu.data.edf import (
        get_ordered_channels,
        read_edf_header,
        read_edf_signals,
    )

    os.makedirs(save_dir, exist_ok=True)
    edf_files = []
    for path, _, files in os.walk(raw_edf_dir):
        for name in files:
            if ".edf" in name:
                edf_files.append(os.path.join(path, name))

    failed_files = []
    for idx, edf_fn in enumerate(edf_files):
        new_file_name = os.path.basename(edf_fn).split(".edf")[0] + ".h5"
        save_path = os.path.join(save_dir, new_file_name)
        if os.path.exists(save_path):
            continue
        try:
            header = read_edf_header(edf_fn)
            ordered = get_ordered_channels(edf_fn, header.labels,
                                           INCLUDED_CHANNELS)
            signals = read_edf_signals(edf_fn, header)[ordered]
            freq = float(header.sample_frequencies()[ordered[0]])
            seconds = signals.shape[1] / freq
            resampled = resample(signals, num=int(FREQUENCY * seconds), axis=1)
            _write_h5(save_path, resampled)
        except Exception as e:
            print(f"{edf_fn} failed: {e}", file=sys.stderr)
            failed_files.append(edf_fn)
        if (idx + 1) % 50 == 0:
            print(f"resampled {idx + 1}/{len(edf_files)}")
    return failed_files


def _edf_lookup(raw_data_dir):
    files = []
    for path, _, names in os.walk(raw_data_dir):
        for n in names:
            if ".edf" in n:
                files.append(os.path.join(path, n))
    return files


def preprocess_detection(resampled_dir, raw_data_dir, marker_dir, output_dir,
                         clip_len, time_step_size=1, use_fft=True):
    """AOT cache of detection clips: one ``{clip}`` h5 per marker line
    (reference data/preprocess_detection.py:89-130)."""
    import h5py

    from eeg_gnn_tpu.data.clips import slice_detection_clip

    os.makedirs(output_dir, exist_ok=True)
    edf_files = _edf_lookup(raw_data_dir)
    for split in ("train", "dev", "test"):
        for kind in ("sz", "nosz"):
            marker = os.path.join(
                marker_dir, f"{split}Set_seq2seq_{clip_len}s_{kind}.txt")
            if not os.path.exists(marker):
                continue
            with open(marker) as f:
                lines = [ln.strip("\n").split(",") for ln in f.readlines()]
            for h5_fn, _ in lines:
                out = os.path.join(output_dir, h5_fn)
                if os.path.exists(out):
                    continue
                clip_idx = int(h5_fn.split("_")[-1].split(".h5")[0])
                edf = [f for f in edf_files
                       if h5_fn.split(".edf")[0] + ".edf" in f][0]
                h5_path = os.path.join(
                    resampled_dir, h5_fn.split(".edf")[0] + ".h5")
                clip, _ = slice_detection_clip(
                    h5_path, edf, clip_idx, time_step_size, clip_len, use_fft)
                with h5py.File(out, "w") as hf:
                    hf.create_dataset("clip", data=clip)
            print(f"cached {split}/{kind}: {len(lines)} clips")


def preprocess_classification(resampled_dir, raw_data_dir, marker_dir,
                              output_dir, clip_len, time_step_size=1,
                              use_fft=True):
    """AOT cache of classification clips
    (reference data/preprocess_classification.py:71-112)."""
    import h5py

    from eeg_gnn_tpu.data.clips import slice_classification_clip

    os.makedirs(output_dir, exist_ok=True)
    edf_files = _edf_lookup(raw_data_dir)
    for split in ("train", "dev", "test"):
        marker = os.path.join(marker_dir, f"{split}Set_seizure_files.txt")
        if not os.path.exists(marker):
            continue
        with open(marker) as f:
            rows = [ln.strip("\n").split(",") for ln in f.readlines()]
        for edf_fn, _, seizure_idx in rows:
            out = os.path.join(output_dir, f"{edf_fn}_{seizure_idx}.h5")
            if os.path.exists(out):
                continue
            edf = [f for f in edf_files if edf_fn in f][0]
            h5_path = os.path.join(
                resampled_dir, edf_fn.split(".edf")[0] + ".h5")
            clip = slice_classification_clip(
                h5_path, edf, int(seizure_idx), time_step_size, clip_len,
                use_fft)
            with h5py.File(out, "w") as hf:
                hf.create_dataset("clip", data=clip)
        print(f"cached {split}: {len(rows)} clips")


def preprocess_ssl(resampled_dir, marker_dir, output_dir, clip_len,
                   time_step_size=1, use_fft=True):
    """AOT cache of SSL clips: one ``{clip}`` h5 per unique clip named in
    the consecutive-pair markers ``{split}Set_seq2seq_{clip_len}s.txt``.

    The SSL loader consumes these via ``--preproc_dir`` exactly like the
    reference (``dataloader_ssl.py:312-315`` reads ``hf['clip']`` for both
    clips of the pair); the clip math is the SSL ``computeSliceMatrix``
    (``dataloader_ssl.py:24-82`` — fixed window, no label).
    """
    import h5py

    from eeg_gnn_tpu.data.clips import slice_ssl_clip
    from eeg_gnn_tpu.data.markers import parse_ssl_markers

    os.makedirs(output_dir, exist_ok=True)
    for split in ("train", "dev", "test"):
        marker = os.path.join(
            marker_dir, f"{split}Set_seq2seq_{clip_len}s.txt")
        if not os.path.exists(marker):
            continue
        clip_names = sorted({name for pair in parse_ssl_markers(marker)
                             for name in pair})
        for h5_fn in clip_names:
            out = os.path.join(output_dir, h5_fn)
            if os.path.exists(out):
                continue
            clip_idx = int(h5_fn.split("_")[-1].split(".h5")[0])
            h5_path = os.path.join(
                resampled_dir, h5_fn.split(".edf")[0] + ".h5")
            clip = slice_ssl_clip(h5_path, clip_idx, time_step_size,
                                  clip_len, use_fft)
            with h5py.File(out, "w") as hf:
                hf.create_dataset("clip", data=clip)
        print(f"cached {split}: {len(clip_names)} clips")


def main(argv=None):
    p = argparse.ArgumentParser("Offline preprocessing for eeg_gnn_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("resample")
    pr.add_argument("--raw_edf_dir", required=True)
    pr.add_argument("--save_dir", required=True)

    for name in ("detection", "classification", "ssl"):
        pc = sub.add_parser(name)
        pc.add_argument("--resampled_dir", required=True)
        if name != "ssl":  # SSL clips need no annotations, only markers
            pc.add_argument("--raw_data_dir", required=True)
        pc.add_argument("--marker_dir", required=True)
        pc.add_argument("--output_dir", required=True)
        pc.add_argument("--clip_len", type=int, default=60)
        pc.add_argument("--time_step_size", type=int, default=1)
        pc.add_argument("--no_fft", dest="use_fft", action="store_false",
                        default=True)

    # distance-graph regeneration: the counterpart of the reference notebook
    # data/electrode_graph/generate_adj_mx.ipynb (cell 4) that produced the
    # shipped adj_mx_3d.pkl — rebuild it from a from,to,distance CSV.
    pg = sub.add_parser("graph")
    pg.add_argument("--distances_csv", required=True,
                    help="3-D electrode pairwise distances (from,to,distance)")
    pg.add_argument("--output_pkl", required=True,
                    help="Where to write [channels, name->idx, adj] pickle")
    pg.add_argument("--dist_k", type=float, default=0.9,
                    help="Distance threshold (reference default 0.9)")

    ns = p.parse_args(argv)
    if ns.cmd == "graph":
        import pickle

        from eeg_gnn_tpu.constants import INCLUDED_CHANNELS
        from eeg_gnn_tpu.graphs.distance import build_distance_adjacency

        adj, idx = build_distance_adjacency(ns.distances_csv,
                                            dist_k=ns.dist_k)
        with open(ns.output_pkl, "wb") as f:
            pickle.dump([list(INCLUDED_CHANNELS), idx,
                         adj.astype(np.float32)], f)
        print(f"DONE. {int((adj > 0).sum())} nonzeros -> {ns.output_pkl}")
    elif ns.cmd == "resample":
        failed = resample_all(ns.raw_edf_dir, ns.save_dir)
        print(f"DONE. {len(failed)} failed files.")
    elif ns.cmd == "detection":
        preprocess_detection(ns.resampled_dir, ns.raw_data_dir, ns.marker_dir,
                             ns.output_dir, ns.clip_len, ns.time_step_size,
                             ns.use_fft)
    elif ns.cmd == "ssl":
        preprocess_ssl(ns.resampled_dir, ns.marker_dir, ns.output_dir,
                       ns.clip_len, ns.time_step_size, ns.use_fft)
    else:
        preprocess_classification(ns.resampled_dir, ns.raw_data_dir,
                                  ns.marker_dir, ns.output_dir, ns.clip_len,
                                  ns.time_step_size, ns.use_fft)


if __name__ == "__main__":
    main()
