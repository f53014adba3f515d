"""ClipStore: flat mmap'd clip tensor + native multithreaded batch gather.

The AOT-cache answer to per-sample h5 reads (reference ``--preproc_dir``
semantics, SURVEY.md §2.3): all clips of a split live in ONE contiguous
float32 file, batches are assembled by the C++ gather in
``native/clipstore.cpp`` (GIL-free, memory-bandwidth bound), and labels /
names ride a JSON sidecar.

The native library is compiled on first use with g++ (cached next to the
source); a pure-numpy mmap fallback keeps everything working without a
toolchain.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HEADER_BYTES = 64
_MAGIC = b"ECS1"

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "clipstore.cpp")
_SO = os.path.join(_NATIVE_DIR, "libclipstore.so")

_lib = None
_lib_tried = False


def _load_native():
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.ecs_open.restype = ctypes.c_void_p
        lib.ecs_open.argtypes = [ctypes.c_char_p]
        lib.ecs_info.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_int64)] * 3
        lib.ecs_gather.restype = ctypes.c_int
        lib.ecs_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.ecs_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def write_clipstore(path: str, clips: np.ndarray,
                    labels: Optional[Sequence] = None,
                    names: Optional[Sequence[str]] = None):
    """Write (num_clips, channels, samples) float32 clips + JSON sidecar."""
    clips = np.ascontiguousarray(clips, dtype=np.float32)
    n, c, s = clips.shape
    header = bytearray(_HEADER_BYTES)
    header[0:4] = _MAGIC
    header[0x08:0x10] = np.int64(n).tobytes()
    header[0x10:0x18] = np.int64(c).tobytes()
    header[0x18:0x20] = np.int64(s).tobytes()
    header[0x20:0x28] = np.int64(1).tobytes()  # dtype code f32
    with open(path, "wb") as f:
        f.write(bytes(header))
        clips.tofile(f)
    sidecar = {
        "num_clips": n, "channels": c, "samples": s,
        "labels": None if labels is None else np.asarray(labels).tolist(),
        "names": None if names is None else list(names),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f)


class ClipStore:
    """Read side: zero-copy view + native batch gather."""

    def __init__(self, path: str, num_threads: int = 0):
        self.path = path
        self.num_threads = num_threads
        self._lib = _load_native()
        self._handle = None
        if self._lib is not None:
            handle = self._lib.ecs_open(path.encode())
            if handle:
                self._handle = ctypes.c_void_p(handle)
        # header/metadata via numpy either way
        with open(path, "rb") as f:
            head = f.read(_HEADER_BYTES)
        assert head[:4] == _MAGIC, f"{path}: not a clip store"
        self.num_clips = int(np.frombuffer(head, np.int64, 1, 0x08)[0])
        self.channels = int(np.frombuffer(head, np.int64, 1, 0x10)[0])
        self.samples = int(np.frombuffer(head, np.int64, 1, 0x18)[0])
        self._mmap = np.memmap(path, np.float32, "r", _HEADER_BYTES,
                               (self.num_clips, self.channels, self.samples))
        sidecar = path + ".json"
        self.labels = self.names = None
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                meta = json.load(f)
            if meta.get("labels") is not None:
                self.labels = np.asarray(meta["labels"])
            self.names = meta.get("names")

    @property
    def native(self) -> bool:
        return self._handle is not None

    def gather(self, indices, out: Optional[np.ndarray] = None) -> np.ndarray:
        """Assemble a (len(indices), C, S) batch."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        shape = (len(idx), self.channels, self.samples)
        if out is None:
            out = np.empty(shape, np.float32)
        assert out.shape == shape and out.dtype == np.float32
        if self._handle is not None:
            rc = self._lib.ecs_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.num_threads,
            )
            if rc != 0:
                raise IndexError("clip index out of range")
        else:
            out[:] = self._mmap[idx]
        return out

    def __len__(self):
        return self.num_clips

    def close(self):
        if self._handle is not None:
            self._lib.ecs_close(self._handle)
            self._handle = None


class ClipStoreLoader:
    """Batch iterator over a ClipStore, Trainer-compatible (raw mode).

    Yields ``data.loader.Batch`` objects with x = raw clips (B, C, S) for
    the fused on-device pipeline, or featurized clips if the store holds
    features.
    """

    def __init__(self, store: ClipStore, batch_size: int, shuffle: bool,
                 seq_len: int, seed: int = 0, drop_last: bool = False):
        self.store = store
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seq_len = seq_len
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.store)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        from eeg_gnn_tpu.data.loader import Batch

        idx = np.arange(len(self.store))
        if self.shuffle:
            self._rng.shuffle(idx)
        labels = (self.store.labels if self.store.labels is not None
                  else np.zeros(len(idx), np.float32))
        names = self.store.names or [str(i) for i in range(len(idx))]
        for lo in range(0, len(idx), self.batch_size):
            b = idx[lo:lo + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                return
            x = self.store.gather(b)
            yield Batch(
                x=x,
                y=np.asarray(labels)[b].astype(np.float32),
                seq_lengths=np.full((len(b),), self.seq_len, np.int32),
                supports=None,
                adj=None,
                names=[names[i] for i in b],
            )


def build_clipstore_from_detection_markers(out_path: str, input_dir: str,
                                           marker_dir: str, split: str,
                                           clip_len: int, seed: int = 123,
                                           sampling_ratio: float = 1):
    """Materialize a raw-clip store for one detection split (balanced
    undersampling applied exactly like the online path)."""
    from eeg_gnn_tpu.data.clips import slice_raw_clip
    from eeg_gnn_tpu.data.markers import parse_detection_markers

    sz = os.path.join(marker_dir, f"{split}Set_seq2seq_{clip_len}s_sz.txt")
    nosz = os.path.join(marker_dir, f"{split}Set_seq2seq_{clip_len}s_nosz.txt")
    tuples = parse_detection_markers(split, sz, nosz, cv_seed=seed,
                                     scale_ratio=sampling_ratio)
    clips, labels, names = [], [], []
    for h5_fn, label in tuples:
        clip_idx = int(h5_fn.split("_")[-1].split(".h5")[0])
        h5_path = os.path.join(input_dir, h5_fn.split(".edf")[0] + ".h5")
        clips.append(slice_raw_clip(h5_path, clip_idx, clip_len))
        labels.append(float(label != 0))
        names.append(h5_fn.split(".h5")[0])
    write_clipstore(out_path, np.stack(clips), labels, names)
    return len(clips)
