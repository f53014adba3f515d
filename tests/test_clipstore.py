"""Native clip store: C++ gather correctness + loader integration."""

import numpy as np
import pytest

from eeg_gnn_tpu.data.clipstore import (
    ClipStore,
    ClipStoreLoader,
    build_clipstore_from_detection_markers,
    write_clipstore,
)


def test_roundtrip_and_native_gather(rng, tmp_path):
    clips = rng.randn(37, 19, 400).astype(np.float32)
    labels = rng.randint(0, 2, 37)
    path = str(tmp_path / "t.ecs")
    write_clipstore(path, clips, labels, [f"c{i}" for i in range(37)])

    store = ClipStore(path)
    assert (store.num_clips, store.channels, store.samples) == (37, 19, 400)
    assert store.native, "native library failed to build/load"

    idx = rng.randint(0, 37, 16)
    batch = store.gather(idx)
    np.testing.assert_array_equal(batch, clips[idx])

    # fallback path gives the same
    store._handle = None
    np.testing.assert_array_equal(store.gather(idx), clips[idx])


def test_gather_out_of_range(rng, tmp_path):
    clips = rng.randn(4, 2, 8).astype(np.float32)
    path = str(tmp_path / "t.ecs")
    write_clipstore(path, clips)
    store = ClipStore(path)
    if store.native:
        with pytest.raises(IndexError):
            store.gather([0, 7])


def test_loader_yields_trainer_batches(rng, tmp_path):
    clips = rng.randn(10, 19, 2 * 200).astype(np.float32)
    labels = rng.randint(0, 2, 10)
    path = str(tmp_path / "t.ecs")
    write_clipstore(path, clips, labels)
    loader = ClipStoreLoader(ClipStore(path), batch_size=4, shuffle=True,
                             seq_len=2)
    batches = list(loader)
    assert [len(b) for b in batches] == [4, 4, 2]
    assert batches[0].x.shape == (4, 19, 400)
    total = np.concatenate([b.y for b in batches])
    assert sorted(total.tolist()) == sorted(labels.astype(np.float32).tolist())


def test_build_from_detection_markers(tmp_path):
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    paths = make_synthetic_corpus(str(tmp_path / "c"), num_files=3,
                                  file_seconds=48, clip_len=12)
    out = str(tmp_path / "train.ecs")
    n = build_clipstore_from_detection_markers(
        out, paths["input_dir"], paths["marker_dir"], "train", 12)
    store = ClipStore(out)
    assert len(store) == n > 0
    assert store.samples == 12 * 200
    assert store.labels is not None and set(store.labels) <= {0.0, 1.0}
