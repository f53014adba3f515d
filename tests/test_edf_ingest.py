"""EDF reader/writer + offline resample pipeline tests."""

import os

import numpy as np

from eeg_gnn_tpu.constants import FREQUENCY, INCLUDED_CHANNELS
from eeg_gnn_tpu.data.edf import (
    get_ordered_channels,
    read_edf_header,
    read_edf_signals,
    write_edf,
)


def _labels():
    # TUSZ-style labels with reference suffixes
    return [ch + "-REF" for ch in INCLUDED_CHANNELS]


def test_edf_roundtrip(rng, tmp_path):
    sig = rng.randn(19, 250 * 4) * 50  # 4 s at 250 Hz
    path = str(tmp_path / "t.edf")
    write_edf(path, sig, _labels(), sample_rate=250)

    h = read_edf_header(path)
    assert h.num_signals == 19
    assert h.sample_frequencies()[0] == 250
    back = read_edf_signals(path, h)
    assert back.shape == (19, 250 * 4)
    # int16 quantization over the physical range
    scale = (sig.max(axis=1) - sig.min(axis=1)) / 65535
    np.testing.assert_allclose(back, sig, atol=float(scale.max()) * 1.01)


def test_ordered_channels_matches_reference_semantics():
    labels = _labels()[::-1]  # reversed order
    ordered = get_ordered_channels("f", labels, INCLUDED_CHANNELS)
    assert [labels[i].split("-")[0] for i in ordered] == INCLUDED_CHANNELS


def test_resample_cli_end_to_end(rng, tmp_path):
    import h5py

    from eeg_gnn_tpu.cli.preprocess import resample_all

    raw = tmp_path / "edf"
    out = tmp_path / "h5"
    raw.mkdir()
    t = np.arange(250 * 8) / 250.0
    sig = 40 * np.sin(2 * np.pi * 5 * t)[None, :].repeat(19, axis=0)
    sig += rng.randn(19, t.size)
    write_edf(str(raw / "a.edf"), sig, _labels(), sample_rate=250)

    failed = resample_all(str(raw), str(out))
    assert failed == []
    with h5py.File(str(out / "a.h5"), "r") as f:
        res = f["resampled_signal"][()]
        assert int(f["resample_freq"][()]) == FREQUENCY
    assert res.shape == (19, FREQUENCY * 8)
    # 5 Hz sine survives resampling: correlate against the ideal
    t200 = np.arange(FREQUENCY * 8) / FREQUENCY
    ideal = 40 * np.sin(2 * np.pi * 5 * t200)
    corr = np.corrcoef(res[0], ideal)[0, 1]
    assert corr > 0.95
