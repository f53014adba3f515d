"""FFT featurizer parity tests (reference data/data_utils.py:13-34 oracle)."""

import numpy as np
import pytest

from conftest import import_reference_module, reference_available

from eeg_gnn_tpu.ops import (
    featurize_clip,
    featurize_clip_np,
    log_amplitude_fft,
    log_amplitude_fft_np,
)

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference mount")


@needs_ref
def test_log_amplitude_fft_np_matches_reference(rng):
    du = import_reference_module("data.data_utils")
    sig = rng.randn(19, 200)
    ours = log_amplitude_fft_np(sig, n=200)
    theirs, _ = du.computeFFT(sig, n=200)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


@needs_ref
def test_log_amplitude_fft_zero_floor(rng):
    du = import_reference_module("data.data_utils")
    sig = np.zeros((3, 200))
    ours = log_amplitude_fft_np(sig, n=200)
    theirs, _ = du.computeFFT(sig, n=200)
    np.testing.assert_allclose(ours, theirs)
    assert np.allclose(ours, np.log(1e-8))


def test_device_fft_matches_host(rng):
    sig = rng.randn(4, 19, 200).astype(np.float32)
    dev = np.asarray(log_amplitude_fft(sig, n=200))
    host = log_amplitude_fft_np(sig.astype(np.float64), n=200)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


@needs_ref
def test_featurize_clip_matches_reference_slicing(rng, tmp_path):
    """Windowing + FFT equals the reference computeSliceMatrix inner loop."""
    du = import_reference_module("data.data_utils")
    clip = rng.randn(19, 12 * 200)  # 12 s at 200 Hz

    steps = []
    for t in range(12):
        win = clip[:, t * 200:(t + 1) * 200]
        ft, _ = du.computeFFT(win, n=200)
        steps.append(ft)
    ref_feat = np.stack(steps, axis=0)

    ours = featurize_clip_np(clip, time_step_size=1, frequency=200, use_fft=True)
    np.testing.assert_allclose(ours, ref_feat, rtol=1e-10)

    dev = np.asarray(featurize_clip(clip.astype(np.float32), 1, 200, True))
    np.testing.assert_allclose(dev, ref_feat, rtol=1e-3, atol=1e-3)


def test_featurize_clip_raw_mode(rng):
    clip = rng.randn(19, 600).astype(np.float32)
    out = featurize_clip_np(clip, time_step_size=1, frequency=200, use_fft=False)
    assert out.shape == (3, 19, 200)
    np.testing.assert_allclose(out[1], clip[:, 200:400])
    dev = np.asarray(featurize_clip(clip, 1, 200, False))
    np.testing.assert_allclose(dev, out)


def test_featurize_clip_batched(rng):
    clips = rng.randn(2, 5, 19, 400).astype(np.float32)
    dev = np.asarray(featurize_clip(clips, 1, 200, True))
    assert dev.shape == (2, 5, 2, 19, 100)
    host = featurize_clip_np(clips[1, 3].astype(np.float64), 1, 200, True)
    np.testing.assert_allclose(dev[1, 3], host, rtol=1e-3, atol=1e-3)
