"""Fused FFT log-amplitude featurizer.

The reference computes, per 1-second window, the log-amplitude of the
positive-frequency half of the FFT on the host in DataLoader workers
(reference ``data/data_utils.py:13-34``, invoked per time step at
``data/dataloader_detection.py:63-74``). That per-sample scipy loop is the
input-pipeline bottleneck (SURVEY.md §3.6 hot loop #2).

TPU-native redesign: featurize whole batches of raw clips on device in one
fused op — reshape (..., T*F) signals into windows and run a single batched
``jnp.fft.rfft``. XLA fuses the abs/log/floor elementwise tail.

A numpy oracle with the reference's exact semantics (full complex FFT,
truncate to floor(n/2) bins, exact-zero floor at 1e-8) is used by tests and
by the AOT preprocessing CLI for bit-parity caches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The reference floors exact-zero amplitudes at 1e-8 before the log
# (data_utils.py:29). Note: exact zeros only, not small values.
_ZERO_FLOOR = 1e-8


def log_amplitude_fft_np(signals: np.ndarray, n: int) -> np.ndarray:
    """Host oracle: log|FFT| of the positive-frequency half.

    Args:
        signals: (..., num_points) real signals.
        n: FFT length; output keeps the first floor(n/2) bins.

    Parity: reference ``computeFFT`` (data/data_utils.py:13-34), amplitude
    branch (the phase spectrum is computed there but discarded by every
    caller, so we do not produce it).
    """
    fourier = np.fft.fft(signals, n=n, axis=-1)
    idx_pos = int(np.floor(n / 2))
    amp = np.abs(fourier[..., :idx_pos])
    amp[amp == 0.0] = _ZERO_FLOOR
    return np.log(amp)


def log_amplitude_fft(signals, n: int):
    """On-device batched log|FFT| positive half. See :func:`log_amplitude_fft_np`.

    Uses ``rfft`` (real input) — mathematically identical on the first
    floor(n/2) bins, at half the FLOPs of the reference's complex FFT.
    """
    x = jnp.asarray(signals)
    fourier = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=-1)
    idx_pos = n // 2
    amp = jnp.abs(fourier[..., :idx_pos])
    amp = jnp.where(amp == 0.0, _ZERO_FLOOR, amp)
    return jnp.log(amp)


def featurize_clip_np(clip: np.ndarray, time_step_size: int, frequency: int = 200,
                      use_fft: bool = True) -> np.ndarray:
    """Host oracle: slice a raw clip into windows and (optionally) FFT.

    Args:
        clip: (num_channels, clip_len*frequency) raw signal slice.
        time_step_size: window length in seconds.
        frequency: sampling rate (Hz).
        use_fft: if False, returns raw windows.

    Returns:
        (num_windows, num_channels, window_points or window_points//2).

    Parity: the windowing loop of ``computeSliceMatrix``
    (data/dataloader_detection.py:61-74): non-overlapping windows of
    ``time_step_size*frequency`` points, trailing remainder dropped.
    """
    step = int(time_step_size * frequency)
    num_ch, total = clip.shape
    num_win = total // step
    windows = clip[:, : num_win * step].reshape(num_ch, num_win, step)
    windows = np.transpose(windows, (1, 0, 2))  # (T, C, step)
    if use_fft:
        return log_amplitude_fft_np(windows, n=step)
    return windows


def featurize_clip(clips, time_step_size: int, frequency: int = 200, use_fft: bool = True):
    """On-device batched clip featurizer.

    Args:
        clips: (..., num_channels, clip_len*frequency) raw signals — any
            leading batch dims.

    Returns:
        (..., num_windows, num_channels, feat_dim) features, where feat_dim
        is ``step//2`` under FFT else ``step``.
    """
    x = jnp.asarray(clips)
    step = int(time_step_size * frequency)
    num_ch, total = x.shape[-2], x.shape[-1]
    num_win = total // step
    windows = x[..., : num_win * step].reshape(*x.shape[:-2], num_ch, num_win, step)
    windows = jnp.swapaxes(windows, -3, -2)  # (..., T, C, step)
    if use_fft:
        return log_amplitude_fft(windows, n=step)
    return windows
