"""Linear-interpolation resampler with the reference's exact math
(ref src/main.rs:207-226): output length = round(len * ratio) (half away
from zero), sample positions t = i / ratio in f64, 2-tap lerp with float32
blend weights, zero for out-of-bounds taps.

Transcript parity with the reference requires this exact resampler
(SURVEY.md §2.1 N6).
"""

from __future__ import annotations

import numpy as np


def ulaw_encode(x: np.ndarray, mu: float = 255.0) -> np.ndarray:
    """mu-law companding to uint8 (G.711-style): halves the host->device
    payload vs int16 at ~37 dB SNR. Used by the fastest transfer variant."""
    x = np.clip(np.asarray(x, dtype=np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    if sr_in == sr_out:
        return x.copy()
    # Native C++ path when the host lib is built (wt_resample_linear,
    # native/audio_decode.cc — bit-equal to the NumPy expression below,
    # enforced by tests/test_native_audio.py); NumPy otherwise.  Only
    # LOAD failures (lib absent / unloadable) fall back — errors from an
    # available native resampler propagate so real defects aren't masked.
    try:
        from whisper_tpu.native import audio_native
    except (ImportError, OSError):
        return _resample_linear_numpy(x, sr_in, sr_out)
    if audio_native.resample_available():
        return audio_native.resample_linear(x, sr_in, sr_out)
    return _resample_linear_numpy(x, sr_in, sr_out)


def _resample_linear_numpy(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    ratio = float(sr_out) / float(sr_in)           # f64, like the reference
    n_out = int(np.floor(len(x) * ratio + 0.5))    # Rust round(): half away from zero

    t = np.arange(n_out, dtype=np.float64) / ratio
    i0 = np.floor(t).astype(np.int64)
    a = (t - i0).astype(np.float32)                # blend weight cast to f32

    def tap(idx):
        valid = (idx >= 0) & (idx < len(x))
        return np.where(valid, x[np.clip(idx, 0, len(x) - 1)], np.float32(0.0))

    s0 = tap(i0)
    s1 = tap(i0 + 1)
    return ((np.float32(1.0) - a) * s0 + a * s1).astype(np.float32)
