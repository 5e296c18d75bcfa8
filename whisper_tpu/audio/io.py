"""Audio loading facade: decode -> mono downmix -> 16 kHz linear resample.

Equivalent of the reference's `load_audio_16k_mono` (ref src/main.rs:228-316):
returns (float32 samples @16 kHz mono, 16000, duration_seconds).

Two backends:
- native C++ library (whisper_tpu/native, libavformat/libavcodec based) for
  wav/flac/mp3/aac/vorbis — the counterpart of the reference's symphonia
  decode loop; preferred when built.
- pure-Python RIFF/WAVE reader + NumPy resampler as a fallback (wav only).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from whisper_tpu.audio.resample import resample_linear
from whisper_tpu.audio.wav import read_wav

TARGET_SR = 16_000

_native = None
_native_checked = False


def _get_native():
    """Load the native audio decoder if its shared library is built."""
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from whisper_tpu.native import audio_native

            _native = audio_native if audio_native.available() else None
        except Exception:
            _native = None
    return _native


def load_audio_16k_mono(path: str) -> Tuple[np.ndarray, int, float]:
    """Decode `path`, downmix to mono (channel mean), resample to 16 kHz.

    Returns (samples float32, sample_rate=16000, duration_s) where
    duration_s = len(resampled) / 16000, matching the reference's duration
    accounting (src/main.rs:310-315).
    """
    native = _get_native()
    if native is not None:
        mono, sr = native.decode_mono(path)
    else:
        ext = os.path.splitext(path)[1].lower()
        if ext != ".wav":
            raise RuntimeError(
                f"Native audio decoder not built; only .wav supported in "
                f"fallback mode (got {path})"
            )
        mono, sr = read_wav(path)

    if sr != TARGET_SR:
        mono = resample_linear(mono, sr, TARGET_SR)
    duration = len(mono) / float(TARGET_SR)
    return mono.astype(np.float32, copy=False), TARGET_SR, duration
