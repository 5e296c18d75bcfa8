"""Long-form chunking: 30 s windows with overlap over a whole-file mel.

Reproduces the reference's chunk geometry exactly
(ref src/main.rs:859-882): chunk starts every ``chunk_len - overlap``
samples; the whole-file log-mel is computed once and frame-sliced per chunk
(``mel_full[:, pos/160 : pos/160+3000]``, zero-padded to 3000 frames,
ref :899-905).  On TPU the chunk set becomes a batch dimension
(SURVEY.md §5.7) instead of the reference's rayon thread pool.
"""

from __future__ import annotations

from typing import List

import numpy as np

from whisper_tpu.frontend.golden import HOP

CHUNK_FRAMES = 3000  # 30 s of mel frames: the encoder's fixed context


def chunk_starts(n_samples: int, chunk_len: int, step: int) -> List[int]:
    """Chunk start sample positions (exact reference loop, src/main.rs:875-882)."""
    starts: List[int] = []
    pos = 0
    while pos < n_samples:
        end = min(pos + chunk_len, n_samples)
        starts.append(pos)
        if end == n_samples:
            break
        pos += step
    return starts


def mel_frame_bucket(n_frames: int) -> int:
    """Static mel-frame capacity: CHUNK_FRAMES * next_pow2 — bounds compiled
    front-end variants to O(log audio_len) while wasting < 2x frames."""
    mult = 1
    while CHUNK_FRAMES * mult < n_frames:
        mult <<= 1
    return CHUNK_FRAMES * mult


def slice_mel_chunks(
    mel_full: np.ndarray,  # [n_mels, F]
    starts: List[int],
    total_frames: int,
) -> np.ndarray:
    """[C, n_mels, 3000] chunk batch; frames past `total_frames` are zero
    (matches ref src/main.rs:899-905)."""
    n_mels = mel_full.shape[0]
    out = np.zeros((len(starts), n_mels, CHUNK_FRAMES), dtype=mel_full.dtype)
    for c, pos in enumerate(starts):
        fs = pos // HOP
        avail = max(0, min(fs + CHUNK_FRAMES, total_frames) - fs)
        if avail:
            out[c, :, :avail] = mel_full[:, fs : fs + avail]
    return out
