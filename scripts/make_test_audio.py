#!/usr/bin/env python3
"""Generate deterministic synthetic benchmark audio.

The reference's benchmark workload is a single `audio/audio.wav` of
301.574 s that is NOT in its tree (.MISSING_LARGE_BLOBS:1); SURVEY.md §4
calls for a reproducible synthetic fixture in its place.  This writes a
speech-like signal (wandering chirps + noise floor — deliberately
incompressible, like real speech) of the same duration, so benchmark runs
are comparable across machines without shipping audio blobs.

Run: python scripts/make_test_audio.py [--out audio/audio.wav]
     [--seconds 301.574] [--seed 42] [--files N]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np


def synth_speechlike(seconds: float, seed: int, sr: int = 16_000) -> np.ndarray:
    n = int(round(seconds * sr))
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / sr
    x = (
        0.3 * np.sin(2 * np.pi * (180 + 60 * np.sin(2 * np.pi * 0.7 * t)) * t)
        + 0.15 * np.sin(2 * np.pi * 920 * t)
        + 0.04 * rng.standard_normal(n)
    )
    # syllable-rate amplitude modulation
    x *= 0.6 + 0.4 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, 1)
    return (0.5 * x).astype(np.float32)


def write_wav_s16(path: str, data: np.ndarray, sr: int = 16_000) -> None:
    pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1, sr,
        sr * 2, 2, 16, b"data", len(pcm),
    )
    with open(path, "wb") as f:
        f.write(hdr + pcm)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="audio/audio.wav")
    ap.add_argument("--seconds", type=float, default=301.574)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--files", type=int, default=1,
                    help="write N files (audio.wav, audio_1.wav, ...)")
    args = ap.parse_args(argv)

    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    base, ext = os.path.splitext(args.out)
    for i in range(args.files):
        path = args.out if i == 0 else f"{base}_{i}{ext}"
        write_wav_s16(path, synth_speechlike(args.seconds, args.seed + i))
        print(f"wrote {path} ({args.seconds:.3f}s @16kHz mono s16)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
