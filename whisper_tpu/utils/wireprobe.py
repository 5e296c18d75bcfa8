"""Adaptive H2D wire-encoding probe: measure THIS session's tunnel, then
pick the audio upload encoding.

The long-form pipeline is wire-bound (docs/UPLOAD_PIPELINE.md): the model
needs ~0.11 s per 301 s file while the audio upload costs 0.25-0.44 s, so
the H2D encoding choice IS the headline number.  Two encodings are
bit-exact end to end (device-side decode in frontend/mel.decode_transfer):

  int16   raw PCM — half the f32 payload, entropy ~= the signal's
  dint16  first differences mod 2^16 — same size, but high-byte entropy
          collapses on speech-like signals, which a compressing link
          exploits
  dint16p zig-zag deltas split into contiguous high/low byte planes —
          same size again, but the low-entropy bytes are contiguous so
          a block compressor sees them as one long compressible run

Which wins is SESSION-DEPENDENT: one tunnel session measured dint16 at
~1.5x the int16 rate (281 vs 410 ms per 9.7 MB slab), another measured a
flat ~53 MB/s regardless of payload entropy (no compression at all), in
which case dint16 only adds host encode + device decode cost.  Probing at
startup is the only policy that is right in both sessions.

Timing uses the N-vs-n delta method (CLAUDE.md): wall-clocking a single
transfer through the tunnel measures its ~30 ms fixed round trip, not
bandwidth — so enqueue N uploads each consumed by a trivial device
reduction, sync once, and difference two batch sizes.

No reference counterpart (the reference runs on host CPU and uploads
nothing); this subsystem exists because the TPU sits behind a link.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["choose_audio_transfer", "probe_rates", "synth_speechlike"]


def synth_speechlike(seconds: float = 60.0, sr: int = 16_000) -> np.ndarray:
    """Deterministic chirp+noise signal whose delta-compressibility is in
    the same regime as real speech (dominant low-frequency energy with a
    small wideband floor)."""
    n = int(seconds * sr)
    rng = np.random.default_rng(42)
    t = np.arange(n, dtype=np.float64) / sr
    x = (
        0.3 * np.sin(2 * np.pi * (180 + 60 * np.sin(2 * np.pi * 0.7 * t)) * t)
        + 0.15 * np.sin(2 * np.pi * 920 * t)
        + 0.04 * rng.standard_normal(n)
    )
    return (0.5 * x).astype(np.float32)


def _encode(pcm: np.ndarray, mode: str) -> np.ndarray:
    # THE session's encoder (utils/pcmpack.encode_wire): the probe must
    # measure the identical payload the session would ship.
    from whisper_tpu.utils.pcmpack import encode_wire

    return encode_wire(pcm, mode)


def probe_rates(
    audio: Optional[np.ndarray] = None,
    candidates: Tuple[str, ...] = ("int16", "dint16", "dint16p"),
    sample_s: float = 60.0,
    reps_big: int = 8,
    reps_small: int = 2,
) -> Dict[str, float]:
    """Measure per-upload seconds for each candidate encoding of (a slice
    of) ``audio`` on the current default device.  Returns {mode: seconds
    per upload}."""
    import jax
    import jax.numpy as jnp

    if audio is None:
        audio = synth_speechlike(sample_s)
    n = min(len(audio), int(sample_s * 16_000))
    if audio.dtype == np.int16:
        # Already PCM: clipping to [-1,1] would flatten it to +/-1 and
        # make the delta encodings look maximally compressible.
        pcm = np.asarray(audio[:n])
    else:
        x = np.clip(np.asarray(audio[:n], dtype=np.float32), -1.0, 1.0)
        pcm = np.round(x * 32767.0).astype(np.int16)

    @jax.jit
    def consume(v):
        return jnp.sum(v.astype(jnp.float32))

    def run(payload: np.ndarray, reps: int) -> float:
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = consume(jnp.asarray(payload))
        float(np.asarray(acc))  # one sync at the end
        return time.perf_counter() - t0

    out: Dict[str, float] = {}
    for mode in candidates:
        payload = _encode(pcm, mode)
        run(payload, 1)  # warm: compile consume for this dtype + 1 upload
        delta = None
        for _attempt in range(2):
            t_small = run(payload, reps_small)
            t_big = run(payload, reps_big)
            delta = (t_big - t_small) / (reps_big - reps_small)
            if delta > 0:
                break
        if delta is None or delta <= 0:
            # Jitter produced a nonsensical negative delta twice: mark
            # the mode unmeasurable (it must never win on a fluke — with
            # allow_pcm a fluke could silently pick a LOSSY encoding).
            delta = float("inf")
        out[mode] = delta
    return out


_BYTES_PER_SAMPLE = {"int16": 2.0, "dint16": 2.0, "dint16p": 2.0,
                     "pcm12": 1.5, "pcm14": 1.75}


def choose_audio_transfer(
    audio: Optional[np.ndarray] = None,
    candidates: Tuple[str, ...] = ("int16", "dint16", "dint16p"),
    margin: float = 1.15,
    allow_pcm: bool = False,
) -> Tuple[str, Dict[str, float]]:
    """Pick the fastest upload encoding for this session's link.

    Prefers the FIRST candidate (int16, the no-extra-work default) unless
    a later one beats it by more than ``margin`` — a real tunnel
    compression win measures ~1.5x, while an uncompressing session's
    jitter on this sample size is ~10%, so 15% cleanly separates the two
    (measured: int16=22 dint16=24 dint16p=23 MB/s on a flat session).

    allow_pcm additionally races pcm12 (bit-packed truncated PCM — 25%
    fewer wire bytes; quantization noise near the log-mel clamp floor,
    token-A/B'd at whisper-base dims, utils/pcmpack.py).  It is LOSSY vs
    the int16 source, so it must be opted into; the probe compares
    seconds-per-file, so a compressing tunnel that makes dint16p faster
    than the smaller pcm payload still wins the race honestly.  pcm14 is
    NOT raced: its best honest advantage (12.5% fewer bytes) sits below
    the 15% selection margin, so it could never win — it remains
    available as an explicit --audio-transfer pcm14.
    Returns (mode, {mode: MB/s})."""
    if allow_pcm:
        candidates = tuple(candidates) + ("pcm12",)
    rates = probe_rates(audio, candidates)
    n_samples = min(
        len(audio) if audio is not None else int(60.0 * 16_000),
        int(60.0 * 16_000),
    )
    mbps = {m: n_samples * _BYTES_PER_SAMPLE.get(m, 2.0) / s / 1e6
            for m, s in rates.items()}
    # Margin vs the FIRST candidate only (the no-extra-work default);
    # among qualifiers, take the fastest.  Chaining the margin through a
    # running best would let an early marginal winner block a later mode
    # that beats the default by far more than the margin.
    first = candidates[0]
    qualifiers = [m for m in candidates[1:]
                  if rates[m] * margin < rates[first]]
    best = min(qualifiers, key=lambda m: rates[m], default=first)
    return best, mbps
