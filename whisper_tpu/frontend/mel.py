"""JAX/XLA log-mel front end (TPU compute path).

Implements the exact numerical contract of
:mod:`whisper_tpu.frontend.golden` (ref src/main.rs:407-509) as a jittable,
static-shape function designed for the MXU:

- framing is expressed as three strided slices (hop=160 divides the signal
  into rows; a 400-sample window spans 2.5 rows), avoiding gathers;
- the 400-point real FFT becomes two matmuls against constant DFT cosine /
  sine matrices [400, 201] — at whisper scale this is ~10 GFLOP per 300 s of
  audio, which the MXU does in well under a millisecond, and it lets XLA fuse
  window/power/mel into the surrounding ops;
- the mel projection is a [*, 201] @ [201, n_mels] matmul;
- the global max / clamp / affine normalization is a cheap fused reduction.

Invalid (padding) frames are excluded from the global max and zeroed in the
output so a bucketed static frame count yields results identical to the
reference's dynamic frame count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.frontend import golden
from whisper_tpu.frontend.golden import HOP, N_FFT, N_FREQ, WIN


@functools.lru_cache(maxsize=None)
def dft_matrices() -> tuple[np.ndarray, np.ndarray]:
    """Constant real-DFT matrices (cos, -sin), each [N_FFT, N_FREQ] float32.

    power[k] = (frame @ cos)[k]^2 + (frame @ msin)[k]^2  ==  |rfft(frame)[k]|^2
    Built in float64 then cast, so matrix entries are correctly rounded.
    """
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(N_FREQ, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _constants(n_mels: int):
    """Host NumPy constants (safe to cache across jit traces)."""
    cos_m, sin_m = dft_matrices()
    window = golden.hann_window_periodic(WIN)
    fb = golden.build_mel_filterbank(n_mels=n_mels)  # [n_mels, 201]
    return (
        window,
        cos_m * window[:, None],  # fold window into DFT matrices
        sin_m * window[:, None],
        np.ascontiguousarray(fb.T),  # [201, n_mels]
    )


def frame_signal(padded: jax.Array, n_frames: int) -> jax.Array:
    """Extract [n_frames, WIN] frames with hop=HOP from a padded signal.

    Uses three strided row-views instead of a gather: with hop=160 and
    win=400, frame f = rows f, f+1 and the first 80 samples of row f+2 of the
    [*, 160] reshape.
    """
    need = (n_frames + 2) * HOP  # rows f .. f+2 must exist for every frame
    pad_amount = max(0, need - padded.shape[0])
    if pad_amount:
        padded = jnp.pad(padded, (0, pad_amount))
    rows = padded[: (n_frames + 2) * HOP].reshape(n_frames + 2, HOP)
    a0 = rows[:n_frames]          # samples [160f, 160f+160)
    a1 = rows[1 : n_frames + 1]   # samples [160f+160, 160f+320)
    a2 = rows[2 : n_frames + 2, : WIN - 2 * HOP]  # samples [160f+320, 160f+400)
    return jnp.concatenate([a0, a1, a2], axis=-1)



def decode_transfer(audio: jax.Array, transfer: str = "auto") -> jax.Array:
    """Device-side decode of the wire encodings (session._encode_transfer):
    int16 PCM, uint16 delta-coded int16 PCM (per-row first differences mod
    2^16; cumsum mod 2^16 + sign-extend reconstructs the int16 EXACTLY),
    uint8 mu-law, bit-packed pcm12/pcm14 truncated PCM, or float32
    passthrough.  Works on [..., L] (the serving batch path vmaps 1-D
    lanes; cumsum runs along the last axis).

    ``transfer`` disambiguates encodings that share a dtype: "auto" keeps
    the historical dtype dispatch; "pcm12"/"pcm14" (uint8 payloads like
    ulaw8, but 3/2 resp. 7/4 bytes per sample pair/quad) must be named
    explicitly by the caller (threaded as a static jit arg from
    RuntimeCfg.audio_transfer)."""
    if transfer == "pcm12":
        # 12-bit linear PCM, 2 samples per 3 bytes, MSB-first:
        # u0 = b0<<4 | b1>>4, u1 = (b1&0xF)<<8 | b2; c = u-2048.
        # Quantization noise sits at ~-77 dB power — at the log-mel
        # clamp floor (max-8 = -80 dB), unlike ulaw8's ~-38 dB.
        b = audio.astype(jnp.int32) & 0xFF
        b0, b1, b2 = b[..., 0::3], b[..., 1::3], b[..., 2::3]
        u0 = (b0 << 4) | (b1 >> 4)
        u1 = ((b1 & 0xF) << 8) | b2
        c = jnp.stack([u0, u1], axis=-1).reshape(
            *audio.shape[:-1], -1) - 2048
        return c.astype(jnp.float32) * (1.0 / 2047.0)
    if transfer == "pcm14":
        # 14-bit linear PCM, 4 samples per 7 bytes, MSB-first bit string
        # u0:14 u1:14 u2:14 u3:14; c = u-8192.  Noise ~-89 dB power:
        # fully below the clamp floor (transparent to the mel contract).
        b = audio.astype(jnp.int32) & 0xFF
        b0, b1, b2, b3 = (b[..., k::7] for k in range(4))
        b4, b5, b6 = (b[..., k::7] for k in range(4, 7))
        u0 = (b0 << 6) | (b1 >> 2)
        u1 = ((b1 & 0x3) << 12) | (b2 << 4) | (b3 >> 4)
        u2 = ((b3 & 0xF) << 10) | (b4 << 2) | (b5 >> 6)
        u3 = ((b5 & 0x3F) << 8) | b6
        c = jnp.stack([u0, u1, u2, u3], axis=-1).reshape(
            *audio.shape[:-1], -1) - 8192
        return c.astype(jnp.float32) * (1.0 / 8191.0)
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32767.0)
    if audio.dtype == jnp.uint16:
        acc = jnp.cumsum(audio.astype(jnp.uint32), axis=-1) & 0xFFFF
        acc = acc.astype(jnp.int32)
        acc = jnp.where(acc >= 32768, acc - 65536, acc)
        return acc.astype(jnp.float32) * (1.0 / 32767.0)
    if audio.dtype == jnp.int8:
        # dint16p: ZIG-ZAG delta-coded int16 split into byte PLANES
        # ([..., high bytes | low bytes], 2L int8 total).  Small deltas
        # make the contiguous high-byte plane very low entropy (a handful
        # of small values), which a compressing link collapses, while the
        # decode stays exact:
        # un-zigzag -> modular cumsum -> sign-extend (same contract as
        # the uint16 branch above; bitwise-tested).
        n = audio.shape[-1] // 2
        u = audio.astype(jnp.int32) & 0xFF
        z = (u[..., :n] << 8) | u[..., n:]            # zigzag in [0,65535]
        d = (z >> 1) ^ -(z & 1)                       # signed 16-bit delta
        acc = jnp.cumsum(d.astype(jnp.uint32), axis=-1) & 0xFFFF
        acc = acc.astype(jnp.int32)
        acc = jnp.where(acc >= 32768, acc - 65536, acc)
        return acc.astype(jnp.float32) * (1.0 / 32767.0)
    if audio.dtype == jnp.uint8:
        y = audio.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        return jnp.sign(y) * (
            jnp.expm1(jnp.abs(y) * jnp.log1p(255.0)) / 255.0
        )
    return audio.astype(jnp.float32)


def _log_spec_raw(padded_audio: jax.Array, n_mels: int, n_frames: int,
                  transfer: str = "auto"):
    """Shared front-end core: framing + windowed DFT matmuls + mel
    projection + log10.  Returns log_spec [n_frames, n_mels] (fp32,
    un-clamped, un-normalized)."""
    _, cosw, sinw, fb_t = _constants(n_mels)

    # Compact transfer encodings (the device link is bandwidth-bound):
    # int16 halves the payload; uint16 carries DELTA-coded int16
    # (bit-exact after the modular-cumsum decode; helps only when the
    # tunnel's compressor is the throughput limiter, which is
    # session-dependent — scripts/probe_wire.py); uint8 mu-law
    # (G.711-style) quarters the payload at ~37 dB SNR.
    padded_audio = decode_transfer(padded_audio, transfer)
    frames = frame_signal(padded_audio.astype(jnp.float32), n_frames)
    # Window is folded into the DFT matrices.  HIGHEST precision: the front
    # end is the root of the token-parity contract and costs ~nothing, so we
    # never let TPU fp32 matmuls fall back to bf16 passes here.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cosw, precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sinw, precision=hi, preferred_element_type=jnp.float32)
    power = re * re + im * im                          # [n_frames, 201]
    mel = jnp.dot(power, fb_t, precision=hi, preferred_element_type=jnp.float32)
    mel = jnp.maximum(mel, 1e-10)
    return jnp.log10(mel)                              # [n_frames, n_mels]


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames", "transfer"))
def log_mel_jax(
    padded_audio: jax.Array,
    valid_frames: jax.Array,
    n_mels: int = 80,
    n_frames: int | None = None,
    transfer: str = "auto",
) -> jax.Array:
    """Log-mel spectrogram [n_mels, n_frames] from reflect-padded audio.

    Args:
      padded_audio: float32 [L + 2*200 (+ optional zero tail)], produced by
        :func:`whisper_tpu.frontend.golden.reflect_pad` (host side, O(400)).
      valid_frames: scalar int32 — the true frame count
        (:func:`golden.num_frames`); frames >= valid_frames are excluded from
        the global max and zeroed in the output.
      n_frames: static frame capacity (>= valid_frames), e.g. a bucket size.
    """
    if n_frames is None:
        raise ValueError("n_frames (static) is required")
    log_spec = _log_spec_raw(padded_audio, n_mels, n_frames, transfer)
    valid = (jnp.arange(n_frames) < valid_frames)[:, None]
    max_log = jnp.max(jnp.where(valid, log_spec, -jnp.inf))
    log_spec = jnp.maximum(log_spec, max_log - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    log_spec = jnp.where(valid, log_spec, 0.0)
    return log_spec.T                                  # [n_mels, n_frames]


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames", "transfer"))
def log_spec_slab(
    padded_slab: jax.Array,
    valid_frames: jax.Array,
    n_mels: int = 80,
    n_frames: int | None = None,
    transfer: str = "auto",
):
    """Unnormalized log-spec of one frame slab + its masked max.

    Building block of the streamed (upload-pipelined) front end
    (runtime/session.py compute_mel_streamed): a file's frames are
    partitioned into fixed-size slabs so each slab's H2D upload overlaps
    the previous slab's STFT; because frame f is a pure function of
    padded samples [160f, 160f+400), slab log-specs concatenated equal
    the whole-file log-spec bitwise.  The global max is recovered as the
    max of the per-slab masked maxes before the clamp/affine pass.

    Args:
      padded_slab: audio samples covering this slab's frames: element j is
        padded[160*f0 + j] of the whole-file reflect-padded signal, with at
        least (n_frames-1)*160 + 400 elements (zero tail past the file's
        padded end is fine — those frames must be >= valid_frames).
      valid_frames: scalar int32 — frames >= this count are excluded from
        the max (their log-spec content is left as computed; callers mask
        by frame index downstream).
    Returns:
      (log_spec [n_mels, n_frames] fp32 raw, vmax scalar fp32).
    """
    if n_frames is None:
        raise ValueError("n_frames (static) is required")
    log_spec = _log_spec_raw(padded_slab, n_mels, n_frames, transfer)
    valid = (jnp.arange(n_frames) < valid_frames)[:, None]
    vmax = jnp.max(jnp.where(valid, log_spec, -jnp.inf))
    return log_spec.T, vmax


def log_mel(audio: np.ndarray, n_mels: int = 80, bucket: int | None = None) -> jax.Array:
    """Convenience wrapper: host reflect-pad + device log-mel.

    `bucket` (static frame capacity) defaults to the true frame count; pass a
    bucketed value to bound the number of compiled variants across files.
    Returns [n_mels, bucket] with frames >= true count zeroed.
    """
    audio = np.asarray(audio, dtype=np.float32)
    padded = golden.reflect_pad(audio)
    n_valid = golden.num_frames(audio.shape[0])
    n_frames = bucket or n_valid
    if n_frames < n_valid:
        raise ValueError(f"bucket {n_frames} < true frame count {n_valid}")
    return log_mel_jax(
        jnp.asarray(padded), jnp.int32(n_valid), n_mels=n_mels, n_frames=n_frames
    )
