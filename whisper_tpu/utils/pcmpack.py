"""Host-side bit packing for the truncated-PCM wire encodings.

pcm12/pcm14 ship the TOP bits of each sample, bit-packed (12-bit: 2
samples per 3 bytes; 14-bit: 4 samples per 7 bytes, MSB-first).  Unlike
the delta encodings (dint16/dint16p, which only help when the tunnel's
own compressor is active), truncation cuts wire bytes by 25% resp.
12.5% on EVERY link.  Quantization noise power lands at ~-77 dB (pcm12)
resp. ~-89 dB (pcm14) — at/below the log-mel clamp floor (max-8 = -80 dB
of power dynamic range), where ulaw8's ~-38 dB distorts quiet mel bins.

Exact device-side inverse: frontend.mel.decode_transfer("pcm12"/"pcm14")
(round-trip bit-exactness is pinned by tests/test_frontend.py).  Shared
by runtime.session._encode_transfer and utils.wireprobe so the probe
measures the identical payload the session would ship.

No reference counterpart (the reference runs on host CPU and uploads
nothing); see docs/UPLOAD_PIPELINE.md for the wire story.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_wire", "pack_pcm", "quantized_reference"]


def _to_pcm16(audio: np.ndarray) -> np.ndarray:
    if audio.dtype == np.int16:
        return audio
    x = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    return np.round(x * 32767.0).astype(np.int16)


def encode_wire(audio: np.ndarray, mode: str) -> np.ndarray:
    """Canonical host-side wire encoder for every compact upload mode.

    audio: float32 in [-1,1] or int16 PCM, shape [..., L] (deltas run
    along the last axis — the serving path encodes [B, L] batches).
    THE single definition shared by runtime.session._encode_transfer and
    utils.wireprobe, so the probe measures the identical payload the
    session ships (a drifted copy would skew the encoding race).
    Device inverses: frontend.mel.decode_transfer.
    """
    if mode == "int16":
        return _to_pcm16(audio)
    if mode == "dint16":
        # First differences mod 2^16 shipped as uint16; device modular
        # cumsum reconstructs the int16 EXACTLY.
        pcm = _to_pcm16(audio)
        return np.diff(pcm.astype(np.int32), axis=-1,
                       prepend=np.int32(0)).astype(np.uint16)
    if mode == "dint16p":
        # Zig-zag deltas split into contiguous high/low byte planes
        # ([..., hi | lo] int8, 2L bytes): low-entropy high bytes sit in
        # one run for a compressing link; decode is bit-exact.
        pcm = _to_pcm16(audio)
        d = np.diff(pcm.astype(np.int32), axis=-1,
                    prepend=np.int32(0)).astype(np.int16)
        di = d.astype(np.int32)
        z = ((di << 1) ^ (di >> 15)) & 0xFFFF
        hi = (z >> 8).astype(np.uint8)
        lo = (z & 0xFF).astype(np.uint8)
        return np.concatenate([hi, lo], axis=-1).view(np.int8)
    if mode in ("pcm12", "pcm14"):
        return pack_pcm(audio, mode)
    raise ValueError(f"unknown wire encoding {mode!r}")


def pack_pcm(audio: np.ndarray, mode: str) -> np.ndarray:
    """Encode float32 [-1,1] (or int16) samples [..., L] to packed uint8.

    Odd tails are zero-padded up to the pack group (2 or 4 samples); the
    decoded array is correspondingly a few samples longer — callers
    address frames by index so zero tails are inert (same contract as the
    slab zero tails).
    """
    if audio.dtype == np.int16:
        x = audio.astype(np.float32) / 32767.0
    else:
        x = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    if mode == "pcm12":
        if x.shape[-1] % 2:
            x = np.concatenate(
                [x, np.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)
        u = (np.round(x * 2047.0).astype(np.int32) + 2048).astype(np.uint32)
        u0, u1 = u[..., 0::2], u[..., 1::2]
        packed = np.stack(
            [u0 >> 4, ((u0 & 0xF) << 4) | (u1 >> 8), u1 & 0xFF], axis=-1)
    elif mode == "pcm14":
        pad = (-x.shape[-1]) % 4
        if pad:
            x = np.concatenate(
                [x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        u = (np.round(x * 8191.0).astype(np.int32) + 8192).astype(np.uint32)
        u0, u1, u2, u3 = (u[..., k::4] for k in range(4))
        packed = np.stack(
            [u0 >> 6,
             ((u0 & 0x3F) << 2) | (u1 >> 12),
             (u1 >> 4) & 0xFF,
             ((u1 & 0xF) << 4) | (u2 >> 10),
             (u2 >> 2) & 0xFF,
             ((u2 & 0x3) << 6) | (u3 >> 8),
             u3 & 0xFF],
            axis=-1)
    else:
        raise ValueError(f"unknown pcm pack mode {mode!r}")
    return packed.reshape(*packed.shape[:-2], -1).astype(np.uint8)


def quantized_reference(audio: np.ndarray, mode: str) -> np.ndarray:
    """The float32 samples the device decode reconstructs (for tests):
    round-trip of the quantizer without the bit packing."""
    if audio.dtype == np.int16:
        x = audio.astype(np.float32) / 32767.0
    else:
        x = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    scale = 2047.0 if mode == "pcm12" else 8191.0
    # Same op order as the device decode (multiply by the f32 reciprocal,
    # not divide) so the round trip is BIT-exact, not 1-ulp-close.
    codes = np.round(x * scale).astype(np.float32)
    return (codes * np.float32(1.0 / scale)).astype(np.float32)
