"""Fused Pallas log-mel kernel — the TPU-native front end (north star of
BASELINE.json): framing + Hann window + real DFT + power spectrum + mel
projection + log10 fused into ONE kernel, one HBM round trip.

The reference computes the same chain as a scalar CPU loop per frame
(`whisper_log_mel_80`, ref src/main.rs:407-509: window -> rustfft ->
power -> mel dot -> log/clamp/norm).  Here the per-frame FFT becomes two
MXU matmuls against constant window-folded DFT matrices, and framing is
expressed as three hop-strided row views so the kernel never gathers:

  frame f covers samples [160f, 160f+400) = rows f, f+1, f+2 of the
  [N, 160] reshape (the third row only contributes its first 80 samples,
  enforced by zeroing DFT rows >= 400).

Layout (all MXU/VPU aligned):
  frames  [FB, 512]   FB=256 frames per grid step; 480 real samples + pad
  dft     [512, 256]  201 real freq bins zero-padded to 256 lanes,
                      window folded in, rows >= 400 zeroed
  mel fb  [256, 128]  80 (or 128) mel rows zero-padded to 128 lanes
  out     [FB, 128]   log10(mel) per frame block

The global max / clamp(max-8) / (x+4)/4 normalization needs the whole-file
max, so it stays outside the kernel as a cheap fused reduction (the
reference also does that pass separately, src/main.rs:493-508).

Numerical contract is validated against whisper_tpu.frontend.golden to ~2e-5
(tests/test_pallas_mel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_tpu.frontend import golden
from whisper_tpu.frontend.golden import HOP, N_FFT, N_FREQ, WIN

FRAME_BLOCK = 256   # frames per grid step
FRAME_PAD = 512     # frames padded from 480 loaded samples to lane multiple
FREQ_PAD = 256      # 201 freq bins -> lane multiple
MEL_PAD = 128       # 80 mel bins -> lane multiple


@functools.lru_cache(maxsize=None)
def _kernel_constants(n_mels: int):
    """Window-folded, zero-padded DFT + mel matrices (host NumPy)."""
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(N_FREQ, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    window = golden.hann_window_periodic(WIN).astype(np.float64)

    cos_m = np.zeros((FRAME_PAD, FREQ_PAD), dtype=np.float32)
    sin_m = np.zeros((FRAME_PAD, FREQ_PAD), dtype=np.float32)
    # Rows >= WIN stay zero: they correspond to the unused tail of the third
    # hop row and the alignment padding.
    cos_m[:N_FFT, :N_FREQ] = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m[:N_FFT, :N_FREQ] = (-np.sin(ang) * window[:, None]).astype(np.float32)

    fb = golden.build_mel_filterbank(n_mels=n_mels)  # [n_mels, 201]
    fb_pad = np.zeros((FREQ_PAD, MEL_PAD if n_mels <= MEL_PAD else n_mels),
                      dtype=np.float32)
    fb_pad[:N_FREQ, :n_mels] = fb.T
    return cos_m, sin_m, fb_pad


def _mel_kernel(a0_ref, a1_ref, a2_ref, cos_ref, sin_ref, fb_ref, out_ref):
    fb = a0_ref.shape[0]
    zeros = jnp.zeros((fb, FRAME_PAD - 3 * HOP), dtype=jnp.float32)
    frames = jnp.concatenate(
        [a0_ref[:], a1_ref[:], a2_ref[:], zeros], axis=1
    )  # [FB, 512]; samples >= 400 are masked by zero DFT rows
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im                     # [FB, 256]
    mel = jnp.dot(power, fb_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit,
                   static_argnames=("n_mels", "n_frames", "interpret",
                                    "transfer"))
def log_mel_pallas(
    padded_audio: jax.Array,
    valid_frames: jax.Array,
    n_mels: int = 80,
    n_frames: int | None = None,
    interpret: bool = False,
    transfer: str = "auto",
) -> jax.Array:
    """Log-mel [n_mels, n_frames] from reflect-padded audio; same signature
    and semantics as frontend.mel.log_mel_jax (invalid frames zeroed,
    global max over valid frames only)."""
    if n_frames is None:
        raise ValueError("n_frames (static) is required")
    cos_m, sin_m, fb_pad = _kernel_constants(n_mels)
    mel_lanes = fb_pad.shape[1]

    grid = pl.cdiv(n_frames, FRAME_BLOCK)
    nf_pad = grid * FRAME_BLOCK

    # Hop-strided row views: frame f = rows f, f+1, f+2 of [*, HOP] reshape.
    need = (nf_pad + 2) * HOP
    from whisper_tpu.frontend.mel import decode_transfer

    # Wire decode (int16 / delta-uint16 / mu-law) runs as XLA ops ahead of
    # the pallas framing — a global cumsum cannot live inside the
    # frame-blocked grid.
    audio = decode_transfer(padded_audio, transfer)
    audio = jnp.pad(audio, (0, max(0, need - audio.shape[0])))
    rows = audio[:need].reshape(nf_pad + 2, HOP)
    a0 = rows[:nf_pad]
    a1 = rows[1 : nf_pad + 1]
    a2 = rows[2 : nf_pad + 2]

    row_spec = pl.BlockSpec((FRAME_BLOCK, HOP), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                            memory_space=pltpu.VMEM)

    log_mel = pl.pallas_call(
        _mel_kernel,
        grid=(grid,),
        in_specs=[
            row_spec, row_spec, row_spec,
            const_spec((FRAME_PAD, FREQ_PAD)),
            const_spec((FRAME_PAD, FREQ_PAD)),
            const_spec((FREQ_PAD, mel_lanes)),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, mel_lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf_pad, mel_lanes), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nf_pad * FRAME_PAD * (2 * FREQ_PAD)
            + 2 * nf_pad * FREQ_PAD * mel_lanes,
            bytes_accessed=3 * nf_pad * HOP * 4 + nf_pad * mel_lanes * 4,
            transcendentals=nf_pad * mel_lanes,
        ),
        interpret=interpret,
    )(a0, a1, a2, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb_pad))

    log_mel = log_mel[:n_frames, :n_mels]
    valid = (jnp.arange(n_frames) < valid_frames)[:, None]
    max_log = jnp.max(jnp.where(valid, log_mel, -jnp.inf))
    out = (jnp.maximum(log_mel, max_log - 8.0) + 4.0) / 4.0
    return jnp.where(valid, out, 0.0).T
