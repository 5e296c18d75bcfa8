from whisper_tpu.frontend.golden import (
    log_mel_golden,
    build_mel_filterbank,
    hann_window_periodic,
    reflect_pad,
    num_frames,
)
from whisper_tpu.frontend.mel import log_mel_jax, dft_matrices

__all__ = [
    "log_mel_golden",
    "build_mel_filterbank",
    "hann_window_periodic",
    "reflect_pad",
    "num_frames",
    "log_mel_jax",
    "dft_matrices",
]
