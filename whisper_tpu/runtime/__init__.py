from whisper_tpu.runtime.generate import greedy_generate, build_suppress_mask
from whisper_tpu.runtime.session import WhisperSession, RuntimeCfg

__all__ = [
    "greedy_generate",
    "build_suppress_mask",
    "WhisperSession",
    "RuntimeCfg",
]
