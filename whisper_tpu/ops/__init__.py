from whisper_tpu.ops.pallas_mel import log_mel_pallas

__all__ = ["log_mel_pallas"]
