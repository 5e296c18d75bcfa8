from whisper_tpu.audio.io import load_audio_16k_mono
from whisper_tpu.audio.resample import resample_linear

__all__ = ["load_audio_16k_mono", "resample_linear"]
