from whisper_tpu.models.registry import WhisperDims, MODEL_REGISTRY, get_dims
from whisper_tpu.models import whisper
from whisper_tpu.models import convert

__all__ = ["WhisperDims", "MODEL_REGISTRY", "get_dims", "whisper", "convert"]
