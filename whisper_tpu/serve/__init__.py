from whisper_tpu.serve.engine import StreamingEngine, EngineConfig

__all__ = ["StreamingEngine", "EngineConfig"]
