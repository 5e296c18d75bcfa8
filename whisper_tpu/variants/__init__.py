from whisper_tpu.variants.ladder import VariantSpec, LADDER, apply_variant

__all__ = ["VariantSpec", "LADDER", "apply_variant"]
