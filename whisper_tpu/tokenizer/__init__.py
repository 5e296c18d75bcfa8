from whisper_tpu.tokenizer.bpe import WhisperDetokenizer
from whisper_tpu.tokenizer.specials import (
    SpecialTokens,
    special_tokens,
    resolve_tokenizer,
)

__all__ = [
    "WhisperDetokenizer",
    "SpecialTokens",
    "special_tokens",
    "resolve_tokenizer",
]
