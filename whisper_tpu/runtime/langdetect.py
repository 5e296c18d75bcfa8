"""Language detection — softmax over language tokens after <|startoftranscript|>.

A Whisper capability beyond the reference (its CLI requires an explicit
--language, default en, ref src/main.rs:35-36): run the decoder prefill with
just ``[sot]`` and read the probability the model assigns to each language
token at the next position (the standard openai-whisper / faster-whisper
``detect_language``).

Language-token ids come from the tokenizer (every added token of the form
``<|xx|>`` that is not a task/control token), or from the standard
multilingual layout ``sot+1 .. sot+99`` as a fallback.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models import whisper
from whisper_tpu.models.registry import WhisperDims

_NON_LANG = {"startoftranscript", "endoftext", "translate", "transcribe",
             "notimestamps", "nospeech", "nocaptions", "startoflm",
             "startofprev"}
_LANG_RE = re.compile(r"^<\|([a-z]{2,3})\|>$")


def language_token_ids(tokenizer, sot: int, vocab_size: int) -> Dict[int, str]:
    """{token_id: language_code} for all language tokens."""
    if tokenizer is not None:
        out = {}
        for tid in range(vocab_size):
            tok = tokenizer._tokens[tid] if tid < len(tokenizer._tokens) else None
            if not tok:
                continue
            m = _LANG_RE.match(tok)
            if m and m.group(1) not in _NON_LANG:
                out[tid] = m.group(1)
        if out:
            return out
    # Standard multilingual layout: 99 languages right after <|sot|>.
    return {sot + 1 + i: f"lang_{i}" for i in range(99)
            if sot + 1 + i < vocab_size}


def detect_language(
    session,
    mel_chunk: np.ndarray,          # [n_mels, 3000] first-window mel
    sot: int,
    lang_ids: Dict[int, str],
) -> Optional[Tuple[str, int, float]]:
    """Returns (language_code, lang_token_id, probability), or None when no
    language tokens exist in this vocab (detection not possible)."""
    if not lang_ids:
        return None
    dims: WhisperDims = session.dims
    params = session.params
    precision = session.cfg.precision

    key = ("langdetect",)
    if key not in session._fns:
        def run(params, mel):
            enc = whisper.encoder_apply(
                params, dims, mel[None], precision=precision,
                fused_attention=session.cfg.fused_attention,
            )
            tokens = jnp.full((1, 1), sot, dtype=jnp.int32)
            logits, _ = whisper.decoder_prefill(
                params, dims, tokens, enc, max_len=2, precision=precision
            )
            return jax.nn.softmax(logits[0, -1, :].astype(jnp.float32))

        session._fns[key] = jax.jit(run)

    probs = np.asarray(session._fns[key](params, jnp.asarray(mel_chunk)))
    ids = np.asarray(sorted(lang_ids), dtype=np.int64)
    lang_probs = probs[ids]
    best = int(ids[int(lang_probs.argmax())])
    # renormalize over language tokens, like openai-whisper
    p = float(lang_probs.max() / max(lang_probs.sum(), 1e-12))
    return lang_ids[best], best, p
