"""Language detection tests (capability beyond the reference: its CLI
requires an explicit --language, src/main.rs:35-36)."""

import numpy as np
import pytest

from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.runtime.langdetect import detect_language, language_token_ids
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession


@pytest.fixture(scope="module")
def session():
    dims = get_dims("test/whisper-nano")
    return WhisperSession(
        init_params(dims, seed=2), dims,
        RuntimeCfg(dtype="float32", max_batch=2),
    )


def _tok_fixture(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=350, initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(["vocab text"], trainer)
    tok.add_special_tokens([
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|hi|>",
        "<|de|>", "<|transcribe|>", "<|translate|>", "<|notimestamps|>",
    ])
    path = tmp_path_factory.mktemp("t") / "tokenizer.json"
    tok.save(str(path))
    from whisper_tpu.tokenizer.bpe import WhisperDetokenizer

    return WhisperDetokenizer.from_file(str(path))


class TestLanguageTokenIds:
    def test_from_tokenizer(self, tmp_path_factory):
        tok = _tok_fixture(tmp_path_factory)
        sot = tok.token_to_id("<|startoftranscript|>")
        ids = language_token_ids(tok, sot, 1000)
        codes = set(ids.values())
        assert {"en", "hi", "de"} <= codes
        # control tokens excluded
        assert "notimestamps" not in codes and "transcribe" not in codes

    def test_fallback_layout(self):
        ids = language_token_ids(None, 500, 1000)
        assert len(ids) == 99
        assert min(ids) == 501 and max(ids) == 599


class TestDetect:
    def test_detect_returns_valid_language(self, session, tmp_path_factory):
        tok = _tok_fixture(tmp_path_factory)
        sot = tok.token_to_id("<|startoftranscript|>")
        lang_ids = language_token_ids(tok, sot, session.dims.vocab_size)
        rng = np.random.default_rng(0)
        mel = rng.normal(0, 1, (session.dims.n_mels, 3000)).astype(np.float32)
        code, tid, p = detect_language(session, mel, sot, lang_ids)
        assert tid in lang_ids and lang_ids[tid] == code
        assert 0.0 <= p <= 1.0

    def test_longform_auto_language(self, session):
        from whisper_tpu.pipeline.longform import transcribe_longform

        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.1, 3 * 16000).astype(np.float32)
        text, timing = transcribe_longform(
            session, audio, language="auto", task="transcribe",
            max_new_tokens=4,
        )
        assert isinstance(text, str)

    def test_sequential_auto_language(self, session):
        """language='auto' must not crash the sequential pipeline (it
        detects from the first window like transcribe_longform; with no
        language tokens in the vocab it falls back to en)."""
        from whisper_tpu.pipeline.sequential import transcribe_sequential

        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.1, 3 * 16000).astype(np.float32)
        text, segments, _ = transcribe_sequential(
            session, audio, "auto", "transcribe", max_new_tokens=4,
        )
        assert isinstance(text, str)
