"""--initial-prompt conditioning (HF prompt_ids semantics in batch modes,
rolling-context seed in sequential mode; faster-whisper/openai-whisper
`initial_prompt` is the comparison-SUT capability this mirrors)."""

import numpy as np
import pytest

from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession


@pytest.fixture(scope="module")
def nano_session():
    dims = get_dims("test/whisper-nano")
    return WhisperSession(
        init_params(dims, seed=0), dims,
        RuntimeCfg(dtype="float32", max_batch=4),
    )


def _audio(seconds=35.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 0.1, int(seconds * 16000)).astype(np.float32)


def _capture_prompts(monkeypatch, session):
    captured = []
    orig = type(session).transcribe_from_mel_async

    def spy(self, mel, starts, prompt, *a, **k):
        captured.append(list(prompt))
        return orig(self, mel, starts, prompt, *a, **k)

    monkeypatch.setattr(type(session), "transcribe_from_mel_async", spy)
    return captured


class TestPromptStructure:
    def test_chunked_prefixes_every_chunk(self, nano_session, monkeypatch):
        from whisper_tpu.pipeline.longform import transcribe_longform
        from whisper_tpu.tokenizer.specials import special_tokens

        special = special_tokens("en", "transcribe", None)
        captured = _capture_prompts(monkeypatch, nano_session)
        ids = [7, 8, 9]
        transcribe_longform(nano_session, _audio(), "en", "transcribe",
                            max_new_tokens=3, initial_prompt_ids=ids)
        assert captured, "transcribe_from_mel_async not reached"
        want_prefix = [special.sot_prev] + ids
        assert captured[0][: len(want_prefix)] == want_prefix
        assert captured[0][len(want_prefix)] == special.sot

    def test_pipelined_prefixes_every_slab(self, nano_session, monkeypatch):
        from whisper_tpu.pipeline.pipelined import (
            transcribe_longform_pipelined,
        )
        from whisper_tpu.tokenizer.specials import special_tokens

        special = special_tokens("en", "transcribe", None)
        captured = _capture_prompts(monkeypatch, nano_session)
        ids = [11, 12]
        transcribe_longform_pipelined(
            nano_session, _audio(60.0), "en", "transcribe",
            max_new_tokens=3, slab_chunks=1, initial_prompt_ids=ids)
        assert len(captured) >= 2  # one per slab
        want_prefix = [special.sot_prev] + ids
        for p in captured:
            assert p[: len(want_prefix)] == want_prefix

    def test_sequential_seeds_rolling_context(self, nano_session,
                                              monkeypatch):
        from whisper_tpu.pipeline.sequential import transcribe_sequential
        from whisper_tpu.tokenizer.specials import special_tokens

        special = special_tokens("en", "transcribe", None)
        captured = _capture_prompts(monkeypatch, nano_session)
        ids = [21, 22, 23]
        transcribe_sequential(
            nano_session, _audio(8.0), "en", "transcribe",
            max_new_tokens=4, condition_on_prev_text=True,
            prev_context_tokens=8, initial_prompt_ids=ids)
        assert captured
        # Window 1's conditioned prompt carries sot_prev + the seed tail
        # (left-padded with EOT to the fixed conditioned length).
        first = captured[0]
        i = first.index(special.sot_prev)
        assert first[i + 1 : i + 1 + len(ids)] == ids

    def test_conditioning_changes_tokens(self, nano_session):
        from whisper_tpu.pipeline.longform import transcribe_longform

        audio = _audio(20.0, seed=3)
        t_plain, _ = transcribe_longform(nano_session, audio, "en",
                                         "transcribe", max_new_tokens=5)
        t_cond, _ = transcribe_longform(nano_session, audio, "en",
                                        "transcribe", max_new_tokens=5,
                                        initial_prompt_ids=[33, 44, 55])
        # With random weights the extra context virtually always shifts the
        # argmax chain; equality would mean the prefix never reached the
        # decoder.
        assert t_plain != t_cond


def test_encode_text_roundtrip(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    from whisper_tpu.tokenizer.bpe import WhisperDetokenizer, encode_text

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(["hello proper nouns like Kubernetes"], trainer)
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    ids = encode_text(path, "hello Kubernetes")
    assert ids, "no ids produced"
    detok = WhisperDetokenizer.from_file(path)
    assert detok.decode(ids).strip() == "hello Kubernetes"
