"""Detokenizer tests: decode parity vs the HF `tokenizers` library on a real
byte-level BPE tokenizer.json fixture, plus special-token resolution
(ref src/main.rs:518-657)."""

import numpy as np
import pytest

from whisper_tpu.tokenizer.bpe import WhisperDetokenizer
from whisper_tpu.tokenizer.specials import special_tokens, resolve_tokenizer

SPECIALS = [
    "<|endoftext|>",
    "<|startoftranscript|>",
    "<|en|>",
    "<|hi|>",
    "<|transcribe|>",
    "<|translate|>",
    "<|notimestamps|>",
]


@pytest.fixture(scope="module")
def tok_json(tmp_path_factory):
    """Train a tiny byte-level BPE with the HF tokenizers lib and save a real
    tokenizer.json, with Whisper-style special tokens added."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world, this is a transcription test!",
        "whisper on tpu goes brrr éèüß 你好",
    ]
    tok.train_from_iterator(corpus, trainer)
    tok.add_special_tokens(SPECIALS)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path), tok


class TestDecodeParity:
    @pytest.mark.parametrize(
        "text",
        [
            "the quick brown fox",
            "hello world, this is a test!",
            "brrr éèüß 你好 end",
            "  leading and trailing  ",
        ],
    )
    def test_matches_hf_tokenizers(self, tok_json, text):
        path, hf_tok = tok_json
        ours = WhisperDetokenizer.from_file(path)
        ids = hf_tok.encode(text).ids
        assert ours.decode(ids, skip_special_tokens=True) == hf_tok.decode(
            ids, skip_special_tokens=True
        )

    def test_special_tokens_skipped_and_kept(self, tok_json):
        path, hf_tok = tok_json
        ours = WhisperDetokenizer.from_file(path)
        sot = ours.token_to_id("<|startoftranscript|>")
        eot = ours.token_to_id("<|endoftext|>")
        ids = [sot] + hf_tok.encode("fox").ids + [eot]
        assert ours.decode(ids, skip_special_tokens=True) == hf_tok.decode(
            ids, skip_special_tokens=True
        )
        assert "<|startoftranscript|>" in ours.decode(ids, skip_special_tokens=False)

    def test_out_of_range_ids_ignored(self, tok_json):
        path, _ = tok_json
        ours = WhisperDetokenizer.from_file(path)
        assert ours.decode([10**6, -3]) == ""


class TestSpecialTokens:
    def test_fallback_table_matches_reference(self):
        # Hardcoded multilingual fallback (ref src/main.rs:543-568).
        s = special_tokens("en", "transcribe", None)
        assert (s.sot, s.eot, s.lang, s.task, s.no_timestamps) == (
            50258, 50257, 50259, 50359, 50363,
        )
        assert special_tokens("hi", "translate", None).lang == 50276
        assert special_tokens("hi", "translate", None).task == 50358
        assert special_tokens("xx", "yy", None).lang == 50259  # defaults

    def test_tokenizer_lookup_wins(self, tok_json):
        path, _ = tok_json
        tok = WhisperDetokenizer.from_file(path)
        s = special_tokens("en", "transcribe", tok)
        assert s.sot == tok.token_to_id("<|startoftranscript|>")
        assert s.lang == tok.token_to_id("<|en|>")

    def test_missing_token_raises(self, tok_json):
        path, _ = tok_json
        tok = WhisperDetokenizer.from_file(path)
        with pytest.raises(KeyError):
            special_tokens("zz", "transcribe", tok)


class TestResolveTokenizer:
    def test_priority_flag_then_model_dir(self, tok_json, tmp_path):
        path, _ = tok_json
        got = resolve_tokenizer(tokenizer_json=path)
        assert got is not None and str(got[1]) == path

        import shutil

        model_dir = tmp_path / "model"
        model_dir.mkdir()
        shutil.copy(path, model_dir / "tokenizer.json")
        got = resolve_tokenizer(model_dir=str(model_dir))
        assert got is not None and got[1] == model_dir / "tokenizer.json"

    def test_none_when_absent(self, tmp_path):
        assert resolve_tokenizer(model_dir=str(tmp_path), model_id="nope/nope") is None

    def test_missing_flag_file_raises(self):
        with pytest.raises(FileNotFoundError):
            resolve_tokenizer(tokenizer_json="/does/not/exist.json")


def test_resolve_ignores_cwd_tokenizer(tmp_path, monkeypatch):
    """Empty model_dir/model_id must NOT probe ./tokenizer.json (a stray
    CWD file would outrank the documented priority chain)."""
    from whisper_tpu.tokenizer.specials import resolve_tokenizer

    (tmp_path / "tokenizer.json").write_text("{not even json")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohub"))
    assert resolve_tokenizer("", "", "no-slash-model") is None
