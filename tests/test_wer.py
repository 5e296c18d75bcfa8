"""WER/CER metric tests (new capability; the reference lists WER/CER as
unimplemented, PLAN.md:6-7)."""

import json

import pytest

from whisper_tpu.results.wer import cer, compare_files, edit_distance, normalize_text, wer


class TestEditDistance:
    def test_known_distances(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance("", "abc") == 3
        assert edit_distance("abc", "abc") == 0
        assert edit_distance(["a", "b"], ["b"]) == 1


class TestNormalize:
    def test_case_punct_whitespace(self):
        assert normalize_text("Hello,   World!") == "hello world"
        assert normalize_text("  a  b  ") == "a b"


class TestWerCer:
    def test_perfect(self):
        assert wer("the cat sat", "The cat sat.") == 0.0
        assert cer("abc", "ABC") == 0.0

    def test_one_substitution(self):
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_insertion_deletion(self):
        assert wer("a b c", "a c") == pytest.approx(1 / 3)
        assert wer("a c", "a b c") == pytest.approx(1 / 2)

    def test_empty_reference(self):
        assert wer("", "anything") == 1.0
        assert wer("", "") == 0.0


class TestCompareFiles:
    def test_aggregate(self, tmp_path):
        ref = [{"file": "a.wav", "text": "the quick brown fox"},
               {"file": "b.wav", "text": "hello world"}]
        hyp = [{"file": "a.wav", "text": "the quick brown fox"},
               {"file": "b.wav", "text": "hello there world"}]
        rp, hp = tmp_path / "r.json", tmp_path / "h.json"
        rp.write_text(json.dumps(ref))
        hp.write_text(json.dumps(hyp))
        r = compare_files(str(rp), str(hp))
        assert r["n_files"] == 2
        assert r["rows"][0]["wer"] == 0.0
        assert r["rows"][1]["wer"] == pytest.approx(0.5)  # 1 ins / 2 words
        assert r["wer"] == pytest.approx(1 / 6)  # 1 error / 6 ref words
