"""Word-level timestamp tests: DTW vs golden alignments, median filter,
BPE word grouping, and the end-to-end path through the session/CLI."""

import json
import struct

import numpy as np
import pytest

from whisper_tpu.pipeline.words import (
    WordTiming,
    alignment_matrix,
    dtw_path,
    median_filter,
    words_from_alignment,
)


class TestMedianFilter:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (3, 40))
        got = median_filter(x, 7)
        pad = np.concatenate(
            [np.repeat(x[:, :1], 3, axis=1), x,
             np.repeat(x[:, -1:], 3, axis=1)], axis=1)
        want = np.stack(
            [[np.median(pad[r, i:i + 7]) for i in range(40)]
             for r in range(3)])
        np.testing.assert_allclose(got, want)

    def test_width_one_identity(self):
        x = np.arange(12.0).reshape(3, 4)
        np.testing.assert_array_equal(median_filter(x, 1), x)


class TestDTW:
    def test_recovers_diagonal_golden_path(self):
        """A matrix with a strong diagonal must align token i to frame
        ~i*(M/N) — the golden alignment."""
        n, m = 8, 64
        cost = np.ones((n, m))
        for i in range(n):
            center = int((i + 0.5) * m / n)
            cost[i, max(0, center - 4): center + 4] = -5.0
        text, time = dtw_path(cost)
        # Path is monotonic and complete.
        assert text[0] == 0 and text[-1] == n - 1
        assert time[0] == 0 and time[-1] == m - 1
        assert (np.diff(text) >= 0).all() and (np.diff(time) >= 0).all()
        # Each token's matched frames hit its low-cost band.
        for i in range(n):
            frames = time[text == i]
            center = int((i + 0.5) * m / n)
            assert abs(int(np.median(frames)) - center) <= 6

    def test_word_times_monotonic_from_golden(self):
        n, m = 6, 50
        mat = np.zeros((n, m))
        for i in range(n):
            mat[i, int((i + 0.5) * m / n)] = 10.0  # attention peaks
        words = words_from_alignment(mat, list(range(100, 106)),
                                     tokenizer=None, offset_s=2.0)
        assert len(words) == 6  # no tokenizer: one word per token
        starts = [w.start_s for w in words]
        ends = [w.end_s for w in words]
        assert all(e > s for s, e in zip(starts, ends))
        assert starts == sorted(starts)
        assert all(s >= 2.0 for s in starts)  # offset applied
        assert ends[-1] <= 2.0 + m / 50 + 0.05


class TestWordGrouping:
    class Tok:
        _pieces = {1: " hello", 2: " wor", 3: "ld", 4: "!", 5: " x"}

        def decode(self, ids, skip_special_tokens=False):
            return "".join(self._pieces.get(i, "?") for i in ids)

    def test_bpe_space_boundaries(self):
        mat = np.eye(5, 50, k=0)
        for i in range(5):
            mat[i, i * 9: i * 9 + 3] = 5.0
        words = words_from_alignment(mat, [1, 2, 3, 4, 5], self.Tok())
        assert [w.word for w in words] == ["hello", "world!", "x"]
        assert words[0].tokens == [1]
        assert words[1].tokens == [2, 3, 4]  # continuation + punctuation
        assert words[1].end_s >= words[1].start_s


class TestAlignmentMatrix:
    def test_uses_upper_half_layers_and_normalizes(self):
        rng = np.random.default_rng(3)
        weights = rng.uniform(0, 1, (4, 2, 6, 30))
        mat = alignment_matrix(weights, n_tokens=5, n_frames=20)
        assert mat.shape == (5, 20)
        # std-normalization: each head row ~zero-mean before averaging,
        # so the matrix values are bounded sane.
        assert np.isfinite(mat).all()


class TestEndToEnd:
    def test_cli_word_timestamps_json(self, tmp_path):
        from whisper_tpu.bench.cli import main

        audio_dir = tmp_path / "a"
        audio_dir.mkdir()
        rng = np.random.default_rng(5)
        data = rng.normal(0, 0.1, 2 * 16000)
        pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2").tobytes()
        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
            16, 1, 1, 16000, 32000, 2, 16, b"data", len(pcm))
        (audio_dir / "w.wav").write_bytes(hdr + pcm)
        out = tmp_path / "o"
        rc = main([
            "--audio-dir", str(audio_dir),
            "--model-id", "test/whisper-nano",
            "--onnx-dir", str(tmp_path / "none"),
            "--allow-random-init",
            "--word-timestamps",
            "--max-new-tokens", "5",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
        ])
        assert rc == 0
        rows = json.loads((out / "j.json").read_text())
        assert "words" in rows[0]
        for w in rows[0]["words"]:
            assert set(w) == {"word", "start", "end"}
            assert 0.0 <= w["start"] <= w["end"] <= 30.0

    def test_json_schema_unchanged_without_flag(self, tmp_path):
        from whisper_tpu.bench.cli import main

        audio_dir = tmp_path / "a"
        audio_dir.mkdir()
        pcm = np.zeros(16000, dtype="<i2").tobytes()
        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
            16, 1, 1, 16000, 32000, 2, 16, b"data", len(pcm))
        (audio_dir / "w.wav").write_bytes(hdr + pcm)
        out = tmp_path / "o"
        rc = main([
            "--audio-dir", str(audio_dir),
            "--model-id", "test/whisper-nano",
            "--onnx-dir", str(tmp_path / "none"),
            "--allow-random-init",
            "--max-new-tokens", "3",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
        ])
        assert rc == 0
        rows = json.loads((out / "j.json").read_text())
        assert set(rows[0]) == {"file", "duration_s", "end_to_end_s",
                                "rtf", "text"}  # reference schema exactly