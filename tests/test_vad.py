"""Energy-VAD tests (audio/vad.py): span detection, bridging/padding
rules, condensed-time restoration, and the --vad-filter CLI surface
(faster-whisper's vad_filter parity, benchmark_faster_whisper.py)."""

import csv
import json

import numpy as np
import pytest

from whisper_tpu.audio.vad import (
    SR,
    VadOptions,
    collect_chunks,
    detect_speech,
)


def _tone(seconds, freq=440.0, amp=0.3):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _silence(seconds, noise=1e-4):
    rng = np.random.default_rng(0)
    return (noise * rng.standard_normal(int(seconds * SR))).astype(np.float32)


class TestDetect:
    def test_two_bursts_with_long_gap(self):
        audio = np.concatenate(
            [_silence(1.0), _tone(1.0), _silence(3.0), _tone(1.0),
             _silence(1.0)])
        spans = detect_speech(audio)
        assert len(spans) == 2
        (s0, e0), (s1, e1) = spans
        # First burst is at [1.0, 2.0] s, padded by 0.4 s each side.
        assert abs(s0 / SR - 0.6) < 0.1 and abs(e0 / SR - 2.4) < 0.1
        assert abs(s1 / SR - 4.6) < 0.1 and abs(e1 / SR - 6.4) < 0.1

    def test_short_gap_is_bridged(self):
        audio = np.concatenate(
            [_silence(1.0), _tone(1.0), _silence(1.0), _tone(1.0),
             _silence(1.0)])
        spans = detect_speech(audio)   # 1 s gap < min_silence 2 s
        assert len(spans) == 1

    def test_short_blip_is_dropped(self):
        audio = np.concatenate(
            [_silence(2.0), _tone(0.1), _silence(2.0), _tone(1.0),
             _silence(1.0)])
        spans = detect_speech(
            audio, VadOptions(min_silence_duration_ms=500))
        assert len(spans) == 1         # the 100 ms blip < min_speech 250 ms
        s, e = spans[0]
        assert s / SR > 3.0            # only the long burst survives

    def test_all_silence_yields_no_spans(self):
        assert detect_speech(_silence(3.0)) == []

    def test_continuous_speech_passes_through(self):
        """No silence anywhere: a relative-energy detector cannot segment
        it — the whole signal must survive, never be dropped."""
        audio = _tone(4.0)
        assert detect_speech(audio) == [(0, len(audio))]

    def test_quiet_continuous_noise_still_dropped(self):
        assert detect_speech(_silence(4.0, noise=3e-5)) == []

    def test_empty_audio(self):
        assert detect_speech(np.zeros(0, np.float32)) == []


class TestCollectRestore:
    def test_condensed_time_maps_back(self):
        audio = np.concatenate(
            [_silence(1.0), _tone(1.0), _silence(3.0), _tone(1.0),
             _silence(1.0)])
        spans = detect_speech(audio)
        condensed, smap = collect_chunks(audio, spans)
        assert len(condensed) == smap.total_samples
        # t=0 in condensed time = start of first span.
        assert abs(smap.restore_time(0.0) - spans[0][0] / SR) < 1e-6
        # A time inside the SECOND collected span maps past the gap.
        first_len_s = (spans[0][1] - spans[0][0]) / SR
        t2 = first_len_s + 0.5
        orig = smap.restore_time(t2)
        assert spans[1][0] / SR <= orig <= spans[1][1] / SR
        # Past-the-end clamps to the last span's end.
        assert smap.restore_time(1e6) == spans[-1][1] / SR

    def test_no_spans(self):
        condensed, smap = collect_chunks(_silence(1.0), [])
        assert len(condensed) == 0 and smap.total_samples == 0
        assert smap.restore_time(0.5) == 0.5


@pytest.fixture(scope="module")
def sparse_audio_dir(tmp_path_factory):
    import struct

    d = tmp_path_factory.mktemp("vad-audio")

    def w(path, data):
        pcm = np.clip(data * 32768., -32768, 32767).astype("<i2").tobytes()
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                          b"WAVE", b"fmt ", 16, 1, 1, SR, SR * 2, 2, 16,
                          b"data", len(pcm))
        open(path, "wb").write(hdr + pcm)

    w(str(d / "sparse.wav"), np.concatenate(
        [_silence(1.0), _tone(1.5), _silence(3.0), _tone(1.0),
         _silence(0.5)]))
    w(str(d / "quiet.wav"), _silence(2.0))
    return str(d)


class TestCliVad:
    def test_vad_filter_run(self, sparse_audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "results"
        rc = main([
            "--audio-dir", sparse_audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", "none", "--allow-random-init",
            "--max-new-tokens", "4",
            "--warmup", "0",
            "--vad-filter", "--word-timestamps",
            "--write-txt", "--write-srt",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        # Every input gets its output files — the all-silence one too
        # (empty), so downstream per-file tooling never misses a file.
        assert (out / "quiet.transcript.txt").exists()
        assert (out / "quiet.srt").exists()
        assert (out / "quiet.transcript.txt").read_text().strip() == ""
        with open(out / "c.csv") as f:
            rows = {r["file"]: r for r in csv.DictReader(f)}
        # Original durations are reported (RTF accounting).
        assert abs(float(rows["sparse.wav"]["duration_s"]) - 7.0) < 0.05
        # The all-silence file produced an empty transcript.
        assert rows["quiet.wav"]["text"].strip() == ""
        with open(out / "j.json") as f:
            jrows = {r["file"]: r for r in json.load(f)}
        words = jrows["sparse.wav"].get("words") or []
        # Word times are restored to ORIGINAL file time: inside a padded
        # speech span, not in the condensed 0..2.5 s range only.
        for w in words:
            assert 0.0 <= w["start"] <= 7.0
            assert w["end"] <= 7.0 + 0.5

    def test_vad_requires_chunked_mode(self, sparse_audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        with pytest.raises(SystemExit):
            main([
                "--audio-dir", sparse_audio_dir,
                "--model-id", "test/whisper-nano",
                "--onnx-dir", "none", "--allow-random-init",
                "--vad-filter", "--longform-mode", "sequential",
                "--out-csv", str(tmp_path / "c.csv"),
                "--out-json", str(tmp_path / "j.json"),
                "--out-summary-json", str(tmp_path / "s.json"),
            ])
