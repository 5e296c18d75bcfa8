"""End-to-end CLI test: reference flag surface -> output file schemas
(ref src/main.rs:23-86, 1216-1268)."""

import csv
import json
import os
import struct

import numpy as np
import pytest


def _write_wav(path, data, sr=16000):
    pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1, sr,
        sr * 2, 2, 16, b"data", len(pcm),
    )
    with open(path, "wb") as f:
        f.write(hdr + pcm)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Nano model dir: params + tokenizer.json (with whisper-style specials
    at small ids) + generation_config.json sidecars."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    from whisper_tpu.models.convert import init_params, save_params
    from whisper_tpu.models.registry import get_dims

    d = tmp_path_factory.mktemp("nano-model")
    dims = get_dims("test/whisper-nano")
    save_params(init_params(dims, seed=0), dims, str(d))

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()
    )
    tok.train_from_iterator(["some text to build a vocab"], trainer)
    tok.add_special_tokens([
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>",
        "<|transcribe|>", "<|translate|>", "<|notimestamps|>",
    ])
    tok.save(str(d / "tokenizer.json"))

    with open(d / "generation_config.json", "w") as f:
        json.dump({"suppress_tokens": [5, 6], "begin_suppress_tokens": [7]}, f)
    return str(d)


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    for name, secs in [("b_second.wav", 1.5), ("a_first.wav", 2.0)]:
        _write_wav(str(d / name), rng.normal(0, 0.1, int(secs * 16000)))
    (d / "ignored.txt").write_text("not audio")
    return str(d)


class TestCli:
    def test_full_run_schema(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "results"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--max-new-tokens", "4",
            "--warmup", "1",
            "--write-txt",
            "--out-csv", str(out / "inference_per_file.csv"),
            "--out-json", str(out / "inference_per_file.json"),
            "--out-summary-json", str(out / "inference_summary.json"),
            "--dtype", "float32",
        ])
        assert rc == 0

        # CSV schema (ref src/main.rs:1216-1229)
        with open(out / "inference_per_file.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["file"] for r in rows] == ["a_first.wav", "b_second.wav"]
        assert set(rows[0]) == {"file", "duration_s", "end_to_end_s", "rtf", "text"}
        assert abs(float(rows[0]["duration_s"]) - 2.0) < 0.01

        # JSON rows (ref :1232)
        jrows = json.load(open(out / "inference_per_file.json"))
        assert len(jrows) == 2 and jrows[0]["file"] == "a_first.wav"

        # Summary schema (ref :1235-1259)
        s = json.load(open(out / "inference_summary.json"))
        assert set(s) == {
            "config_used", "n_files", "latency_end_to_end_s", "breakdown_s",
            "rtf_end_to_end", "model_id", "onnx_dir", "language", "task",
            "max_new_tokens", "tokenizer_json", "timestamps", "notes",
        }
        assert s["n_files"] == 2
        assert set(s["breakdown_s"]) == {
            "load_s", "preprocess_s", "model_only_s", "decode_s"
        }
        for block in [s["latency_end_to_end_s"], s["rtf_end_to_end"]]:
            assert set(block) == {"min", "median", "p90", "p95", "max", "mean"}
        assert s["tokenizer_json"].endswith("tokenizer.json")
        # transcripts written
        assert (out / "a_first.transcript.txt").exists()

    def test_limit_files_and_random_init(self, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "r2"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", str(tmp_path / "missing-dir"),
            "--allow-random-init",
            "--limit-files", "1",
            "--max-new-tokens", "3",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        s = json.load(open(out / "s.json"))
        assert s["n_files"] == 1
        # No tokenizer -> token-id placeholder text in rows.
        jrows = json.load(open(out / "j.json"))
        assert jrows[0]["text"].startswith("[TOKENS:") or jrows[0]["text"] == ""

    def test_timestamps_mode_renders_markers(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rts"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "6",
            "--timestamps",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        s = json.load(open(out / "s.json"))
        assert s["timestamps"] is True
        jrows = json.load(open(out / "j.json"))
        # Grammar forces the first token to be a timestamp -> marker text.
        assert "<|" in jrows[0]["text"]

    def test_beam_flag_runs_and_echoes(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rbeam"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "4",
            "--num-beams", "2",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        s = json.load(open(out / "s.json"))
        assert s["config_used"]["num_beams"] == 2

    def test_prefetch_pipeline_two_files(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rpre"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--intra-op", "2",          # enables host-side prefetch
            "--max-new-tokens", "3",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        s = json.load(open(out / "s.json"))
        assert s["n_files"] == 2
        assert s["config_used"]["intra_op"] == 2

    def test_temperature_fallback_flag(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rtemp"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "4",
            "--temperatures", "0,1.0",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        assert json.load(open(out / "s.json"))["n_files"] == 1

    def test_missing_model_dir_fails(self, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        with pytest.raises(SystemExit):
            main([
                "--audio-dir", audio_dir,
                "--onnx-dir", str(tmp_path / "nope"),
            ])

    def test_discovery_json_and_overrides(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        disc = tmp_path / "disc.json"
        json.dump(
            {"best": {"intra_op": "4", "dtype": "float32", "max_batch": 2,
                      "allow_spinning": "yes"}},
            open(disc, "w"),
        )
        out = tmp_path / "r3"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--discovery-best-json", str(disc),
            "--intra-op", "8",          # CLI overrides discovery
            "--limit-files", "1",
            "--max-new-tokens", "3",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
        ])
        assert rc == 0
        cfg = json.load(open(out / "s.json"))["config_used"]
        assert cfg["intra_op"] == 8
        assert cfg["dtype"] == "float32"
        assert cfg["max_batch"] == 2
        assert cfg["allow_spinning"] is True

    @pytest.mark.slow
    def test_discovery_roundtrip_via_autotuner(self, model_dir, audio_dir, tmp_path):
        """discover -> best.json -> bench --discovery-best-json consumes it."""
        from whisper_tpu.bench.discover import main as discover_main
        from whisper_tpu.bench.cli import main

        best = tmp_path / "best.json"
        rc = discover_main([
            "--model-id", "test/whisper-nano",
            "--synthetic-s", "2",
            "--variants", "x2",
            "--max-batches", "2",
            "--max-new-tokens", "3",
            "--runs", "1",
            "--out", str(best),
        ])
        assert rc == 0
        data = json.load(open(best))
        assert data["best"]["dtype"] == "bfloat16"
        assert data["sweep"]

        out = tmp_path / "rdisc"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--discovery-best-json", str(best),
            "--limit-files", "1",
            "--max-new-tokens", "3",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
        ])
        assert rc == 0
        cfg = json.load(open(out / "s.json"))["config_used"]
        assert cfg["dtype"] == "bfloat16"
        assert cfg["max_batch"] == 2

    def test_language_auto_flag(self, model_dir, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rauto"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "3",
            "--language", "auto",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        s = json.load(open(out / "s.json"))
        assert s["language"] == "auto"

    def test_initial_prompt_flag(self, model_dir, audio_dir, tmp_path):
        """--initial-prompt encodes via the model dir's tokenizer.json and
        conditions decoding (prompt-structure tests live in
        tests/test_initial_prompt.py)."""
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rprompt"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "3",
            "--initial-prompt", "some text to build",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        assert json.load(open(out / "s.json"))["n_files"] == 1

    def test_initial_prompt_requires_tokenizer(self, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        with pytest.raises(SystemExit, match="initial-prompt"):
            main([
                "--audio-dir", audio_dir,
                "--model-id", "test/whisper-nano",
                "--onnx-dir", str(tmp_path / "missing"),
                "--allow-random-init",
                "--initial-prompt", "hello",
                "--out-csv", str(tmp_path / "c.csv"),
                "--out-json", str(tmp_path / "j.json"),
                "--out-summary-json", str(tmp_path / "s.json"),
            ])

    def test_pipelined_mode(self, model_dir, audio_dir, tmp_path):
        """--longform-mode pipelined: per-chunk-norm slab decoding through
        the full CLI surface (short fixture files exercise the single-slab
        path; multi-slab overlap is covered in tests/test_pipelined.py and
        measured on TPU in docs/UPLOAD_PIPELINE.md)."""
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rpipe"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--max-new-tokens", "3",
            "--longform-mode", "pipelined",
            "--slab-chunks", "2",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        jrows = json.load(open(out / "j.json"))
        assert len(jrows) == 2 and all("text" in r for r in jrows)
        s = json.load(open(out / "s.json"))
        assert s["n_files"] == 2

    def test_beam_with_timestamps(self, model_dir, audio_dir, tmp_path):
        """Beam search + timestamp grammar through the full CLI surface."""
        from whisper_tpu.bench.cli import main

        out = tmp_path / "rbts"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "6",
            "--num-beams", "2",
            "--timestamps",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        jrows = json.load(open(out / "j.json"))
        # grammar forces timestamps even under beam search
        assert "<|" in jrows[0]["text"]

    def test_write_srt_vtt_with_word_timestamps(
        self, model_dir, audio_dir, tmp_path
    ):
        """--write-srt/--write-vtt emit subtitle files next to the CSV
        (beyond-reference surface, bench/subtitles.py)."""
        from whisper_tpu.bench.cli import main

        out = tmp_path / "subs"
        rc = main([
            "--audio-dir", audio_dir,
            "--model-id", "test/whisper-nano",
            "--onnx-dir", model_dir,
            "--limit-files", "1",
            "--max-new-tokens", "4",
            "--word-timestamps",
            "--write-srt",
            "--write-vtt",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
            "--dtype", "float32",
        ])
        assert rc == 0
        srt = (out / "a_first.srt").read_text()
        vtt = (out / "a_first.vtt").read_text()
        assert vtt.startswith("WEBVTT")
        # random-weight nano model may emit no words; when it does,
        # the SRT must carry indexed arrow-time cues
        if srt.strip():
            assert srt.splitlines()[0] == "1"
            assert " --> " in srt

    def test_write_srt_requires_timing_source(self, audio_dir, tmp_path):
        from whisper_tpu.bench.cli import main

        with pytest.raises(SystemExit):
            main([
                "--audio-dir", audio_dir,
                "--model-id", "test/whisper-nano",
                "--write-srt",
                "--out-csv", str(tmp_path / "c.csv"),
            ])


class TestDCNFlags:
    def test_dcn_flags_invoke_init_distributed(self, tmp_path, monkeypatch):
        """--dcn-* flags must call parallel.mesh.init_distributed before
        any session work (SURVEY.md §5.8; real pods provide the
        coordinator — here the call itself is the contract)."""
        import struct

        import numpy as np

        from whisper_tpu.bench import cli
        from whisper_tpu.parallel import mesh

        calls = {}

        def fake_init(coordinator, num_processes, process_id):
            calls["args"] = (coordinator, num_processes, process_id)

        monkeypatch.setattr(mesh, "init_distributed", fake_init)

        audio_dir = tmp_path / "a"
        audio_dir.mkdir()
        pcm = np.zeros(16000, dtype="<i2").tobytes()
        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
            16, 1, 1, 16000, 32000, 2, 16, b"data", len(pcm))
        (audio_dir / "x.wav").write_bytes(hdr + pcm)
        out = tmp_path / "o"
        rc = cli.main([
            "--audio-dir", str(audio_dir),
            "--model-id", "test/whisper-nano",
            "--onnx-dir", str(tmp_path / "none"),
            "--allow-random-init",
            "--max-new-tokens", "2",
            "--dcn-coordinator", "10.0.0.1:1234",
            "--dcn-num-processes", "2",
            "--dcn-process-id", "0",
            "--out-csv", str(out / "c.csv"),
            "--out-json", str(out / "j.json"),
            "--out-summary-json", str(out / "s.json"),
        ])
        assert rc == 0
        assert calls["args"] == ("10.0.0.1:1234", 2, 0)


def test_discovery_roundtrip_preserves_x5_knobs(tmp_path):
    """The discovery loader must coerce the round-2 cfg keys — a tuned x5
    config (packed_cross_kv/int8_mxu_attn/streamed_mel/...) has to
    round-trip through {"best": asdict(cfg)} without silently degrading
    to x4-level behavior."""
    import dataclasses

    from whisper_tpu.runtime.session import (
        RuntimeCfg,
        load_best_cfg_from_discovery,
    )
    from whisper_tpu.variants.ladder import apply_variant

    cfg, _ = apply_variant(RuntimeCfg(mel_slab_frames=4321), "x5")
    p = tmp_path / "best.json"
    p.write_text(json.dumps({"best": dataclasses.asdict(cfg)}))
    got = load_best_cfg_from_discovery(str(p))
    for k in ("packed_cross_kv", "int8_mxu_attn", "int8_encoder_act",
              "int8_kv_cache", "int8_weights", "streamed_mel",
              "mel_slab_frames", "fused_decoder_step", "audio_transfer"):
        assert getattr(got, k) == getattr(cfg, k), k
