"""Results-layer tests: time-log parsing, summary table schema, RESULTS.md
marker merge, RESULTS.csv append, parity checker (ref
compare_container_benchmarks.py, update_results_md.py, compare_latencies.py)."""

import csv
import json
import os

import pytest

from whisper_tpu.results.accumulate import (
    append_results_csv,
    merge_section,
    update_results_md,
)
from whisper_tpu.results.compare import compare_per_file, print_parity
from whisper_tpu.results.summarize import (
    DEFAULT_SUTS,
    build_rows,
    extract_precision,
    extract_time_s,
    format_duration,
    write_summary_table,
)
from whisper_tpu.results.timelog import parse_elapsed, parse_time_log

TIME_LOG = """\
\tCommand being timed: "whisper_bench"
\tElapsed (wall clock) time (h:mm:ss or m:ss): 1:23.45
\tMaximum resident set size (kbytes): 2240512
"""


class TestTimeLog:
    def test_parse_elapsed_formats(self):
        assert parse_elapsed("1:23.45") == pytest.approx(83.45)
        assert parse_elapsed("2:01:05") == pytest.approx(7265.0)
        assert parse_elapsed("42.5") == 42.5
        assert parse_elapsed("") is None
        assert parse_elapsed("x:y") is None

    def test_parse_time_log(self, tmp_path):
        p = tmp_path / "t.time.txt"
        p.write_text(TIME_LOG)
        elapsed, rss = parse_time_log(str(p))
        assert elapsed == pytest.approx(83.45)
        assert rss == 2240512

    def test_missing_file(self):
        assert parse_time_log("/nope") == (None, None)


class TestSummarize:
    def test_fallback_chain(self):
        assert extract_time_s({"latency_end_to_end_s": {"p95": 1.5}}) == 1.5
        assert extract_time_s({"latency_end_to_end_s": {"median": 2.0}}) == 2.0
        assert extract_time_s({}) is None

    def test_precision_extraction(self):
        assert extract_precision(
            {"config_used": {"compute_type": "float32"}}, "x") == "fp32"
        assert extract_precision(
            {"config_used": {"dtype": "bfloat16"}}, "x") == "bf16"
        assert extract_precision(
            {"config_used": {"dtype": "bfloat16", "int8_weights": True}}, "x"
        ) == "int8"
        assert extract_precision({}, "fp32") == "fp32"

    def test_format_duration(self):
        assert format_duration(None) == "n/a"
        assert format_duration(5.4) == "5s"
        assert format_duration(83.45) == "1m23s"
        assert format_duration(3700) == "1h01m40s"

    def test_build_rows_and_write(self, tmp_path):
        rd = tmp_path / "res"
        ld = rd / "logs"
        ld.mkdir(parents=True)
        sut = rd / "whisper_tpu_bf16"
        sut.mkdir()
        (sut / "inference_summary.json").write_text(json.dumps({
            "config_used": {"dtype": "bfloat16", "int8_weights": False},
            "latency_end_to_end_s": {"p95": 0.61},
        }))
        (ld / "whisper_tpu_bf16.time.txt").write_text(TIME_LOG)

        # Absent SUTs get explicit status rows (skipped/not-run) by
        # default; a skipped.json marker upgrades "not run" to a
        # dependency-absent status.
        fw = rd / "faster_whisper_fp32"
        fw.mkdir()
        (fw / "skipped.json").write_text(json.dumps(
            {"status": "skipped", "reason": "dependency absent"}))
        all_rows = build_rows(str(rd), str(ld))
        assert len(all_rows) == len(DEFAULT_SUTS)
        by_label = {r["implementation"]: r for r in all_rows}
        assert by_label["faster-whisper (fp32)"]["time"] == (
            "skipped (dependency absent)")
        assert by_label["onnxruntime rust (no HF pipeline)"]["time"] == (
            "not run")

        rows = build_rows(str(rd), str(ld), include_missing=False)
        assert len(rows) == 1
        r = rows[0]
        assert r["implementation"] == "whisper-tpu (bf16)"
        assert r["precision"] == "bf16"
        assert r["time_s"] == 0.61
        assert r["ram_mb"] == 2188

        write_summary_table(rows, str(rd / "summary_table.md"),
                            str(rd / "summary_table.csv"))
        md = (rd / "summary_table.md").read_text()
        assert md.startswith("| Implementation | Precision | Beam size |")
        got = list(csv.DictReader(open(rd / "summary_table.csv")))
        assert got[0]["time_s"] == "0.61"
        assert list(got[0]) == ["implementation", "precision", "beam_size",
                                "time_s", "ram_mb"]


class TestAccumulate:
    def test_marker_merge_new_and_existing(self, tmp_path):
        c1 = merge_section("# Results\n", "sut:4c:4g", "## sut - 4c/4g",
                           "### Run T1\n\ntable1\n")
        assert "<!-- RESULTS:sut:4c:4g START -->" in c1
        c2 = merge_section(c1, "sut:4c:4g", "## sut - 4c/4g",
                           "### Run T2\n\ntable2\n")
        assert c2.count("<!-- RESULTS:sut:4c:4g START -->") == 1
        assert "Run T1" in c2 and "Run T2" in c2
        # another marker -> new block
        c3 = merge_section(c2, "sut:8c:4g", "## sut - 8c/4g",
                           "### Run T3\n\ntable3\n")
        assert "<!-- RESULTS:sut:8c:4g START -->" in c3

    def test_update_results_md_and_csv(self, tmp_path):
        table = tmp_path / "summary_table.md"
        table.write_text("| Implementation |\n| --- |\n| whisper-tpu |")
        scsv = tmp_path / "summary_table.csv"
        with open(scsv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=[
                "implementation", "precision", "beam_size", "time_s", "ram_mb"])
            w.writeheader()
            w.writerow({"implementation": "whisper-tpu (bf16)",
                        "precision": "bf16", "beam_size": 1,
                        "time_s": 0.61, "ram_mb": 2100})
        md = tmp_path / "RESULTS.md"
        rcsv = tmp_path / "RESULTS.csv"
        ts = update_results_md(str(md), str(table), "tpu-vm", 8, 16,
                               timestamp="2026-08-16T00:00:00")
        append_results_csv(str(rcsv), str(scsv), ts, "tpu-vm", 8, 16)

        content = md.read_text()
        assert "## tpu-vm - 8 cores / 16GB RAM" in content
        assert "### Run 2026-08-16T00:00:00" in content
        rows = list(csv.DictReader(open(rcsv)))
        assert rows[0]["sut_name"] == "tpu-vm"
        assert rows[0]["time_s"] == "0.61"
        assert list(rows[0]) == [
            "timestamp", "sut_name", "core_count", "memory_gb",
            "implementation", "precision", "beam_size", "time_s", "ram_mb",
        ]


class TestParity:
    def _rows(self, texts, times):
        return [
            {"file": f"f{i}.wav", "duration_s": 10.0,
             "end_to_end_s": t, "rtf": t / 10.0, "text": x}
            for i, (x, t) in enumerate(zip(texts, times))
        ]

    def test_parity_match_and_diff(self, tmp_path, capsys):
        ref = tmp_path / "ref.json"
        tpu = tmp_path / "tpu.json"
        ref.write_text(json.dumps(self._rows(["hello", "world"], [1.0, 2.0])))
        tpu.write_text(json.dumps(self._rows(["hello", "different"], [0.1, 0.2])))
        r = compare_per_file(str(ref), str(tpu))
        assert r["n_files"] == 2
        assert r["n_text_match"] == 1
        assert r["mismatched_files"] == ["f1.wav"]
        assert r["deltas"][0]["d_end_to_end_s"] == pytest.approx(-0.9)
        assert print_parity(str(ref), str(tpu)) == 1
        out = capsys.readouterr().out
        assert "transcript parity: 1/2" in out

    def test_parity_all_match_exit_zero(self, tmp_path):
        ref = tmp_path / "r.json"
        tpu = tmp_path / "t.json"
        ref.write_text(json.dumps(self._rows(["a"], [1.0])))
        tpu.write_text(json.dumps(self._rows(["a "], [0.5])))  # strip-equal
        assert print_parity(str(ref), str(tpu)) == 0


def test_rounds_summary_runs(tmp_path, capsys):
    """results/rounds.py: round table with wire-context columns."""
    import json as _json
    import sys

    sys.path.insert(0, ".")
    from results.rounds import main as rounds_main

    (tmp_path / "BENCH_r01.json").write_text(_json.dumps(
        {"value": 632.98, "vs_baseline": 15.1}))
    (tmp_path / "BENCH_r03.json").write_text(_json.dumps(
        {"value": 333.79, "vs_baseline": 8.0, "model_s": 0.109,
         "preprocess_s": 0.754, "wire_mbps": 12.4}))
    assert rounds_main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "r01" in out and "r03" in out
    assert "12" in out and "-" in out          # missing fields dashed
