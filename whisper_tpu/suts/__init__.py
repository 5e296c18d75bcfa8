"""Comparison systems-under-test (SUTs).

The reference benchmarks six SUTs side by side (SURVEY.md §0): its Rust
pipeline plus three Python comparison SUTs — HF pipeline
(benchmark_with_hf_pipeline.py), Optimum-ORT without pipeline
(benchmark_without_hf_pipeline.py), and faster-whisper
(benchmark_faster_whisper.py). This package makes those comparison rows
producible from THIS repo: each runner emits the reference's exact output
schemas into the same results tree the TPU runner uses, so one
`scripts/run_tpu_benchmarks.sh` invocation (COMPARISON_SUTS=auto) yields a
summary_table.md holding reference-format rows next to TPU rows.

Runners degrade gracefully: a missing engine dependency exits with code 3
("skip"), which the runner script reports and moves past. transformers +
torch are present in the TPU image, so the HF SUT actually runs here; the
ORT and CTranslate2 SUTs run wherever their engines are installed.
"""
