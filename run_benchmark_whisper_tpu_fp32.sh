#!/usr/bin/env bash
# One-shot bench of the fp32 strict-parity variant (x0) — the rung the
# token-for-token contract is checked on (analog of the reference's fp32
# run, run_benchmark_without_hf_pipeline_rust.sh; S4, SURVEY.md §2.3).
set -euo pipefail
cd "$(dirname "$0")"
VARIANT=x0 exec ./run_benchmark_whisper_tpu.sh "$@"
