#!/usr/bin/env bash
# TPU benchmark runner — the framework's analog of the reference's
# container benchmark orchestration (run_container_benchmarks.sh +
# scripts/run_container_benchmarks_inner.sh): runs the TPU SUT variants
# under a GNU-time-compatible wrapper, builds the cross-SUT summary table,
# and merges the run into the append-only RESULTS.md / RESULTS.csv history.
#
# Env knobs (mirroring the reference's surface where meaningful on TPU):
#   AUDIO_DIR       audio directory                  (default: audio)
#   MODEL_DIR       framework model dir              (default: "" -> random init)
#   MODEL_ID        model id for random init         (default: openai/whisper-base)
#   VARIANTS        space-separated ladder rungs     (default: "x2 x4")
#   LANGUAGE/TASK/MAX_NEW_TOKENS/WARMUP/LIMIT_FILES  as in the CLI
#   NUM_BEAMS       beam width                       (default: 1)
#   OUT_ROOT        results root                     (default: results/benchmarks/tpu)
#   SUT_NAME        results history key              (default: hostname)
#   CORE_COUNT/MEMORY_GB  history metadata           (default: nproc / MemTotal)
#   MERGE_ONLY=1    rebuild summary + history from existing outputs
set -euo pipefail

AUDIO_DIR=${AUDIO_DIR:-audio}
MODEL_DIR=${MODEL_DIR:-}
MODEL_ID=${MODEL_ID:-openai/whisper-base}
VARIANTS=${VARIANTS:-"x2 x4"}
LANGUAGE=${LANGUAGE:-en}
TASK=${TASK:-transcribe}
MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-128}
WARMUP=${WARMUP:-1}
LIMIT_FILES=${LIMIT_FILES:-0}
NUM_BEAMS=${NUM_BEAMS:-1}
OUT_ROOT=${OUT_ROOT:-results/benchmarks/tpu}
SUT_NAME=${SUT_NAME:-$(hostname)}
CORE_COUNT=${CORE_COUNT:-$(nproc)}
MEMORY_GB=${MEMORY_GB:-$(awk '/MemTotal/ {printf "%d", $2/1048576}' /proc/meminfo)}
MERGE_ONLY=${MERGE_ONLY:-0}

mkdir -p "$OUT_ROOT/logs"

variant_subdir() {
  case "$1" in
    x0|x1) echo "whisper_tpu_fp32" ;;
    x4|int8) echo "whisper_tpu_int8" ;;
    *) echo "whisper_tpu_bf16" ;;
  esac
}

if [ "$MERGE_ONLY" != "1" ]; then
  for VARIANT in $VARIANTS; do
    SUB=$(variant_subdir "$VARIANT")
    OUT_DIR="$OUT_ROOT/$SUB"
    mkdir -p "$OUT_DIR"
    MODEL_ARGS=()
    if [ -n "$MODEL_DIR" ]; then
      MODEL_ARGS+=(--onnx-dir "$MODEL_DIR")
    else
      MODEL_ARGS+=(--onnx-dir "$OUT_ROOT/.no-model" --allow-random-init)
    fi
    echo "== SUT whisper-tpu variant=$VARIANT -> $OUT_DIR"
    python -m whisper_tpu.results.timed_run "$OUT_ROOT/logs/$SUB.time.txt" -- \
      python -m whisper_tpu.bench \
        --audio-dir "$AUDIO_DIR" \
        --model-id "$MODEL_ID" \
        "${MODEL_ARGS[@]}" \
        --language "$LANGUAGE" --task "$TASK" \
        --max-new-tokens "$MAX_NEW_TOKENS" \
        --warmup "$WARMUP" --limit-files "$LIMIT_FILES" \
        --num-beams "$NUM_BEAMS" \
        --variant "$VARIANT" \
        --write-txt \
        --out-csv "$OUT_DIR/inference_per_file.csv" \
        --out-json "$OUT_DIR/inference_per_file.json" \
        --out-summary-json "$OUT_DIR/inference_summary.json"
  done
fi

python -m whisper_tpu.results.summarize \
  --results-dir "$OUT_ROOT" --log-dir "$OUT_ROOT/logs" \
  --out-md "$OUT_ROOT/summary_table.md" --out-csv "$OUT_ROOT/summary_table.csv"

python -m whisper_tpu.results.accumulate \
  --summary-table "$OUT_ROOT/summary_table.md" \
  --summary-csv "$OUT_ROOT/summary_table.csv" \
  --sut-name "$SUT_NAME" --core-count "$CORE_COUNT" --memory-gb "$MEMORY_GB"

echo "Done. Summary: $OUT_ROOT/summary_table.md; history: RESULTS.md / RESULTS.csv"
