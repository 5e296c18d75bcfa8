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
#   COMPARISON_SUTS comparison SUT runners to attempt alongside the TPU SUT
#                   ("auto" = hf_pipeline python_ort faster_whisper; ""=none).
#                   Each runner emits reference-schema rows or exits with the
#                   skip code 3 when its engine isn't installed, so one
#                   invocation yields a summary_table.md with both
#                   reference-format rows and TPU rows (whisper_tpu/suts/).
#   COMPARISON_MODEL_DIR  model assets for the comparison SUTs (default:
#                   MODEL_ID + --allow-random-init where supported)
#   CPUSET          pin every SUT to these host cores via taskset, e.g.
#                   "0-3" (the reference's docker --cpuset-cpus,
#                   run_container_benchmarks.sh:95-98)
#   MEMORY_CAP_GB   cap each SUT's host address space via ulimit -v (the
#                   reference's docker --memory; MaxRSS rows then reflect
#                   a capped run like the reference's do)
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
CPUSET=${CPUSET:-}
MEMORY_CAP_GB=${MEMORY_CAP_GB:-}
COMPARISON_SUTS=${COMPARISON_SUTS:-}
COMPARISON_MODEL_DIR=${COMPARISON_MODEL_DIR:-}
if [ "$COMPARISON_SUTS" = "auto" ]; then
  COMPARISON_SUTS="hf_pipeline python_ort faster_whisper"
fi

mkdir -p "$OUT_ROOT/logs"

# Resource caps (reference: docker --cpuset-cpus/--memory; here taskset +
# ulimit -v in a subshell so every SUT row is measured under the same cap).
capped() {
  local ULIMIT_CMD=""
  if [ -n "$MEMORY_CAP_GB" ]; then
    ULIMIT_CMD="ulimit -v $((MEMORY_CAP_GB * 1024 * 1024));"
  fi
  if [ -n "$CPUSET" ]; then
    bash -c "$ULIMIT_CMD exec taskset -c $CPUSET \"\$@\"" _ "$@"
  else
    bash -c "$ULIMIT_CMD exec \"\$@\"" _ "$@"
  fi
}

variant_subdir() {
  case "$1" in
    x0|x1) echo "whisper_tpu_fp32" ;;
    x4|int8) echo "whisper_tpu_int8" ;;
    x5|x6) echo "whisper_tpu_int8_mxu" ;;
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
    capped python -m whisper_tpu.results.timed_run "$OUT_ROOT/logs/$SUB.time.txt" -- \
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

  # Comparison SUTs (reference P1-P3 counterparts, whisper_tpu/suts/).
  # rc=3 means "engine not installed" — report and continue.
  run_comparison_sut() {
    local MODULE="$1" SUBDIR="$2"; shift 2
    local OUT_DIR="$OUT_ROOT/$SUBDIR"
    mkdir -p "$OUT_DIR"
    local CMP_ARGS=(--audio-dir "$AUDIO_DIR" --model-id "$MODEL_ID"
                    --language "$LANGUAGE" --task "$TASK"
                    --max-new-tokens "$MAX_NEW_TOKENS" --warmup "$WARMUP"
                    --limit-files "$LIMIT_FILES" --num-beams "$NUM_BEAMS"
                    --write-txt
                    --out-csv "$OUT_DIR/inference_per_file.csv"
                    --out-json "$OUT_DIR/inference_per_file.json"
                    --out-summary-json "$OUT_DIR/inference_summary.json")
    if [ -n "$COMPARISON_MODEL_DIR" ]; then
      CMP_ARGS+=(--model-dir "$COMPARISON_MODEL_DIR")
    fi
    echo "== comparison SUT $MODULE -> $OUT_DIR"
    set +e
    capped python -m whisper_tpu.results.timed_run "$OUT_ROOT/logs/$SUBDIR.time.txt" -- \
      python -m "whisper_tpu.suts.$MODULE" "${CMP_ARGS[@]}" "$@"
    local RC=$?
    set -e
    if [ "$RC" = "3" ]; then
      echo "   skipped (engine not installed)"
      rm -f "$OUT_ROOT/logs/$SUBDIR.time.txt"
    elif [ "$RC" != "0" ]; then
      echo "   FAILED rc=$RC" >&2
      return "$RC"
    fi
  }
  for SUT in $COMPARISON_SUTS; do
    case "$SUT" in
      hf_pipeline)
        HF_ARGS=()
        [ -z "$COMPARISON_MODEL_DIR" ] && HF_ARGS+=(--allow-random-init)
        run_comparison_sut hf_pipeline with_hf_pipeline "${HF_ARGS[@]}" ;;
      python_ort)
        run_comparison_sut python_ort without_hf_pipeline_py ;;
      faster_whisper)
        run_comparison_sut faster_whisper_sut faster_whisper_fp32 \
          --compute-type float32
        run_comparison_sut faster_whisper_sut faster_whisper_int8 \
          --compute-type int8 ;;
      *) echo "unknown comparison SUT: $SUT" >&2; exit 2 ;;
    esac
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
