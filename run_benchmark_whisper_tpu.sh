#!/usr/bin/env bash
# One-shot bench of the headline variant (x5: bf16 + fused Pallas front end
# + int8 matmuls + int8-MXU decode attention) — the whisper_tpu analog of
# the reference's run_benchmark_without_hf_pipeline_rust.sh (S4,
# SURVEY.md §2.3).  AUDIO_DIR / ONNX_DIR / VARIANT env override.
set -euo pipefail
cd "$(dirname "$0")"

AUDIO_DIR=${AUDIO_DIR:-audio}
ONNX_DIR=${ONNX_DIR:-models/whisper-base}
VARIANT=${VARIANT:-x5}
OUT=results/benchmarks/whisper_tpu_${VARIANT}

python -m whisper_tpu.bench \
    --audio-dir "$AUDIO_DIR" \
    --onnx-dir "$ONNX_DIR" \
    --model-id "${MODEL_ID:-openai/whisper-base}" \
    ${ALLOW_RANDOM_INIT:+--allow-random-init} \
    --language en \
    --task transcribe \
    --max-new-tokens 128 \
    --variant "$VARIANT" \
    --warmup 1 \
    --write-txt \
    --out-csv "$OUT/inference_per_file.csv" \
    --out-json "$OUT/inference_per_file.json" \
    --out-summary-json "$OUT/inference_summary.json"
