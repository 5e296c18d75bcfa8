#!/usr/bin/env bash
# One-shot OpenAI-compatible transcription server (docs/HTTP_API.md).
# MODEL_DIR or MODEL_ID env select the model; PORT defaults to 8000.
set -euo pipefail
cd "$(dirname "$0")"

python -m whisper_tpu.serve.http_server \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} \
    --model-id "${MODEL_ID:-openai/whisper-base}" \
    ${ALLOW_RANDOM_INIT:+--allow-random-init} \
    --variant "${VARIANT:-x4}" \
    --port "${PORT:-8000}" "$@"
