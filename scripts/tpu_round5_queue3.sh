#!/bin/bash
# Round-5 TPU continuation queue, part 3 — the steps of
# tpu_round5_queue2.sh that had NOT completed when the 04:22Z window
# closed (completed + committed by then: bench_latest.json 800.91x
# @04:16Z, compile-cache re-test 48.3s->13.7s, bucket-16 device time
# 73.53 ms / 0.574 ms-per-step upper bound at B=16).
#
# The 04:22 window closed by killing profile_decode mid-TPU-call, which
# wedged the tunnel again — so this queue is launched by a probe watcher
# (scripts/tpu_watch5c.sh) only after a tiny-matmul probe succeeds.
#
#   bash scripts/tpu_round5_queue3.sh [OUT=/tmp/tpu_round5c.log]
set -u
OUT=${1:-/tmp/tpu_round5c.log}
cd "$(dirname "$0")/.."
REPO=$(pwd)

step() {
  if [ -f /tmp/queue_stop ]; then
    echo "=== queue_stop present — halting before: $1 ===" | tee -a "$OUT"
    snapshot_logs
    exit 0
  fi
  echo "=== $1 ($(date)) ===" | tee -a "$OUT"
}

snapshot_logs() {
  mkdir -p "$REPO/results/tpu_r5"
  [ -f "$OUT" ] && cp "$OUT" "$REPO/results/tpu_r5/$(basename "$OUT")"
  git -C "$REPO" add results/tpu_r5 results/bench_latest.json \
    results/benchmarks RESULTS.md RESULTS.csv 2>/dev/null
  git -C "$REPO" diff --cached --quiet 2>/dev/null || \
    git -C "$REPO" commit -q -m "r5: TPU queue evidence snapshot ($(date -u +%H:%MZ))" || true
}

step "0. tunnel health"
if ! timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU alive', float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))
" >>"$OUT" 2>&1; then
  echo "tunnel still unhealthy — aborting" | tee -a "$OUT"; exit 1
fi

step "3. enc+prefill profile (bucket 16, max_new=1 and 128)"
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 1 --out /tmp/prefill_trace >>"$OUT" 2>&1 || true
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 128 --out /tmp/decode_trace >>"$OUT" 2>&1 || true
snapshot_logs

step "2. speculative A/B (large-v3, B=16, k=4) — bf16 then production x5 config"
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 \
  >>"$OUT" 2>&1 || true
snapshot_logs
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 --int8 \
  >>"$OUT" 2>&1 || true
snapshot_logs

step "4. model scaling sweep (x5)"
timeout 7200 python scripts/model_scaling_bench.py \
  --models base,small,medium,large-v3,large-v3-turbo --reps 3 \
  >>"$OUT" 2>&1 || true
snapshot_logs

step "4b. W8A8 (x6) at large dims"
timeout 5400 python scripts/model_scaling_bench.py \
  --models large-v3 --variant x6 --reps 3 >>"$OUT" 2>&1 || true

step "4c. encoder-block fusion ladder at large dims"
timeout 5400 python scripts/bench_encoder_block.py --batch 16 --reps 10 \
  --model-id openai/whisper-large-v3 >>"$OUT" 2>&1 || true
snapshot_logs

step "5. cross-variant RESULTS rows"
mkdir -p /tmp/r5audio
python scripts/make_test_audio.py --out /tmp/r5audio/audio.wav || true
VARIANTS="x2 x4 x5" AUDIO_DIR=/tmp/r5audio SUT_NAME="axon-v5e-r5" \
  timeout 7200 bash scripts/run_tpu_benchmarks.sh >>"$OUT" 2>&1 || true
snapshot_logs

step "6. serving on the real chip: trimmed ticks, then router-fronted"
timeout 3600 python scripts/serve_bench.py --streams 64 --seconds 2 \
  --variant x5 >>"$OUT" 2>&1 || true
timeout 3600 python scripts/serve_router_drive.py >>"$OUT" 2>&1 || true
snapshot_logs

step "7. final bench re-run (post-queue, uncontended) + commit"
timeout 2400 python bench.py >>"$OUT" 2>&1 || true
snapshot_logs

step "done"
tail -60 "$OUT"
