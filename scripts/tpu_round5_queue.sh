#!/bin/bash
# Round-5 TPU work queue — two rounds of validation debt plus round-5
# additions, runnable with one command the moment the tunnel recovers
# (the round-3 wedge cost >9 h, the round-4 wedge >12 h; CLAUDE.md
# recovery notes).  Serial on purpose: concurrent clients through the
# tunnel wedge it.
#
#   bash scripts/tpu_round5_queue.sh [OUT=/tmp/tpu_round5.log]
#
# Evidence is WEDGE-PROOFED (VERDICT r4 items 1+2): step 0b runs the
# driver-format bench FIRST and commits results/bench_latest.json + the
# running log into git immediately, so a later re-wedge can no longer
# erase the round's perf evidence.  Steps:
#   0.  tunnel health gate
#   0b. EARLY driver-format bench -> results/bench_latest.json, committed
#   1.  round-3 validation debt (pcm12 A/B, compile cache, trimmed
#       serving, bench sanity — scripts/tpu_validation_queue.sh)
#   2.  speculative A/B at large-v3 dims (now with the K+1 bonus-token
#       verify; VERDICT r4 item 4)
#   3.  enc+prefill re-profile at bucket 16 (VERDICT r4 item 3)
#   4.  model-scaling sweep + x6/encoder-block at large dims
#   5.  cross-variant RESULTS.md rows (VERDICT r4 item 5)
#   6.  serving on the real chip: trimmed-tick serve_bench + a
#       router-fronted run (VERDICT r4 item 7)
#   7.  copy logs into results/tpu_r5/ and commit everything
set -u
OUT=${1:-/tmp/tpu_round5.log}
cd "$(dirname "$0")/.."
REPO=$(pwd)

step() {
  # A stop-file halts the queue between steps (so a driver bench run never
  # measures against queue contention on the device FIFO).
  if [ -f /tmp/queue_stop ]; then
    echo "=== queue_stop present — halting before: $1 ===" | tee -a "$OUT"
    snapshot_logs
    exit 0
  fi
  echo "=== $1 ($(date)) ===" | tee -a "$OUT"
}

snapshot_logs() {
  # Mirror the evidence into the repo so even an end-of-turns driver
  # commit captures it.
  mkdir -p "$REPO/results/tpu_r5"
  for f in "$OUT" "$OUT.r3queue"; do
    [ -f "$f" ] && cp "$f" "$REPO/results/tpu_r5/$(basename "$f")"
  done
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

step "0b. EARLY driver-format bench (wedge-proof evidence; commit latest-good)"
timeout 2400 python bench.py >>"$OUT" 2>&1 || true
snapshot_logs

step "1. round-3 validation queue"
bash scripts/tpu_validation_queue.sh "$OUT.r3queue" || true
tail -5 "$OUT.r3queue" >>"$OUT" 2>/dev/null || true
snapshot_logs

step "2. speculative A/B (large-v3, B=16, k=4) — bf16 then production x5 config"
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 \
  >>"$OUT" 2>&1 || true
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 --int8 \
  >>"$OUT" 2>&1 || true
snapshot_logs

step "3a. bucket-16 chunk program DEVICE time (delta method — hypothesis:
the '102 ms median call' carried the ~30 ms tunnel round trip; true
device time should be ~72 ms = 16.7 enc + 53.5 loop, already past the
VERDICT <=95 ms target)"
timeout 3600 python scripts/ab_x7.py --variants x5 --batch 16 \
  --max-new 128 >>"$OUT" 2>&1 || true

step "3. enc+prefill profile (bucket 16, max_new=1 and 128)"
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 1 --out /tmp/prefill_trace >>"$OUT" 2>&1 || true
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 128 --out /tmp/decode_trace >>"$OUT" 2>&1 || true
snapshot_logs

step "4. model scaling sweep (x5)"
timeout 7200 python scripts/model_scaling_bench.py \
  --models base,small,medium,large-v3,large-v3-turbo --reps 3 \
  >>"$OUT" 2>&1 || true

step "4b. W8A8 (x6) at large dims (negative at base/medium — ROADMAP
predicts the int8 MXU rate finally beats the dynamic-quantize VPU cost
at d=1280)"
timeout 5400 python scripts/model_scaling_bench.py \
  --models large-v3 --variant x6 --reps 3 >>"$OUT" 2>&1 || true

step "4c. encoder-block fusion ladder at large dims (the d=512 negative
— extra pallas boundaries lose cross-op overlap — may flip at d=1280
where per-layer HBM intermediates are 6x bigger; ops/encoder_block.py)"
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
