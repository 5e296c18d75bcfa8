#!/bin/bash
# Round-4 TPU work queue — everything that needs the real chip, runnable
# with one command the moment the tunnel recovers (the round-3 wedge cost
# >9 h of device time; CLAUDE.md recovery notes). Serial on purpose.
#
#   bash scripts/tpu_round4_queue.sh [OUT=/tmp/tpu_round4.log]
#
# Steps:
#   0. tunnel health gate
#   1. the round-3 validation debt (scripts/tpu_validation_queue.sh:
#      pcm12 e2e A/B, axon compile cache, trimmed serving, bench sanity)
#   2. batched speculative A/B at large-v3 dims (VERDICT r4 item 5)
#   3. enc+prefill re-profile at bucket 16 (where do the ~31 ms between
#      the 16.7 ms encoder and the 48 ms enc+prefill go? VERDICT item 4)
#   4. model-scaling sweep (x5, base..large-v3-turbo)
#   5. cross-variant RESULTS.md sweep rows (VERDICT item 7)
set -u
OUT=${1:-/tmp/tpu_round4.log}
cd "$(dirname "$0")/.."

step() {
  # A stop-file halts the queue between steps (so a driver bench run never
  # measures against queue contention on the device FIFO).
  if [ -f /tmp/queue_stop ]; then
    echo "=== queue_stop present — halting before: $1 ===" | tee -a "$OUT"
    exit 0
  fi
  echo "=== $1 ($(date)) ===" | tee -a "$OUT"
}

step "0. tunnel health"
if ! timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU alive', float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))
" >>"$OUT" 2>&1; then
  echo "tunnel still unhealthy — aborting" | tee -a "$OUT"; exit 1
fi

step "1. round-3 validation queue"
bash scripts/tpu_validation_queue.sh "$OUT.r3queue" || true
tail -5 "$OUT.r3queue" >>"$OUT" 2>/dev/null || true

step "2. speculative A/B (large-v3, B=16, k=4) — bf16 then production x5 config"
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 \
  >>"$OUT" 2>&1 || true
timeout 5400 python scripts/ab_speculative.py --batch 16 --max-new 32 --int8 \
  >>"$OUT" 2>&1 || true

step "3a. bucket-16 chunk program DEVICE time (delta method — hypothesis:
the '102 ms median call' carried the ~30 ms tunnel round trip; true
device time should be ~72 ms = 16.7 enc + 53.5 loop, already past the
VERDICT ≤95 ms target)"
timeout 3600 python scripts/ab_x7.py --variants x5 --batch 16 \
  --max-new 128 >>"$OUT" 2>&1 || true

step "3. enc+prefill profile (bucket 16, max_new=1 and 128)"
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 1 --out /tmp/prefill_trace >>"$OUT" 2>&1 || true
timeout 3600 python scripts/profile_decode.py --variant x5 --batch 16 \
  --max-new 128 --out /tmp/decode_trace >>"$OUT" 2>&1 || true

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

step "5. cross-variant RESULTS rows"
mkdir -p /tmp/r4audio
python scripts/make_test_audio.py --out /tmp/r4audio/audio.wav || true
VARIANTS="x2 x4 x5" AUDIO_DIR=/tmp/r4audio SUT_NAME="axon-v5e-r4" \
  timeout 7200 bash scripts/run_tpu_benchmarks.sh >>"$OUT" 2>&1 || true

step "done"
tail -60 "$OUT"
