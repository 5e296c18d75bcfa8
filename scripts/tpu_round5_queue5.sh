#!/bin/bash
# Round-5 TPU continuation queue, part 5 — re-runs of the four queue3
# steps that failed for fixable reasons (results/tpu_r5/tpu_round5c.log):
#
#  * steps 4/4b died on bare model ids ('base', 'large-v3') — the
#    registry now aliases them (models/registry.py get_dims).
#  * step 4c died on a Mosaic layout mismatch for 1D bf16[5120] bias
#    operands at large-v3 dims — the fused encoder kernels now take
#    [1, n] 2D vector operands (ops/encoder_mlp.py, ops/encoder_block.py).
#    Step 1 below re-checks base dims first: the promoted fused-MLP rung
#    has device history (21.1 -> 16.7 ms) that must not regress under the
#    2D-operand change.
#  * step 6's router-fronted drive died because the server subprocess's
#    PYTHONPATH was clobbered, losing the axon plugin — now prepended
#    (scripts/serve_router_drive.py).
#
# Launched by scripts/tpu_watch5e.sh once the part-4 queue exits.
#
#   bash scripts/tpu_round5_queue5.sh [OUT=/tmp/tpu_round5e.log]
set -u
OUT=${1:-/tmp/tpu_round5e.log}
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
  echo "tunnel unhealthy — aborting" | tee -a "$OUT"; exit 1
fi

step "1. encoder-kernel regression check at base (2D-operand change)"
timeout 3600 python scripts/bench_encoder_block.py --batch 16 --reps 10 \
  --skip-full >>"$OUT" 2>&1 || true
snapshot_logs

step "2. encoder-block fusion ladder at large-v3 (fixed Mosaic layout)"
timeout 5400 python scripts/bench_encoder_block.py --batch 16 --reps 10 \
  --model-id openai/whisper-large-v3 --skip-full >>"$OUT" 2>&1 || true
snapshot_logs

step "3. model scaling sweep (x5, fixed ids)"
timeout 7200 python scripts/model_scaling_bench.py \
  --models base,small,medium,large-v3,large-v3-turbo --reps 3 \
  >>"$OUT" 2>&1 || true
snapshot_logs

step "4. W8A8 (x6) at large dims"
timeout 5400 python scripts/model_scaling_bench.py \
  --models large-v3 --variant x6 --reps 3 >>"$OUT" 2>&1 || true
snapshot_logs

step "4b. serving aggregate at r2 scale (64x30s, trimmed ticks)"
timeout 5400 python scripts/serve_bench.py --streams 64 --seconds 30 \
  --variant x5 >>"$OUT" 2>&1 || true
snapshot_logs

step "5. router-fronted serving drive (fixed PYTHONPATH)"
timeout 3600 python scripts/serve_router_drive.py --streams 16 \
  --seconds 2 --variant x5 >>"$OUT" 2>&1 || true
snapshot_logs

step "6. bench_latest refresh (driver format)"
timeout 2400 python bench.py >>"$OUT" 2>&1 || true
snapshot_logs

step "done"
tail -40 "$OUT"
