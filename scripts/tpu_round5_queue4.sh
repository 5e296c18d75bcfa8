#!/bin/bash
# Round-5 TPU continuation queue, part 4 — follow-ups discovered while
# part 3 ran:
#
#  * The bf16 speculative A/B arm at large-v3 B=16 OOM'd HBM (two full
#    bf16 cross caches ~7.9 GB each > 15.75 GB; queue3 log 06:51Z) and
#    the old script lost the whole invocation.  Re-run at B=8 (fits:
#    2 x 3.9 GB caches + 3.1 GB weights) with the fixed per-arm-isolated
#    script so every arm reports.
#  * A final bench_latest refresh if part 3's step 7 was skipped.
#
# Launched by scripts/tpu_watch5d.sh once the part-3 queue exits.
#
#   bash scripts/tpu_round5_queue4.sh [OUT=/tmp/tpu_round5d.log]
set -u
OUT=${1:-/tmp/tpu_round5d.log}
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

step "1. speculative A/B bf16 at B=8 (HBM-sized re-run of the OOM'd arm)"
timeout 5400 python scripts/ab_speculative.py --batch 8 --max-new 32 \
  >>"$OUT" 2>&1 || true
snapshot_logs

step "2. bench_latest refresh (driver format)"
timeout 2400 python bench.py >>"$OUT" 2>&1 || true
snapshot_logs

step "done"
tail -40 "$OUT"
