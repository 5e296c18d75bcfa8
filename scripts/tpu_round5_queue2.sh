#!/bin/bash
# Round-5 TPU continuation queue — the steps of tpu_round5_queue.sh that
# had NOT yet run when the 02:44Z session window closed (steps 0b and 1
# completed and are committed: bench_latest.json 1112.84x, pcm12 A/B,
# trimmed serving, wire probes).  Re-runnable: starts with a fresh
# driver-format bench (cheap, wedge-proof evidence per VERDICT r4 item 2)
# and then works through the remaining validation debt in
# highest-evidence-value-first order.
#
#   bash scripts/tpu_round5_queue2.sh [OUT=/tmp/tpu_round5b.log]
set -u
OUT=${1:-/tmp/tpu_round5b.log}
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

step "0b. driver-format bench (fresh window; commit latest-good)"
timeout 2400 python bench.py >>"$OUT" 2>&1 || true
snapshot_logs

step "1. compile-cache re-test (r3 debt; /usr/bin/time absent on this box)"
for run in 1 2; do
  timeout 1800 python - >>"$OUT" 2>&1 <<'EOF'
import time, numpy as np
t_start = time.perf_counter()
from whisper_tpu.utils.compilecache import enable_compilation_cache
print("cache dir:", enable_compilation_cache())
from whisper_tpu.models.convert import init_params
from whisper_tpu.models.registry import get_dims
from whisper_tpu.runtime.session import RuntimeCfg, WhisperSession
dims = get_dims("test/whisper-nano")
sess = WhisperSession(init_params(dims, seed=0), dims, RuntimeCfg(dtype="float32", max_batch=2))
t0 = time.perf_counter()
rng = np.random.default_rng(0)
mel = rng.normal(0, 0.5, (2, dims.n_mels, 3000)).astype(np.float32)
sess.transcribe_chunks(mel, prompt=[3], max_new_tokens=4, eot_id=2)
print(f"first transcribe (incl. compile): {time.perf_counter()-t0:.1f}s; "
      f"process total: {time.perf_counter()-t_start:.1f}s")
EOF
done
snapshot_logs

step "3a. bucket-16 chunk program DEVICE time (delta method; VERDICT r4 item 3)"
timeout 3600 python scripts/ab_x7.py --variants x5 --batch 16 \
  --max-new 128 >>"$OUT" 2>&1 || true

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
