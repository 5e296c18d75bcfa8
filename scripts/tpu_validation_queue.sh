#!/bin/bash
# Pending TPU validations (queued while the round-3 tunnel wedge blocked
# device access — CLAUDE.md "Round-3 close-out state"). Run serially on a
# healthy tunnel; each step appends to $OUT.
#
#   bash scripts/tpu_validation_queue.sh [OUT=/tmp/tpu_validation.log]
set -u
OUT=${1:-/tmp/tpu_validation.log}
cd "$(dirname "$0")/.."

step() { echo "=== $1 ($(date)) ===" | tee -a "$OUT"; }

step "0. tunnel health"
if ! timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU alive', float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))
" >>"$OUT" 2>&1; then
  echo "tunnel still unhealthy — aborting" | tee -a "$OUT"; exit 1
fi

step "1. wire probe + pcm12 same-session e2e A/B (transcript equality)"
timeout 2400 python scripts/ab_transfer.py 5 int16,pcm12 >>"$OUT" 2>&1

step "2. compilation cache on the axon backend (2nd process should skip compiles)"
for run in 1 2; do
  # NB: /usr/bin/time does not exist on this box (r5 run failed on it);
  # the python child prints its own wall totals instead.
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

step "3. trimmed serving ticks: short-stream aggregate (exercises 1/8 sub-bucket)"
timeout 3600 python scripts/serve_bench.py --streams 16 --seconds 2 \
  --variant x2 --max-new-tokens 16 --reps 2 >>"$OUT" 2>&1

step "4. headline bench sanity (BENCH_WIRE=auto, then auto-pcm)"
timeout 3600 python bench.py >>"$OUT" 2>&1
BENCH_WIRE=auto-pcm timeout 3600 python bench.py >>"$OUT" 2>&1

step "done"
tail -40 "$OUT"
