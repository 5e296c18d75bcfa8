#!/bin/bash
# Probe the wedged TPU tunnel every 45 s; when a tiny matmul succeeds,
# launch the round-5 continuation queue (tpu_round5_queue3.sh) exactly
# once and exit.  Each probe runs under its own `timeout 120` (CLAUDE.md
# wedge-recovery recipe); killing a blocked PRE-compile client is safe —
# only SIGTERM mid-TPU-call wedges the tunnel.
#
#   nohup setsid bash scripts/tpu_watch5c.sh >/tmp/tpu_probe5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
n=0
while :; do
  n=$((n+1))
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU alive', float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))
" 2>&1 | grep -q 'TPU alive'; then
    echo "$(date -u +%H:%M:%SZ) probe $n OK — launching queue3"
    touch /tmp/queue3_started
    bash scripts/tpu_round5_queue3.sh /tmp/tpu_round5c.log
    echo "$(date -u +%H:%M:%SZ) queue3 finished"
    exit 0
  fi
  echo "$(date -u +%H:%M:%SZ) probe $n failed"
  sleep 45
done
