#!/bin/bash
# Tunnel-recovery watcher (the round-3/4/5 wedge playbook, CLAUDE.md):
# probe the TPU every 45 s, each probe under its own `timeout 120`; the
# moment a probe succeeds, launch the given queue script exactly once.
#
#   bash scripts/tpu_probe_watch.sh [QUEUE=scripts/tpu_round5_queue2.sh] [LOG=/tmp/tpu_probe.log]
#
# Writes /tmp/tpu_alive on each successful probe and /tmp/queue_started
# when the queue is launched (so a second watcher never double-launches).
set -u
QUEUE=${1:-scripts/tpu_round5_queue2.sh}
LOG=${2:-/tmp/tpu_probe.log}
cd "$(dirname "$0")/.."

n=0
while true; do
  n=$((n + 1))
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU alive', float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))
" >>"$LOG" 2>&1; then
    date -u +"%H:%M:%SZ probe $n OK" | tee -a "$LOG"
    touch /tmp/tpu_alive
    if [ ! -f /tmp/queue_started ]; then
      touch /tmp/queue_started
      echo "launching $QUEUE" | tee -a "$LOG"
      bash "$QUEUE"
      echo "queue finished rc=$?" | tee -a "$LOG"
    fi
    exit 0
  fi
  date -u +"%H:%M:%SZ probe $n failed" >>"$LOG"
  sleep 45
done
