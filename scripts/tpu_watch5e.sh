#!/bin/bash
# Wait for the part-4 queue (bash scripts/tpu_round5_queue4.sh, launched
# by tpu_watch5d.sh) to exit, then launch the part-5 re-run queue exactly
# once.  Polls by PID so it never contends with serialized TPU work.
#
#   nohup setsid bash scripts/tpu_watch5e.sh <QUEUE4_WATCHER_PID> \
#     >/tmp/tpu_probe5e.log 2>&1 &
set -u
PID=${1:?pid of the watch5d/queue4 process to wait on}
cd "$(dirname "$0")/.."
while kill -0 "$PID" 2>/dev/null; do
  sleep 60
done
echo "$(date -u +%H:%M:%SZ) queue4 (pid $PID) exited — launching queue5"
touch /tmp/queue5_started
bash scripts/tpu_round5_queue5.sh /tmp/tpu_round5e.log
echo "$(date -u +%H:%M:%SZ) queue5 finished"
