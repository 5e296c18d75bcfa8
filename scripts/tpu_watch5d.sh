#!/bin/bash
# Wait for the part-3 queue (bash scripts/tpu_round5_queue3.sh) to exit,
# then launch the part-4 follow-up queue exactly once.  Polls by PID so
# it never contends with the serialized TPU work while part 3 runs.
#
#   nohup setsid bash scripts/tpu_watch5d.sh <QUEUE3_PID> \
#     >/tmp/tpu_probe5d.log 2>&1 &
set -u
PID=${1:?queue3 pid}
cd "$(dirname "$0")/.."
while kill -0 "$PID" 2>/dev/null; do
  sleep 60
done
echo "$(date -u +%H:%M:%SZ) queue3 (pid $PID) exited — launching queue4"
touch /tmp/queue4_started
bash scripts/tpu_round5_queue4.sh /tmp/tpu_round5d.log
echo "$(date -u +%H:%M:%SZ) queue4 finished"
