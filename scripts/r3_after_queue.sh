#!/bin/bash
# Chained follow-up to the round-3 chip queue: wait for the resume
# orchestrator (r3_resume_when_tunnel.sh) to COMPLETE, then run the
# generalization stress journey on the chip (single-client rule: never
# overlap with the queue).
#
# Completion is detected via the orchestrator's end-of-run marker in its
# log, not a PID file: a missing PID file would fail OPEN (launch the
# stress journey concurrently with the queue), and a recycled PID would
# fail CLOSED (wait forever on an unrelated process).
# Run detached: nohup bash scripts/r3_after_queue.sh > /tmp/r3_after.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
LOG=${QUEUE_LOG:-/tmp/r3_resume.log}

until grep -q "r3 resume queue done" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "=== queue done; stress journey ==="
bash scripts/r3_stress_journey.sh
echo "=== after-queue done ==="
