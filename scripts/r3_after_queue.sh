#!/bin/bash
# Chained follow-up to the round-3 chip queue: wait for the resume
# orchestrator (r3_resume_when_tunnel.sh) to finish, then run the
# generalization stress journey on the chip.
# Run detached: nohup bash scripts/r3_after_queue.sh > /tmp/r3_after.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while kill -0 "$(cat /tmp/r3_resume.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== queue done; stress journey ==="
bash scripts/r3_stress_journey.sh
echo "=== after-queue done ==="
