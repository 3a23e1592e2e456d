#!/bin/bash
# Tunnel-outage resume orchestrator.  The axon relay (/root/.tpu_init.py)
# died at ~19:19; every chip job hangs in connect-retry until the
# infrastructure restarts it.  This script polls for the relay's listening
# ports, waits a grace period, then runs the round-3 chip queue serially
# (single-client rule — one chip job at a time):
#   1. compile-lottery cache probe + flag sweep   (judge r2 ask #2)
#   2. affinity stage-B rerun w/ label standardization (ask #5)
#   3. bf16 / skip_intra quality A/B on the corpus held-out set (ask #4)
#   4. lmax=2 cost profile, now 3-way incl. the fused FC kernel (ask #8)
# Run detached: nohup bash scripts/r3_resume_when_tunnel.sh > /tmp/r3_resume.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while ! ss -tln 2>/dev/null | grep -q ":8082 "; do sleep 30; done
echo "=== relay is back; grace 60s ==="
sleep 60

echo "=== 1a. lottery cache probe ==="
python scripts/repro_compile_lottery.py cache || true
echo "=== 1b. lottery flag sweep ==="
TRIALS=3 CONFIGS=baseline,no_lhs,lhs_rerun python scripts/repro_compile_lottery.py || true

echo "=== 2. affinity stage-B rerun (standardized labels) ==="
# single source of truth for the rerun command: the standalone script
# (its r3_queue.pid wait gate no-ops when the queue process is gone)
bash scripts/r3_affinity_rerun.sh || true

echo "=== 3. bf16/skip_intra quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 4. lmax2 profile (3-way: lmax1 fused / lmax2 fused FC / unfused) ==="
python scripts/profile_lmax2.py || true

echo "=== r3 resume queue done ==="
