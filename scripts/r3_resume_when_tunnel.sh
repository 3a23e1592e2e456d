#!/bin/bash
# Tunnel-outage resume orchestrator.  The axon relay (/root/.tpu_init.py)
# died at ~19:19 on 2026-08-17; every chip job hangs in connect-retry until
# the infrastructure restarts it.  This script polls for the relay's
# listening port, waits a grace period, then runs the round-3 chip queue
# serially (single-client rule — one chip job at a time).
#
# Ordered CHEAP-AND-HIGH-SIGNAL FIRST so a late tunnel return still yields
# the most artifacts before the round ends:
#   1. compile-lottery cache probe (2 compiles, ~15 min)   (judge r2 ask #2)
#   2. bf16 / skip_intra quality A/B on the held-out set   (ask #4)
#   3. lmax=2 3-way cost profile incl. the fused FC kernel (ask #8)
#   4. generalization stress journey (hard apo corpus)
#   5. bench previews (default + knobs)
#   6. affinity stage-B rerun w/ label standardization     (ask #5, long)
#   7. compile-lottery xla_flags sweep                     (ask #2, long)
# Run detached: nohup bash scripts/r3_resume_when_tunnel.sh > /tmp/r3_resume.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# defer to any OTHER chip client (notably the driver's round-end bench.py /
# __graft_entry__ compile check): read-only /proc scan, never signals
wait_chip_free() {
  while true; do
    busy=0
    for d in /proc/[0-9]*; do
      pid=${d#/proc/}
      [ "$pid" = "$$" ] && continue
      cmd=$(tr '\0' ' ' < "$d/cmdline" 2>/dev/null)
      case "$cmd" in
        *bench.py*|*__graft_entry__*) busy=1; break;;
      esac
    done
    [ "$busy" = 0 ] && return 0
    echo "chip busy (driver bench/entry check); deferring..."
    sleep 60
  done
}

while ! ss -tln 2>/dev/null | grep -q ":8082 "; do sleep 30; done
echo "=== relay is back; grace 60s ==="
sleep 60
wait_chip_free

echo "=== 1. lottery cache probe ==="
python scripts/repro_compile_lottery.py cache || true

echo "=== 2. bf16/skip_intra quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 3. lmax2 profile (3-way: lmax1 fused / lmax2 fused FC / unfused) ==="
python scripts/profile_lmax2.py || true

echo "=== 4. stress journey (hard apo corpus, existing checkpoints) ==="
bash scripts/r3_stress_journey.sh || true

echo "=== 5. bench previews ==="
bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview.json || true
BENCH_BF16_EDGES=1 BENCH_SKIP_INTRA=8 bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview_knobs.json || true

wait_chip_free
echo "=== 6. affinity stage-B rerun (standardized labels) ==="
# single source of truth for the rerun command: the standalone script
# (its r3_queue.pid wait gate no-ops when the queue process is gone)
bash scripts/r3_affinity_rerun.sh || true

wait_chip_free
echo "=== 7. lottery flag sweep ==="
TRIALS=3 CONFIGS=baseline,no_lhs,lhs_rerun python scripts/repro_compile_lottery.py || true

echo "=== r3 resume queue done ==="
