#!/bin/bash
# Round-3 chip queue v2: the environment reset on 2026-08-18 wiped every
# uncommitted artifact (results/corpus/workdir checkpoints, featurization +
# pose caches, preds dirs), so the original resume queue's later stages
# would all fail on missing models.  This queue rebuilds the corpus workdir
# FIRST (corpus_journey.sh is stage-resumable) and then runs the dependent
# stages.  Supersedes scripts/r3_resume_when_tunnel.sh.
#
#   0. (assumes the lottery cache probe already ran / is running solo)
#   1. corpus journey — retrain score+confidence, held-out eval (rebuilds
#      $C/workdir used by every stage below)
#   2. bf16/skip_intra quality A/B on the held-out set
#   3. stress journey (harder apo corpus, same checkpoints)
#   4. lmax=2 3-way cost profile (no checkpoint deps)
#   5. bench previews (default + perf knobs)
#   6. affinity journey (rigid score model + parallel-4 affinity head,
#      standardized labels, lr 1e-4 — the stage-B rerun config)
#   7. compile-lottery xla_flags sweep (long; last)
# Run detached: nohup bash scripts/r3_queue_v2.sh > /tmp/r3_queue_v2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# defer to any OTHER chip client (driver bench.py / __graft_entry__ checks,
# or the still-running lottery probe): read-only /proc scan, never signals
wait_chip_free() {
  while true; do
    busy=0
    for d in /proc/[0-9]*; do
      pid=${d#/proc/}
      [ "$pid" = "$$" ] && continue
      cmd=$(tr '\0' ' ' < "$d/cmdline" 2>/dev/null)
      case "$cmd" in
        *bench.py*|*__graft_entry__*|*repro_compile_lottery*) busy=1; break;;
      esac
    done
    [ "$busy" = 0 ] && return 0
    echo "chip busy; deferring..."
    sleep 60
  done
}

while ! ss -tln 2>/dev/null | grep -q ":8082 "; do sleep 30; done
wait_chip_free

echo "=== 1. corpus journey (rebuild workdir) ==="
bash scripts/corpus_journey.sh || true

wait_chip_free
echo "=== 2. bf16/skip_intra quality A/B ==="
bash scripts/r3_ab_quality.sh || true

wait_chip_free
echo "=== 3. stress journey (hard apo corpus) ==="
bash scripts/r3_stress_journey.sh || true

wait_chip_free
echo "=== 4. lmax2 profile (3-way) ==="
python scripts/profile_lmax2.py || true

wait_chip_free
echo "=== 5. bench previews ==="
bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview.json || true
BENCH_BF16_EDGES=1 BENCH_SKIP_INTRA=8 bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview_knobs.json || true

wait_chip_free
echo "=== 6. affinity journey (standardized labels) ==="
bash scripts/affinity_journey.sh || true

wait_chip_free
echo "=== 7. lottery flag sweep ==="
TRIALS=3 CONFIGS=baseline,no_lhs,lhs_rerun python scripts/repro_compile_lottery.py || true

echo "=== r3 queue v2 done ==="
