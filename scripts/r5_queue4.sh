#!/bin/bash
# Round-5 queue, take 4 — post-reset rebuild.  The host reset at ~21:25 wiped
# /tmp, the jax persistent compile cache, the bench featurize cache and every
# uncommitted pose cache; queue3's in-flight jobs died with it.  This queue
# re-establishes the chip evidence in judge-priority order:
#
#   A. dock_many parity: 3 cold driver-budget bench runs (the warm run that
#      rebuilds the caches runs BEFORE this queue; we wait for it)
#        -> results/dock_many_parity.json, results/bench_r5_default.json
#   B. lmax=2 3-way cost profile -> results/lmax2_cost.json
#   C. wait for the corpus journey (launched separately, niced: pose gen +
#      confidence + heldout inference + eval -> results/corpus/heldout_eval.json)
#   D. affinity 2-seed rerun     -> results/corpus/affinity_journey.json v2
#   E. stress journey            -> results/corpus_hard_journey.json
#   F. confidence ablation       -> results/corpus/confidence_ablation.json
#
# Every stage resumes via output-existence guards; run the autocommit watcher
# alongside.  Run detached:
#   nohup bash scripts/r5_queue4.sh > /tmp/r5_queue4.log 2>&1 &
#   echo $! > /tmp/r5_queue4.pid
set -x
cd "$(dirname "$0")/.." || exit 1

wait_pidfile() {
  local f=$1
  [ -f "$f" ] || return 0
  local pid
  pid=$(cat "$f")
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

echo "=== waiting for the cache-warming bench run ==="
wait_pidfile /tmp/bench_warm.pid

echo "=== A. dock_many parity (3 cold bench runs) ==="
if ! grep -q '"all_runs_have_dock_many_row": true' results/dock_many_parity.json 2>/dev/null; then
  for i in 1 2 3; do
    BENCH_BUDGET_S=600 bash scripts/run_watchdog.sh python bench.py \
      > /tmp/r5_dm4_run$i.json 2> /tmp/r5_dm4_run$i.log || true
    sleep 5
  done
  cp /tmp/r5_dm4_run1.json results/bench_r5_default.json || true
  python scripts/summarize_dock_many.py /tmp/r5_dm4_run*.json \
    > results/dock_many_parity.json || true
  cat results/dock_many_parity.json
fi

echo "=== B. lmax2 3-way profile ==="
if [ ! -s results/lmax2_cost.json ]; then
  bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true
fi

echo "=== C. waiting for the corpus journey ==="
wait_pidfile /tmp/r5_journey.pid

echo "=== D. affinity 2-seed rerun ==="
bash scripts/r5_affinity_seeds.sh || true

echo "=== E. stress journey ==="
bash scripts/r3_stress_journey.sh || true

echo "=== F. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r5 queue4 done ==="
