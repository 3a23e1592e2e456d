#!/bin/bash
# Round-5 follow-up queue — runs after r5_queue.sh exits (its affinity +
# ablation stages are deferred via /tmp/r5_defer so the high-leverage
# side-chain extension gets the chip first).  Fast artifacts first (round-4
# lesson: never orphan quick wins behind an hours-long retrain):
#
#   1. dock_many parity: 3 cold driver-budget bench runs
#        -> results/dock_many_parity.json, results/bench_r5_default.json
#   2. lmax=2 3-way cost profile (OOM-aware) -> results/lmax2_cost.json
#   3. side-chain extension chain (+EPOCHS2 epochs, conf, inference, eval)
#        -> results/corpus/heldout_eval.json rewrite
#   4. affinity 2-seed rerun -> results/corpus/affinity_journey.json v2
#   5. confidence ablation -> results/corpus/confidence_ablation.json
#
# Run detached: nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
#               echo $! > /tmp/r5_queue2.pid
set -x
cd "$(dirname "$0")/.." || exit 1
rm -f /tmp/r5_defer

echo "=== 1. dock_many parity (3 cold bench runs) ==="
if [ ! -s results/dock_many_parity.json ] || \
   ! grep -q '"all_runs_have_dock_many_row": true' results/dock_many_parity.json; then
  for i in 1 2 3; do
    BENCH_BUDGET_S=600 bash scripts/run_watchdog.sh python bench.py \
      > /tmp/r5_dm2_run$i.json 2> /tmp/r5_dm2_run$i.log || true
    sleep 5
  done
  cp /tmp/r5_dm2_run1.json results/bench_r5_default.json || true
  python scripts/summarize_dock_many.py /tmp/r5_dm2_run*.json \
    > results/dock_many_parity.json || true
  cat results/dock_many_parity.json
fi

echo "=== 2. lmax2 3-way profile ==="
if [ ! -s results/lmax2_cost.json ]; then
  bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true
fi

# (the side-chain extension chain runs concurrently with the r5_queue's
# CPU-bound filtering featurization — launched separately, see /tmp/r5_extend.log;
# its stages resume via output-existence guards if relaunched)
echo "=== 3. affinity 2-seed rerun ==="
bash scripts/r5_affinity_seeds.sh || true

echo "=== 4. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r5 queue2 done ==="
