#!/bin/bash
# Round-5 chip queue — addresses VERDICT r4 asks in leverage order, cheap and
# high-signal first (r4 lesson: a reset/round-end must not orphan the fast
# artifacts behind an hours-long retrain):
#
#   1. dock_many parity: 3 cold bench runs with the round-5 driver-safe
#      bench.py (dock_many at EQUAL samples/complex + the r5 overlap
#      restructure)            -> results/dock_many_parity.json,
#                                 results/bench_r5_default.json  (asks #2,#3)
#   2. lmax=2 3-way cost profile -> results/lmax2_cost.json       (ask #6)
#   3. corpus journey EPOCHS=400 on the FIXED conformer stack
#      -> results/corpus/{heldout_eval.json,...}                  (ask #1)
#   4. bf16/skip quality A/B -> results/corpus/heldout_eval_{bf16,skip,both}
#                                                                 (ask #5 gate)
#   5. stress journey        -> results/corpus_hard_journey.json  (missing #6)
#   6. affinity 2-seed rerun -> results/corpus/affinity_journey.json v2
#                                                                 (ask #8)
#   7. confidence ablation   -> results/corpus/confidence_ablation.json
#
# Stages 4,5,7 depend on stage 3's checkpoints; 6 only needs the committed
# score_rigid.  Every stage resumes (output-existence guards inside each
# script); run the autocommit watcher alongside.
# Run detached: nohup bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
#               echo $! > /tmp/r5_queue.pid
set -x
cd "$(dirname "$0")/.." || exit 1

echo "=== 1. dock_many parity (3 cold bench runs) ==="
if [ ! -s results/dock_many_parity.json ] || \
   ! grep -q '"n_runs": 3' results/dock_many_parity.json; then
  for i in 1 2 3; do
    BENCH_DOCK_MANY=1 BENCH_BUDGET_S=420 bash scripts/run_watchdog.sh \
      python bench.py \
      > /tmp/r5_dm_run$i.json 2> /tmp/r5_dm_run$i.log || true
    sleep 5
  done
  cp /tmp/r5_dm_run1.json results/bench_r5_default.json || true
  python scripts/summarize_dock_many.py /tmp/r5_dm_run*.json \
    > results/dock_many_parity.json || true
  cat results/dock_many_parity.json
fi

echo "=== 2. lmax2 3-way profile ==="
if [ ! -s results/lmax2_cost.json ]; then
  bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true
fi

echo "=== 3. corpus journey (fixed conformers, EPOCHS=400) ==="
EPOCHS=400 bash scripts/corpus_journey.sh || true

echo "=== 4. bf16/skip quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 5. stress journey ==="
bash scripts/r3_stress_journey.sh || true

echo "=== 6. affinity 2-seed rerun ==="
bash scripts/r5_affinity_seeds.sh || true

echo "=== 7. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r5 queue done ==="
