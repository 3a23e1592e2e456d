#!/bin/bash
# Round-5 queue, take 3 — sequenced handoff after the 07:08 OOM kill broke
# r5_queue.sh's pose-generation loop (poses_id1.pkl was lost; the old queue
# would have trained the confidence model on id2 alone and then the
# conf/best_model guard would block the retrain).  This queue:
#
#   0. waits for the two in-flight chip jobs (id2 pose generation + the
#      score_ext +400-epoch extension) — starting anything else now would
#      re-trigger the OOM (the pose-gen process peaks ~80 GB on a 125 GB box)
#   A. lmax=2 3-way cost profile          -> results/lmax2_cost.json
#   B. dock_many parity: 3 cold driver-budget bench runs (current bench.py:
#      fine buckets default-on + featurize cache + overlap restructure)
#        -> results/dock_many_parity.json, results/bench_r5_default.json
#   C. corpus_journey.sh rerun — its resume logic regenerates the missing
#      poses_id1, then SC_CUT + confidence training + held-out inference +
#      eval on the FIXED conformer stack -> results/corpus/heldout_eval.json
#   D. extension chain stages 2-4 (pose ids 3/4 from score_ext, conf_ext,
#      inference, eval) -> heldout_eval.json rewrite; C's result preserved
#      as heldout_eval_ep400.json
#   E. bf16/skip quality A/B   -> results/corpus/heldout_eval_{bf16,skip,both}
#   F. affinity 2-seed rerun   -> results/corpus/affinity_journey.json v2
#   G. stress journey          -> results/corpus_hard_journey.json
#   H. confidence ablation     -> results/corpus/confidence_ablation.json
#
# Fast artifacts first (round-4 lesson: a reset/round-end must not orphan
# the quick wins behind hours-long stages).  Every stage resumes via
# output-existence guards; run the autocommit watcher alongside.
# Run detached: nohup bash scripts/r5_queue3.sh > /tmp/r5_queue3.log 2>&1 &
#               echo $! > /tmp/r5_queue3.pid
set -x
cd "$(dirname "$0")/.." || exit 1

# ---- 0. wait for the in-flight watchdogs (PIDs pinned at handoff time;
#         if a PID is gone the job already finished) ------------------------
ID2_WATCHDOG=${ID2_WATCHDOG:-21361}
EXT_WATCHDOG=${EXT_WATCHDOG:-20184}
for pid in "$ID2_WATCHDOG" "$EXT_WATCHDOG"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
echo "=== in-flight chip jobs done ==="

echo "=== A. lmax2 3-way profile ==="
if [ ! -s results/lmax2_cost.json ]; then
  bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true
fi

echo "=== B. dock_many parity (3 cold bench runs) ==="
if ! grep -q '"all_runs_have_dock_many_row": true' results/dock_many_parity.json 2>/dev/null; then
  for i in 1 2 3; do
    BENCH_BUDGET_S=600 bash scripts/run_watchdog.sh python bench.py \
      > /tmp/r5_dm3_run$i.json 2> /tmp/r5_dm3_run$i.log || true
    sleep 5
  done
  cp /tmp/r5_dm3_run1.json results/bench_r5_default.json || true
  python scripts/summarize_dock_many.py /tmp/r5_dm3_run*.json \
    > results/dock_many_parity.json || true
  cat results/dock_many_parity.json
fi

echo "=== C. corpus journey resume (id1 regen + conf + preds + eval) ==="
EPOCHS=400 bash scripts/corpus_journey.sh || true

echo "=== D. extension chain stages 2-4 ==="
bash scripts/r5_extend_sc.sh || true

echo "=== E. bf16/skip quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== F. affinity 2-seed rerun ==="
bash scripts/r5_affinity_seeds.sh || true

echo "=== G. stress journey ==="
bash scripts/r3_stress_journey.sh || true

echo "=== H. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r5 queue3 done ==="
