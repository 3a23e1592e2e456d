#!/bin/bash
# Round-4 chip queue v3 — relaunched after the 2026-08-19 18:24 host reset.
# Reordered CHEAP-AND-HIGH-SIGNAL FIRST (the corpus retrain is hours long and
# a reset/round-end must not orphan the fast artifacts behind it):
#
#   1. bench matrix + 5-run determinism verification (~40 min)
#      -> results/bench_r4_*.json, results/lottery_verification.json
#   2. lmax=2 3-way cost profile (~15 min)  -> results/lmax2_cost.json
#   3. corpus journey EPOCHS=400 (hours)
#      -> results/corpus/{workdir,heldout_eval.json,corpus_journey.json}
#   4. bf16/skip quality A/B   -> results/corpus/heldout_eval_{bf16,skip,both}.json
#   5. stress journey          -> results/corpus_hard_journey.json
#   6. confidence ablation     -> results/corpus/confidence_ablation.json
#
# Stages 4-6 depend on stage 3's checkpoints; the autocommit watcher commits
# each milestone as it appears, so a reset resumes from the last stage.
# Run detached: nohup bash scripts/r4_queue3.sh > /tmp/r4_queue3.log 2>&1 &
#               echo $! > /tmp/r4_queue3.pid
set -x
cd "$(dirname "$0")/.." || exit 1 || exit 1

echo "=== 1. bench matrix + lottery verification ==="
bash scripts/r4_bench_matrix.sh || true

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

echo "=== 6. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r4 queue v3 done ==="
