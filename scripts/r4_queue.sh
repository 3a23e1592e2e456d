#!/bin/bash
# Round-4 chip queue — the five judge-promised artifacts plus the round-4
# quality program, ordered by value-per-minute (VERDICT.md "Next round"):
#
#   1. affinity journey        -> results/corpus/affinity_journey.json
#                                 (validates the LayerNorm affinity-head fix;
#                                 score_rigid checkpoint is committed,
#                                 cache_affinity featurization pre-warmed)
#   2. corpus journey rebuild  -> results/corpus/{workdir,heldout_eval.json}
#                                 (EPOCHS=800 + sc tie-break checkpointing +
#                                 measured sc label cutoff = the sc-quality
#                                 push; target sc<1A >= 75%, clash <= 25%)
#   3. bf16/skip quality A/B   -> results/corpus/heldout_eval_{bf16,skip,both}.json
#   4. stress journey          -> results/corpus_hard_journey.json
#   5. lmax=2 3-way profile    -> results/lmax2_cost.json
#   6. confidence ablation     -> results/corpus/confidence_ablation.json
#                                 (second seed + pose-count sensitivity)
#
# Run detached: nohup bash scripts/r4_queue.sh > /tmp/r4_queue.log 2>&1 &
#               echo $! > /tmp/r4_queue.pid
set -x
cd "$(dirname "$0")/.."

# wait (bounded) for the lottery-verification driver to release the chip
deadline=$(( $(date +%s) + 7200 ))
while kill -0 "$(cat /tmp/lottery.pid 2>/dev/null)" 2>/dev/null; do
  [ "$(date +%s)" -gt "$deadline" ] && { echo "lottery wait timed out"; break; }
  sleep 60
done

echo "=== 1. affinity journey (LayerNorm head) ==="
bash scripts/affinity_journey.sh || true

echo "=== 2. corpus journey rebuild (sc push) ==="
EPOCHS=800 bash scripts/corpus_journey.sh || true

echo "=== 3. bf16/skip quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 4. stress journey ==="
bash scripts/r3_stress_journey.sh || true

echo "=== 5. lmax2 3-way profile ==="
bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true

echo "=== 6. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r4 queue done ==="
