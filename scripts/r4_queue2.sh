#!/bin/bash
# Round-4 chip queue v2 — relaunched after the conformer-floor fix
# (see ROADMAP.md "Round-4 course correction").  Order = value-per-minute:
#
#   1. corpus journey EPOCHS=400  -> results/corpus/{workdir,heldout_eval.json}
#      (clean CACHE_VERSION=2 featurization; sc tie-break checkpoints +
#      measured sc label cutoff; targets: 12/12 lig kept, sc<1A >= 75%,
#      top-1 clash <= 25%)
#   2. bench matrix + 5-run determinism verification
#      -> results/bench_r4_*.json, results/lottery_verification.json
#   3. bf16/skip quality A/B     -> results/corpus/heldout_eval_{bf16,skip,both}.json
#   4. lmax=2 3-way cost profile -> results/lmax2_cost.json
#   5. stress journey            -> results/corpus_hard_journey.json
#   6. confidence ablation       -> results/corpus/confidence_ablation.json
#
# Run detached: nohup bash scripts/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
#               echo $! > /tmp/r4_queue2.pid
set -x
cd "$(dirname "$0")/.."

echo "=== 1. corpus journey (fixed conformers, EPOCHS=400) ==="
EPOCHS=400 bash scripts/corpus_journey.sh || true

echo "=== 2. bench matrix + lottery verification ==="
bash scripts/r4_bench_matrix.sh || true

echo "=== 3. bf16/skip quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 4. lmax2 3-way profile ==="
bash scripts/run_watchdog.sh python scripts/profile_lmax2.py || true

echo "=== 5. stress journey ==="
bash scripts/r3_stress_journey.sh || true

echo "=== 6. confidence ablation ==="
bash scripts/confidence_ablation.sh || true

echo "=== r4 queue v2 done ==="
