#!/bin/bash
# Final chained chip stage: once the stress journey is done (r3_after_queue
# log marker), run the canonical bench twice — once default, once with the
# opt-in perf knobs — recording preview rows and warming the persistent
# compile cache for the driver's round-end bench run.
# Run detached: nohup bash scripts/r3_bench_preview.sh > /tmp/r3_bench.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
LOG=${AFTER_LOG:-/tmp/r3_after.log}

until grep -q "after-queue done" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "=== bench preview (default) ==="
bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview.json || true
echo "=== bench preview (bf16 + skip_intra) ==="
BENCH_BF16_EDGES=1 BENCH_SKIP_INTRA=8 bash scripts/run_watchdog.sh python bench.py \
  | tee results/bench_r3_preview_knobs.json || true
echo "=== bench preview done ==="
