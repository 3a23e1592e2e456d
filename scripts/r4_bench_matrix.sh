#!/bin/bash
# Round-4 perf matrix under the step-loop sampler (VERDICT r3 ask #5:
# >= 8.5 poses/s as the default config with a quality A/B behind every
# enabled knob).  Variants, cheapest-signal first:
#
#   base       step-loop default                  -> results/bench_r4_base.json
#   knobs      + bf16_edge_attr + skip_intra 8    -> results/bench_r4_knobs.json
#   fine       + fine buckets (lig 48 / rec 160)  -> results/bench_r4_fine.json
#   all        knobs + fine                       -> results/bench_r4_all.json
#   batch40    one 40-sample chunk (vs 2x20)      -> results/bench_r4_b40.json
#
# Then the 5-cold-run determinism verification at the default config
# -> results/lottery_verification.json (round-2 judge criterion: within 10%).
# Run detached: nohup bash scripts/r4_bench_matrix.sh > /tmp/r4_matrix.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

run() {  # name env...
  local name=$1; shift
  if [ ! -s results/bench_r4_$name.json ]; then
    env "$@" bash scripts/run_watchdog.sh python bench.py \
      > results/bench_r4_$name.json 2> /tmp/bench_r4_$name.log || true
    tail -1 results/bench_r4_$name.json
  fi
}

run base BENCH_DOCK_MANY=1
run knobs BENCH_BF16_EDGES=1 BENCH_SKIP_INTRA=8 BENCH_DOCK_MANY=0
run fine BENCH_FINE_BUCKETS=1 BENCH_DOCK_MANY=0
run all BENCH_BF16_EDGES=1 BENCH_SKIP_INTRA=8 BENCH_FINE_BUCKETS=1 BENCH_DOCK_MANY=0
run b40 BENCH_BATCH=40 BENCH_DOCK_MANY=0

echo "=== 5-run determinism verification (step-loop default) ==="
for i in 1 2 3 4 5; do
  BENCH_DOCK_MANY=0 bash scripts/run_watchdog.sh python bench.py \
    > /tmp/r4_lottery_run$i.json 2> /tmp/r4_lottery_run$i.log || true
  sleep 5
done
python scripts/summarize_lottery_runs.py /tmp/r4_lottery_run*.json \
  > results/lottery_verification.json
cat results/lottery_verification.json
echo "=== r4 bench matrix done ==="
