#!/bin/bash
# Reset-protection watcher (judge r3 ask #1: "commit the trained checkpoint
# workdirs ... so a host reset can never again orphan the dependent stages").
# Round 3 lost 5 chip artifacts to a host reset that wiped uncommitted files;
# this loop commits the journey's milestone artifacts as they appear, so any
# reset can resume from the last committed stage.
#
# Only WHITELISTED paths are committed (pathspec form `git commit -- <paths>`
# bypasses whatever else is staged, so this never scoops up the builder's
# in-progress source edits).  Checkpoints are small (best_ema ~9 MB orbax).
#
# Run detached: nohup bash scripts/autocommit_artifacts.sh > /tmp/autocommit.log 2>&1 &
#               echo $! > /tmp/autocommit.pid
set -u
cd "$(dirname "$0")/.."

PATHS=(
  results/corpus/workdir/score/best_ema_inference_epoch_model
  results/corpus/workdir/score/best_ema_steric_clash_model
  results/corpus/workdir/score/model_parameters.yml
  results/corpus/workdir/conf/best_model
  results/corpus/workdir/score/last_model
  results/corpus/workdir/score/metrics.jsonl
  results/corpus/workdir/score_ext/best_ema_inference_epoch_model
  results/corpus/workdir/score_ext/best_ema_sc_rmsd_model
  results/corpus/workdir/score_ext/last_model
  results/corpus/workdir/score_ext/model_parameters.yml
  results/corpus/workdir/score_ext/metrics.jsonl
  results/corpus/workdir/conf_ext/best_model
  results/corpus/workdir/conf_ext/model_parameters.yml
  results/corpus/heldout_eval_ep400.json
  results/corpus/workdir/conf/model_parameters.yml
  results/corpus/heldout_eval.json
  results/corpus/heldout_eval_bf16.json
  results/corpus/heldout_eval_skip.json
  results/corpus/heldout_eval_both.json
  results/corpus/confidence_ablation.json
  results/corpus_hard_journey.json
  results/lmax2_cost.json
  results/lottery_verification.json
  results/dock_many_parity.json
  results/bench_r5_default.json
  results/corpus/affinity_journey.json
  results/corpus_journey.json
  results/corpus/corpus_meta.json
  results/bench_r4_base.json
  results/bench_r4_knobs.json
  results/bench_r4_fine.json
  results/bench_r4_all.json
  results/bench_r4_b40.json
)

while true; do
  sleep 900
  exist=()
  for p in "${PATHS[@]}"; do [ -e "$p" ] && exist+=("$p"); done
  [ ${#exist[@]} -eq 0 ] && continue
  # skip while another git op holds the index; try again next tick
  [ -f .git/index.lock ] && { echo "index busy, skipping tick"; continue; }
  git add -f -- "${exist[@]}" 2>/dev/null
  if ! git diff --cached --quiet -- "${exist[@]}"; then
    git commit -q \
      -m "Auto-commit chip-queue milestone artifacts (reset protection)

No-Verification-Needed: results/checkpoint artifacts only" \
      -- "${exist[@]}" && echo "committed $(date -u +%H:%M) ${exist[*]}"
  fi
done
