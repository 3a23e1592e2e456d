#!/bin/bash
# Affinity evidence v2 (judge round-4 ask #8): the r4 affinity journey showed
# the head LEARNING (best val MSE 0.088 < 0.145 baseline) but from ONE seed,
# with the final epoch drifted back to ~baseline and the trajectory
# oscillating.  This stage reruns the confidence+affinity training with TWO
# seeds on the same pose cache, with plateau LR decay (scheduler_patience 10,
# vs the r4 run's effectively-constant LR) so late epochs stay near the
# optimum.  Pass criterion per seed: best AND final val MSE < baseline.
#
#   -> results/corpus/affinity_journey.json (v2: per-seed summaries)
#
# Reuses the committed rigid score model (results/corpus/workdir/score_rigid)
# and the cache_affinity pose cache (regenerated here if absent).
# Run detached: nohup bash scripts/r5_affinity_seeds.sh > /tmp/r5_affinity.log 2>&1 &
set -e
cd "$(dirname "$0")/.." || exit 1
# round-5 ordering: when /tmp/r5_defer exists this stage is deferred
# behind the side-chain extension (scripts/r5_queue2.sh re-runs it)
[ -f /tmp/r5_defer ] && { echo "deferred by /tmp/r5_defer"; exit 0; }

C=${C:-results/corpus}
W=$C/workdir
GEN_SPC=${GEN_SPC:-8}
CONF_EPOCHS=${CONF_EPOCHS:-120}

[ -f $C/train.csv ] || python scripts/make_corpus.py

if [ ! -d $W/score_rigid/best_ema_inference_epoch_model ]; then
  echo "score_rigid checkpoint missing; run scripts/affinity_journey.sh stage A first" >&2
  exit 1
fi

if [ ! -f $C/cache_affinity/poses/train/poses_id1.pkl ]; then
  echo "=== pose generation (seed 1) ==="
  bash scripts/run_watchdog.sh python filtering_train.py \
    --original_model_dir $W/score_rigid --ckpt best_ema_inference_epoch_model \
    --protein_ligand_csv $C/conf_train.csv \
    --protein_ligand_csv_val $C/conf_val.csv \
    --cache_path $C/cache_affinity \
    --samples_per_complex $GEN_SPC --inference_steps 20 \
    --cache_creation_id 1 --seed 1 \
    --n_epochs 0 --log_dir $W --run_name conf_affinity_gen
fi

for SEED in 1 2; do
  if [ ! -d $W/conf_affinity_s$SEED/best_model ]; then
    echo "=== affinity training, seed $SEED ==="
    bash scripts/run_watchdog.sh python filtering_train.py \
      --original_model_dir $W/score_rigid --ckpt best_ema_inference_epoch_model \
      --protein_ligand_csv $C/conf_train.csv \
      --protein_ligand_csv_val $C/conf_val.csv \
      --cache_path $C/cache_affinity \
      --samples_per_complex $GEN_SPC --inference_steps 20 \
      --cache_ids_to_combine 1 \
      --affinity_prediction --affinity_index $C/affinity_index.txt \
      --parallel 4 --parallel_aggregators "mean max min std" \
      --n_epochs $CONF_EPOCHS --batch_size 8 --lr 1e-4 \
      --scheduler_patience 10 --seed $SEED \
      --main_metric affinity_mse --main_metric_goal min \
      --log_dir $W --run_name conf_affinity_s$SEED
  fi
done

echo "=== affinity v2 report ==="
python scripts/report_affinity_v2.py
