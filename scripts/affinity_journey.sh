#!/bin/bash
# Affinity-prediction journey (judge round-2 ask #5): demonstrate the
# affinity head LEARNING a real signal through the real CLIs.
#
# The corpus carries synthetic per-complex affinities (-logKd = monotone in
# the TRUE pose's buried-contact count + noise, results/corpus/
# affinity_index.txt).  parallel>1 requires a rigid score model (the
# reference forbids parallel with flexible side chains), so this journey
# trains its own small rigid score model first.
#
#   stage A  train.py        rigid score model (ns=24, no flexible sidechains)
#   stage B  filtering_train --affinity_prediction --parallel 4: 1 generation
#                            round + confidence+affinity training
#   stage C  report          val affinity MSE vs the predict-the-mean baseline
#                            -> results/corpus/affinity_journey.json
#
# Run detached: nohup bash scripts/affinity_journey.sh > results/corpus/affinity.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
C=${C:-results/corpus}
W=$C/workdir
EPOCHS=${EPOCHS:-150}
GEN_SPC=${GEN_SPC:-8}
CONF_EPOCHS=${CONF_EPOCHS:-120}
EXTRA_TRAIN_ARGS=${EXTRA_TRAIN_ARGS:-}

[ -f $C/train.csv ] || python scripts/make_corpus.py

if [ ! -d $W/score_rigid/best_ema_inference_epoch_model ]; then
  echo "=== stage A: rigid score-model training ==="
  bash scripts/run_watchdog.sh python train.py \
    --protein_ligand_csv $C/train.csv \
    --protein_ligand_csv_val $C/heldout.csv \
    --no-flexible_sidechains \
    --ns 24 --nv 6 --num_conv_layers 4 --sigma_embed_dim 32 \
    --distance_embed_dim 32 --cross_distance_embed_dim 32 --dropout 0.0 \
    --num_dataloader_workers 1 \
    --n_epochs $EPOCHS --batch_size 8 --lr 1e-3 \
    --val_inference_freq 50 --num_inference_complexes 6 \
    --inference_samples 4 --inference_steps 20 \
    --checkpoint_freq 25 \
    --cache_path $C/cache_rigid --log_dir $W --run_name score_rigid \
    $EXTRA_TRAIN_ARGS
fi

echo "=== stage B: affinity confidence training (parallel=4) ==="
if [ ! -f $C/cache_affinity/poses/train/poses_id1.pkl ]; then
  bash scripts/run_watchdog.sh python filtering_train.py \
    --original_model_dir $W/score_rigid --ckpt best_ema_inference_epoch_model \
    --protein_ligand_csv $C/conf_train.csv \
    --protein_ligand_csv_val $C/conf_val.csv \
    --cache_path $C/cache_affinity \
    --samples_per_complex $GEN_SPC --inference_steps 20 \
    --cache_creation_id 1 --seed 1 \
    --n_epochs 0 --log_dir $W --run_name conf_affinity_gen || true
fi
bash scripts/run_watchdog.sh python filtering_train.py \
  --original_model_dir $W/score_rigid --ckpt best_ema_inference_epoch_model \
  --protein_ligand_csv $C/conf_train.csv \
  --protein_ligand_csv_val $C/conf_val.csv \
  --cache_path $C/cache_affinity \
  --samples_per_complex $GEN_SPC --inference_steps 20 \
  --cache_ids_to_combine 1 \
  --affinity_prediction --affinity_index $C/affinity_index.txt \
  --parallel 4 --parallel_aggregators "mean max min std" \
  `# lr 1e-4 (not 3e-4): the raw-label run at 3e-4 oscillated (val MSE` \
  `# 0.4 <-> 318 between adjacent epochs); labels are now standardized by` \
  `# default (filtering_train.py computes ModelConfig.affinity_norm from` \
  `# the index) and checkpoint selection is on val affinity MSE` \
  --n_epochs $CONF_EPOCHS --batch_size 8 --lr 1e-4 \
  --main_metric affinity_mse --main_metric_goal min \
  --log_dir $W --run_name conf_affinity

echo "=== stage C: affinity MSE report ==="
python scripts/report_affinity.py
