#!/bin/bash
# Stage-B rerun of the affinity journey with label standardization
# (ModelConfig.affinity_norm) + lower lr: the first run's head oscillated
# (val MSE 0.4 <-> 318 between adjacent epochs) because it had to learn the
# raw -logKd scale through a BatchNorm-heavy GNN.  Pose cache is reused, so
# this is training only.  Chains after the r3 chip queue (single-client).
# Run detached: nohup bash scripts/r3_affinity_rerun.sh > /tmp/r3_aff_rerun.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
C=${C:-results/corpus}
W=$C/workdir

while kill -0 "$(cat /tmp/r3_queue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

# keep run 1 (raw labels) for comparison; fresh metrics.jsonl for the report
[ -d $W/conf_affinity ] && [ ! -d $W/conf_affinity_rawlabels ] \
  && mv $W/conf_affinity $W/conf_affinity_rawlabels

bash scripts/run_watchdog.sh python filtering_train.py \
  --original_model_dir $W/score_rigid --ckpt best_ema_inference_epoch_model \
  --protein_ligand_csv $C/conf_train.csv \
  --protein_ligand_csv_val $C/conf_val.csv \
  --cache_path $C/cache_affinity \
  --samples_per_complex 8 --inference_steps 20 \
  --cache_ids_to_combine 1 \
  --affinity_prediction --affinity_index $C/affinity_index.txt \
  --parallel 4 --parallel_aggregators "mean max min std" \
  --n_epochs 120 --batch_size 8 --lr 1e-4 \
  --main_metric affinity_mse --main_metric_goal min \
  --log_dir $W --run_name conf_affinity

python scripts/report_affinity.py
echo "=== affinity rerun done ==="
