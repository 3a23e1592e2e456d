#!/bin/bash
# Trimmed heldout-eval tail (round 5, post-reset).  The full corpus journey
# (2 pose-cache rounds + 80 conf epochs) does not fit in the wall clock that
# remains after the 21:25 host reset, so this script:
#   1. waits for the id1 pose caches (train + val) that the running journey
#      is generating, then stops the journey before it starts the id2 round;
#   2. trains the confidence model on the SINGLE cache round (documented
#      deviation from the r3 chain's 2 rounds / 80 epochs: ~530 poses,
#      40 epochs — same machinery, smaller pose corpus);
#   3. runs the held-out inference (featurization pre-warmed into
#      results/corpus/cache_inf by scripts/prewarm_inference_cache.py);
#   4. writes results/corpus/heldout_eval.json + the corpus report.
# Run detached: nohup bash scripts/r5_heldout_tail.sh > /tmp/r5_tail.log 2>&1 &
#               echo $! > /tmp/r5_tail.pid
set -x
cd "$(dirname "$0")/.." || exit 1
C=results/corpus
W=$C/workdir
CONF_EPOCHS=${CONF_EPOCHS:-40}
SPC=16

kill_tree() {  # kill a PID and all descendants, by pid walk (never by name)
  local pid=$1
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}

echo "=== 1. wait for id1 pose caches ==="
while [ ! -s $C/cache_filtering/poses/train/poses_id1.pkl ] \
   || [ ! -s $C/cache_filtering/poses/val/poses_id1.pkl ]; do
  sleep 10
done
sleep 5  # let the generating process finish its exit path
if [ -f /tmp/r5_journey.pid ] && kill -0 "$(cat /tmp/r5_journey.pid)" 2>/dev/null; then
  echo "stopping the journey before the id2 round"
  kill_tree "$(cat /tmp/r5_journey.pid)"
fi

echo "=== 2. confidence training (1 cache round, $CONF_EPOCHS epochs) ==="
if [ ! -d $W/conf/best_model ]; then
  SC_CUT=$(python scripts/pose_cache_stats.py \
    $C/cache_filtering/poses/train/poses_id*.pkl \
    $C/cache_filtering/poses/val/poses_id*.pkl | tee /dev/stderr | tail -1)
  echo "sc_rmsd_classification_cutoff = $SC_CUT"
  bash scripts/run_watchdog.sh python filtering_train.py \
    --original_model_dir $W/score --ckpt best_ema_inference_epoch_model \
    --protein_ligand_csv $C/conf_train.csv \
    --protein_ligand_csv_val $C/conf_val.csv \
    --cache_path $C/cache_filtering \
    --samples_per_complex 16 --inference_steps 20 \
    --cache_ids_to_combine 1 --balance \
    --sc_rmsd_classification_cutoff $SC_CUT --val_multiplicity 8 \
    --n_epochs $CONF_EPOCHS --batch_size 16 --lr 3e-4 \
    --main_metric val_roc_auc --main_metric_goal max \
    --log_dir $W --run_name conf
fi

echo "=== 3. held-out inference (pre-warmed featurization) ==="
if [ ! -d $C/preds ]; then
  bash scripts/run_watchdog.sh python inference.py \
    --protein_ligand_csv $C/heldout.csv \
    --score_model_dir $W/score --score_ckpt best_ema_inference_epoch_model \
    --filtering_model_dir $W/conf --filtering_ckpt best_model \
    --samples_per_complex $SPC --batch_size $SPC --inference_steps 20 \
    --multi_complex_batching --cache_path $C/cache_inf \
    --out_dir $C/preds
fi

echo "=== 4. evaluation ==="
bash scripts/run_watchdog.sh python evaluate_files.py \
  --results_path $C/preds --data_csv $C/heldout.csv \
  --flexible_sidechains --out_json $C/heldout_eval.json
C=$C python scripts/report_corpus.py || true
echo "=== r5 heldout tail done ==="
