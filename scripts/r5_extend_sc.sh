#!/bin/bash
# Round-5 side-chain extension: the EPOCHS=400 corpus run ended with the
# side-chain head still improving steeply (sc_tor_loss 0.95 flat through
# ~ep250, then 0.68@349 -> 0.42@399; valinf mean sc-RMSD 3.3 -> 1.89 A) while
# the ligand had already converged (valinf_rmsds_lt2 = 1.0, mean 0.94 A).
# This stage restarts from last_model for EPOCHS2 more epochs (same
# hyperparameters — the story is strictly "more training", no confounds;
# BN-stats refresh + metrics.jsonl are active in the current trainer),
# then regenerates the confidence stack and rewrites the held-out eval.
#
#   stage 1  train.py --restart_dir  -> $W/score_ext
#   stage 2  filtering_train         -> $W/conf_ext (fresh pose cache)
#   stage 3  inference.py            -> $C/preds_ext
#   stage 4  evaluate_files.py       -> $C/heldout_eval.json (the previous
#            one is preserved as heldout_eval_ep400.json)
#
# Run detached: nohup bash scripts/r5_extend_sc.sh > /tmp/r5_extend.log 2>&1 &
#               echo $! > /tmp/r5_extend.pid
set -e
cd "$(dirname "$0")/.." || exit 1
C=${C:-results/corpus}
W=$C/workdir
EPOCHS2=${EPOCHS2:-400}
GEN_SPC=${GEN_SPC:-16}
SPC=${SPC:-16}
CONF_EPOCHS=${CONF_EPOCHS:-80}

# ---- stage 1: extend score training ----------------------------------------
if [ ! -d $W/score_ext/best_ema_inference_epoch_model ]; then
  echo "=== ext stage 1: +$EPOCHS2 epochs from $W/score/last_model ==="
  bash scripts/run_watchdog.sh python train.py \
    --protein_ligand_csv $C/train.csv \
    --protein_ligand_csv_val $C/heldout.csv \
    --conformer_match_sidechains --compare_true_protein \
    --num_dataloader_workers 1 \
    --restart_dir $W/score \
    --n_epochs $EPOCHS2 --batch_size 8 --lr 1e-3 --dropout 0.0 \
    --val_inference_freq 25 --num_inference_complexes 12 \
    --inference_samples 8 --inference_steps 20 \
    --checkpoint_freq 25 \
    --cache_path $C/cache --log_dir $W --run_name score_ext
fi

# ---- stage 2: confidence stack on the extended model ------------------------
# Reuses the journey's cache_filtering GRAPHS cache (featurization is score-
# model-independent; a fresh cache root would re-pay ~3 h of single-core DE
# conformer matching) and generates NEW pose rounds under cache ids 3/4
# (pose caches are keyed by cache_creation_id, so the ep400 model's rounds
# 1/2 are untouched).
if [ ! -d $W/conf_ext/best_model ]; then
  echo "=== ext stage 2: pose generation + confidence training ==="
  for ID in 1 2; do
    if [ ! -f $C/cache_filtering/poses/train/poses_id$((ID+2)).pkl ]; then
      bash scripts/run_watchdog.sh python filtering_train.py \
        --original_model_dir $W/score_ext --ckpt best_ema_inference_epoch_model \
        --protein_ligand_csv $C/conf_train.csv \
        --protein_ligand_csv_val $C/conf_val.csv \
        --cache_path $C/cache_filtering \
        --samples_per_complex $GEN_SPC --inference_steps 20 \
        --cache_creation_id $((ID+2)) --seed $((ID+2)) \
        --n_epochs 0 --log_dir $W --run_name conf_ext_seed || true
    fi
  done
  SC_CUT=$(python scripts/pose_cache_stats.py \
    $C/cache_filtering/poses/train/poses_id[34].pkl \
    $C/cache_filtering/poses/val/poses_id[34].pkl | tee /dev/stderr | tail -1)
  echo "=== ext stage 2: sc_rmsd_classification_cutoff = $SC_CUT ==="
  bash scripts/run_watchdog.sh python filtering_train.py \
    --original_model_dir $W/score_ext --ckpt best_ema_inference_epoch_model \
    --protein_ligand_csv $C/conf_train.csv \
    --protein_ligand_csv_val $C/conf_val.csv \
    --cache_path $C/cache_filtering \
    --samples_per_complex $GEN_SPC --inference_steps 20 \
    --cache_ids_to_combine 3 4 --balance \
    --sc_rmsd_classification_cutoff $SC_CUT --val_multiplicity 8 \
    --n_epochs $CONF_EPOCHS --batch_size 16 --lr 3e-4 \
    --main_metric val_roc_auc --main_metric_goal max \
    --log_dir $W --run_name conf_ext
fi

# ---- stage 3: held-out inference --------------------------------------------
if [ ! -d $C/preds_ext ]; then
  echo "=== ext stage 3: held-out confidence-ranked inference ==="
  bash scripts/run_watchdog.sh python inference.py \
    --protein_ligand_csv $C/heldout.csv \
    --score_model_dir $W/score_ext --score_ckpt best_ema_inference_epoch_model \
    --filtering_model_dir $W/conf_ext --filtering_ckpt best_model \
    --samples_per_complex $SPC --batch_size $SPC --inference_steps 20 \
    --multi_complex_batching \
    --out_dir $C/preds_ext
fi

# ---- stage 4: evaluation -----------------------------------------------------
echo "=== ext stage 4: evaluation ==="
if [ -f $C/heldout_eval.json ] && [ ! -f $C/heldout_eval_ep400.json ]; then
  cp $C/heldout_eval.json $C/heldout_eval_ep400.json
fi
bash scripts/run_watchdog.sh python evaluate_files.py \
  --results_path $C/preds_ext --data_csv $C/heldout.csv \
  --flexible_sidechains --out_json $C/heldout_eval.json
C=$C python - <<'PYEOF'
import json, os
m = json.load(open(os.path.join(os.environ["C"], "heldout_eval.json")))
print(json.dumps({k: v for k, v in m.items() if not isinstance(v, dict)},
                 indent=2))
PYEOF
C=$C python scripts/report_corpus.py || true
echo "=== r5 extension done ==="
