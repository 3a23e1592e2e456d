#!/bin/bash
# Confidence-robustness ablation (judge round-3 ask #6): show the corpus
# journey's zero-catastrophic-misrank ranking is reproducible, not a lucky
# draw.  Requires the corpus journey's workdir (score model + cache rounds
# 1/2 from scripts/corpus_journey.sh).
#
#   axis 1 (seed):       rounds 3+4 are generated with fresh seeds and a
#                        confidence model is trained on them alone
#   axis 2 (pose count): confidence models trained on ~0.5x / 1x / 2x the
#                        journey's pose count (round 1 only / rounds 1+2 /
#                        rounds 1-4)
#
# Each variant ranks the 12 held-out complexes through inference.py and is
# scored for catastrophic misranks (top1 > 2x best AND > 2 A).
# -> results/corpus/confidence_ablation.json
set -e
cd "$(dirname "$0")/.."
# round-5 ordering: when /tmp/r5_defer exists this stage is deferred
# behind the side-chain extension (scripts/r5_queue2.sh re-runs it)
[ -f /tmp/r5_defer ] && { echo "deferred by /tmp/r5_defer"; exit 0; }

C=${C:-results/corpus}
W=$C/workdir
GEN_SPC=${GEN_SPC:-16}
SPC=${SPC:-16}
CONF_EPOCHS=${CONF_EPOCHS:-80}

# ---- extra generation rounds (seeds 5, 6) -----------------------------------
# (ids 3/4 belong to the score_ext extension chain — scripts/r5_extend_sc.sh
# generates them with a DIFFERENT score model into the same cache dir, so
# this ablation of the ep400 `score` model must use its own ids)
for ID in 5 6; do
  if [ ! -f $C/cache_filtering/poses/train/poses_id$ID.pkl ]; then
    bash scripts/run_watchdog.sh python filtering_train.py \
      --original_model_dir $W/score --ckpt best_ema_inference_epoch_model \
      --protein_ligand_csv $C/conf_train.csv \
      --protein_ligand_csv_val $C/conf_val.csv \
      --cache_path $C/cache_filtering \
      --samples_per_complex $GEN_SPC --inference_steps 20 \
      --cache_creation_id $ID --seed $ID \
      --n_epochs 0 --log_dir $W --run_name conf_gen$ID || true
  fi
done

SC_CUT=$(python scripts/pose_cache_stats.py \
  $C/cache_filtering/poses/train/poses_id[1256].pkl \
  $C/cache_filtering/poses/val/poses_id[1256].pkl | tail -1)
echo "=== ablation: sc cutoff $SC_CUT ==="

train_variant() {  # name  cache_ids...
  local name=$1; shift
  if [ ! -d $W/conf_$name/best_model ]; then
    bash scripts/run_watchdog.sh python filtering_train.py \
      --original_model_dir $W/score --ckpt best_ema_inference_epoch_model \
      --protein_ligand_csv $C/conf_train.csv \
      --protein_ligand_csv_val $C/conf_val.csv \
      --cache_path $C/cache_filtering \
      --samples_per_complex $GEN_SPC --inference_steps 20 \
      --cache_ids_to_combine "$@" --balance \
      --sc_rmsd_classification_cutoff $SC_CUT --val_multiplicity 8 \
      --n_epochs $CONF_EPOCHS --batch_size 16 --lr 3e-4 \
      --main_metric val_roc_auc --main_metric_goal max \
      --log_dir $W --run_name conf_$name
  fi
  if [ ! -d $C/preds_conf_$name ]; then
    bash scripts/run_watchdog.sh python inference.py \
      --protein_ligand_csv $C/heldout.csv \
      --score_model_dir $W/score --score_ckpt best_ema_inference_epoch_model \
      --filtering_model_dir $W/conf_$name --filtering_ckpt best_model \
      --samples_per_complex $SPC --batch_size $SPC --inference_steps 20 \
      --multi_complex_batching \
      --out_dir $C/preds_conf_$name
  fi
  bash scripts/run_watchdog.sh python evaluate_files.py \
    --results_path $C/preds_conf_$name --data_csv $C/heldout.csv \
    --flexible_sidechains --out_json $C/heldout_eval_conf_$name.json
}

train_variant seedB 5 6
train_variant n500 1
train_variant n2000 1 2 5 6

# ---- summary -----------------------------------------------------------------
C=$C python - <<'PYEOF'
import json
import os

import numpy as np

C = os.environ["C"]
variants = {
    "journey_1000": "preds",            # the main corpus-journey ranking
    "seedB_1000": "preds_conf_seedB",
    "n500": "preds_conf_n500",
    "n2000": "preds_conf_n2000",
}
out = {}
for name, preds in variants.items():
    d = os.path.join(C, preds)
    try:
        rmsds = np.load(os.path.join(d, "rmsds.npy"), allow_pickle=True)
        names = np.load(os.path.join(d, "names.npy"))
    except OSError:
        out[name] = {"missing": True}
        continue
    top1, best, mis, rf = [], [], [], []
    for n, r in zip(names, rmsds):
        r = np.asarray(r, np.float64)
        r = r[np.isfinite(r)]
        if not len(r):
            continue
        t, b = float(r[0]), float(r.min())
        top1.append(t)
        best.append(b)
        if t > 2.0 * b and t > 2.0:
            mis.append(str(n))
        if t > 2.0 and b < 2.0:
            rf.append(str(n))
    top1, best = np.asarray(top1), np.asarray(best)
    out[name] = {
        "n": int(len(top1)),
        "top1_lt2": round(float(np.mean(top1 < 2)), 4),
        "mean_top1": round(float(top1.mean()), 3),
        "catastrophic_misranks": mis,
        "rank_failures": rf,
    }
path = os.path.join(C, "confidence_ablation.json")
with open(path, "w") as fh:
    json.dump(out, fh, indent=2)
print(json.dumps(out, indent=2))
PYEOF
echo "=== confidence ablation done ==="
