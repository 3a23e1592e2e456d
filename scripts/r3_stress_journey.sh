#!/bin/bash
# Generalization stress journey (ROADMAP quality rung): build a HARDER
# corpus than the one the round-3 models were trained on (stronger chi and
# backbone perturbations of the apo receptors), then evaluate the EXISTING
# corpus checkpoints on its 12 held-out complexes through the real CLIs —
# no retraining, so this is cheap chip time (~minutes).
#
# Hard corpus vs training corpus: chi sigma 0.9/0.8 (vs 0.6/0.5), backbone
# sigma 0.45 (vs 0.25) — receptors measurably further from holo than
# anything the models saw.
# Run detached: nohup bash scripts/r3_stress_journey.sh > /tmp/r3_stress.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
C=results/corpus           # trained models live here
H=results/corpus_hard      # harder evaluation corpus
W=$C/workdir
SPC=${SPC:-16}

[ -f $H/heldout.csv ] || CORPUS_OUT=$H CORPUS_CHI1=0.9 CORPUS_CHI2=0.8 \
  CORPUS_BB2=0.45 python scripts/make_corpus.py

if [ ! -d $H/preds ]; then
  echo "=== stress inference (existing models, harder apo receptors) ==="
  bash scripts/run_watchdog.sh python inference.py \
    --protein_ligand_csv $H/heldout.csv \
    --score_model_dir $W/score --score_ckpt best_ema_inference_epoch_model \
    --filtering_model_dir $W/conf --filtering_ckpt best_model \
    --samples_per_complex $SPC --batch_size $SPC --inference_steps 20 \
    --multi_complex_batching \
    --out_dir $H/preds
fi

echo "=== stress evaluation ==="
bash scripts/run_watchdog.sh python evaluate_files.py \
  --results_path $H/preds --data_csv $H/heldout.csv \
  --flexible_sidechains --out_json $H/heldout_eval.json

C=$H OUT_JSON=results/corpus_hard_journey.json python scripts/report_corpus.py
echo "=== stress journey done (results/corpus_hard_journey.json) ==="
