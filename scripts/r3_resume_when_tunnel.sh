#!/bin/bash
# Tunnel-outage resume orchestrator.  The axon relay (/root/.tpu_init.py)
# died at ~19:19; every chip job hangs in connect-retry until the
# infrastructure restarts it.  This script polls for the relay's listening
# ports, waits a grace period, then runs the round-3 chip queue serially:
#   1. compile-lottery cache probe + flag sweep   (judge r2 ask #2)
#   2. affinity stage-B rerun w/ label standardization (ask #5)
#   3. bf16 / skip_intra quality A/B on the corpus held-out set (ask #4)
#   4. lmax=2 cost profile                         (ask #8)
# Run detached: nohup bash scripts/r3_resume_when_tunnel.sh > /tmp/r3_resume.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
C=results/corpus
W=$C/workdir

while ! ss -tln 2>/dev/null | grep -q ":8082 "; do sleep 30; done
echo "=== relay is back; grace 60s ==="
sleep 60

echo "=== 1a. lottery cache probe ==="
python scripts/repro_compile_lottery.py cache || true
echo "=== 1b. lottery flag sweep ==="
TRIALS=3 CONFIGS=baseline,no_lhs,lhs_rerun python scripts/repro_compile_lottery.py || true

echo "=== 2. affinity stage-B rerun (standardized labels) ==="
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
  --log_dir $W --run_name conf_affinity || true
python scripts/report_affinity.py || true

echo "=== 3. bf16/skip_intra quality A/B ==="
bash scripts/r3_ab_quality.sh || true

echo "=== 4. lmax2 profile ==="
python scripts/profile_lmax2.py || true

echo "=== r3 resume queue done ==="
