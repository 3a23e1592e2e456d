#!/bin/bash
# Quality A/B for the two opt-in perf knobs (judge r2 ask #4): rerun the
# corpus held-out inference (stage 3+4 of corpus_journey.sh, same trained
# models) with each knob on, and compare heldout_eval metrics vs the
# committed baseline results/corpus/heldout_eval.json.
#
#   variant bf16   --bf16_edge_attr
#   variant skip   --skip_intra_steps 8   (of 20 steps)
#   variant both   both knobs
#
# -> results/corpus/heldout_eval_{bf16,skip,both}.json
# Run detached: nohup bash scripts/r3_ab_quality.sh > /tmp/r3_ab.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
C=${C:-results/corpus}
W=$C/workdir
SPC=${SPC:-16}

run_variant() {
  local name=$1; shift
  if [ ! -f $C/heldout_eval_$name.json ]; then
    echo "=== variant $name: inference ==="
    rm -rf $C/preds_$name
    bash scripts/run_watchdog.sh python inference.py \
      --protein_ligand_csv $C/heldout.csv \
      --score_model_dir $W/score --score_ckpt best_ema_inference_epoch_model \
      --filtering_model_dir $W/conf --filtering_ckpt best_model \
      --samples_per_complex $SPC --batch_size $SPC --inference_steps 20 \
      --multi_complex_batching \
      --out_dir $C/preds_$name "$@"
    echo "=== variant $name: evaluation ==="
    bash scripts/run_watchdog.sh python evaluate_files.py \
      --results_path $C/preds_$name --data_csv $C/heldout.csv \
      --flexible_sidechains --out_json $C/heldout_eval_$name.json
  fi
}

run_variant bf16 --bf16_edge_attr
run_variant skip --skip_intra_steps 8
run_variant both --bf16_edge_attr --skip_intra_steps 8

C=$C python - <<'PYEOF'
import json, os
C = os.environ["C"]
base = json.load(open(f"{C}/heldout_eval.json"))
keys = [k for k, v in base.items() if not isinstance(v, (dict, list))]
rows = {"baseline": base}
for name in ("bf16", "skip", "both"):
    p = f"{C}/heldout_eval_{name}.json"
    if os.path.exists(p):
        rows[name] = json.load(open(p))
print(f"{'metric':36s}" + "".join(f"{n:>10s}" for n in rows))
for k in keys:
    print(f"{k:36s}" + "".join(
        f"{rows[n].get(k):>10.3f}" if isinstance(rows[n].get(k), float)
        else f"{str(rows[n].get(k)):>10s}" for n in rows))
PYEOF
echo "=== r3 A/B quality done ==="
