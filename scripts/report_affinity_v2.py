"""Affinity-journey report v2: two seeds + stability (judge r4 ask #8).

Aggregates the per-epoch metrics of the seeded affinity runs
(workdir/conf_affinity_s{1,2}/metrics.jsonl) against the
predict-the-train-mean baseline.  Pass criterion per seed: BOTH the best
AND the final val affinity MSE beat the baseline (the r4 run's final epoch
had drifted back to ~baseline; the seeded runs decay the LR on plateau —
--scheduler_patience 10 — so late epochs stay near the optimum).
Writes results/corpus/affinity_journey.json (v2 schema, keeps v1 fields
per seed).
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from diffdock_pocket_tpu.confidence.dataset import load_affinity_index

C = os.environ.get("C", "results/corpus")


def seed_summary(run_dir, baseline_mse):
    hist = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        for line in fh:
            hist.append(json.loads(line))
    mses = [h["val_affinity_mse"] for h in hist if "val_affinity_mse" in h]
    if not mses:
        return None
    return {
        "first_epoch_val_affinity_mse": mses[0],
        "best_val_affinity_mse": min(mses),
        "final_val_affinity_mse": mses[-1],
        "best_beats_baseline": min(mses) < baseline_mse,
        "final_beats_baseline": mses[-1] < baseline_mse,
        # oscillation measure over the last third of training: the r4
        # single-seed run swung 0.09-0.19 throughout (VERDICT weak #5)
        "late_third_min": float(np.min(mses[-(len(mses) // 3 or 1):])),
        "late_third_max": float(np.max(mses[-(len(mses) // 3 or 1):])),
        "n_epochs": len(hist),
    }


def main():
    idx = load_affinity_index(os.path.join(C, "affinity_index.txt"))
    train_names = pd.read_csv(os.path.join(C, "conf_train.csv")).complex_name
    val_names = pd.read_csv(os.path.join(C, "conf_val.csv")).complex_name
    a_train = np.asarray([idx[n] for n in train_names if n in idx])
    a_val = np.asarray([idx[n] for n in val_names if n in idx])
    baseline_mse = float(np.mean((a_val - a_train.mean()) ** 2))

    seeds = {}
    for run_dir in sorted(glob.glob(os.path.join(C, "workdir",
                                                 "conf_affinity_s*"))):
        name = os.path.basename(run_dir)
        s = seed_summary(run_dir, baseline_mse)
        if s:
            seeds[name] = s

    ok = bool(seeds) and all(
        s["best_beats_baseline"] and s["final_beats_baseline"]
        for s in seeds.values())
    out = {
        "version": 2,
        "n_train_complexes": int(len(a_train)),
        "n_val_complexes": int(len(a_val)),
        "train_affinity_mean": float(a_train.mean()),
        "train_affinity_std": float(a_train.std()),
        "predict_mean_baseline_mse": baseline_mse,
        "seeds": seeds,
        "all_seeds_best_and_final_beat_baseline": ok,
        "stability_note": (
            "plateau LR decay (--scheduler_patience 10) added vs the r4 "
            "single-seed run whose final epoch had drifted back to the "
            "baseline; criterion = best AND final val MSE < predict-the-"
            "mean for every seed"),
        "criterion": ("2 seeds, best AND final val affinity MSE below the "
                      "predict-the-train-mean baseline (judge r4 ask #8)"),
    }
    with open(os.path.join(C, "affinity_journey.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
