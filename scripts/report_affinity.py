"""Affinity-journey report: did the affinity head learn a real signal?

Reads the per-epoch metrics history written by ConfidenceTrainer
(workdir/conf_affinity/metrics.jsonl) and compares the best val affinity MSE
against the predict-the-train-mean baseline computed from the synthetic
affinity index.  Writes results/corpus/affinity_journey.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from diffdock_pocket_tpu.confidence.dataset import load_affinity_index

C = os.environ.get("C", "results/corpus")


def main():
    idx = load_affinity_index(os.path.join(C, "affinity_index.txt"))
    train_names = pd.read_csv(os.path.join(C, "conf_train.csv")).complex_name
    val_names = pd.read_csv(os.path.join(C, "conf_val.csv")).complex_name
    a_train = np.asarray([idx[n] for n in train_names if n in idx])
    a_val = np.asarray([idx[n] for n in val_names if n in idx])
    baseline_mse = float(np.mean((a_val - a_train.mean()) ** 2))

    hist = []
    with open(os.path.join(C, "workdir", "conf_affinity", "metrics.jsonl")) as fh:
        for line in fh:
            hist.append(json.loads(line))
    mses = [h["val_affinity_mse"] for h in hist if "val_affinity_mse" in h]
    out = {
        "n_train_complexes": int(len(a_train)),
        "n_val_complexes": int(len(a_val)),
        "train_affinity_mean": float(a_train.mean()),
        "train_affinity_std": float(a_train.std()),
        "predict_mean_baseline_mse": baseline_mse,
        "first_epoch_val_affinity_mse": mses[0] if mses else None,
        "best_val_affinity_mse": min(mses) if mses else None,
        "final_val_affinity_mse": mses[-1] if mses else None,
        "beats_baseline": bool(mses and min(mses) < baseline_mse),
        "n_epochs": len(hist),
    }
    with open(os.path.join(C, "affinity_journey.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
