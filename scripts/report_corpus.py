"""Corpus-journey report: per-complex held-out table + the round-3 'done'
criteria (judge ask #1):
- top-1-by-confidence RMSD < 2 A on (target: >= 7/8 of) the held-out set;
- ZERO catastrophic misranks = complexes where top-1 RMSD > 2x the best
  sample's AND > 2 A (the round-2 frag3_apo failure mode).

Reads $C/preds/rmsds.npy + names.npy (written by evaluate_files.py) and
$C/heldout_eval.json; writes $OUT_JSON (default
results/corpus_journey.json).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = os.environ.get("C", "results/corpus")
OUT_JSON = os.environ.get("OUT_JSON", "results/corpus_journey.json")


def main():
    rmsds = np.load(os.path.join(C, "preds", "rmsds.npy"), allow_pickle=True)
    names = np.load(os.path.join(C, "preds", "names.npy"))
    with open(os.path.join(C, "heldout_eval.json")) as fh:
        eval_summary = json.load(fh)
    meta = {}
    mpath = os.path.join(C, "corpus_meta.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            meta = json.load(fh)

    per = {}
    top1s, bests = [], []
    misranks = []
    rank_failures = []
    for name, r in zip(names, rmsds):
        r = np.asarray(r, np.float64)
        r = r[np.isfinite(r)]
        if not len(r):
            continue
        top1, best = float(r[0]), float(r.min())
        per[str(name)] = {
            "top1_rmsd": round(top1, 3),
            "best_rmsd": round(best, 3),
            "median_rmsd": round(float(np.median(r)), 3),
            "lt2_rate": round(float(np.mean(r < 2)), 3),
        }
        top1s.append(top1)
        bests.append(best)
        # the round-2 judge criterion (VERDICT "zero cases where top-1 RMSD
        # > 2x best-sample RMSD", the frag3_apo failure mode), AND-ed with
        # top-1 actually being bad (> 2 A) — matches BASELINE.md's table
        if top1 > 2.0 * best and top1 > 2.0:
            misranks.append(str(name))
        # complementary absolute criterion: confidence picked a > 2 A pose
        # while a < 2 A pose existed (catches e.g. best 1.9 / top-1 3.0,
        # which the ratio test does not)
        if top1 > 2.0 and best < 2.0:
            rank_failures.append(str(name))

    top1s, bests = np.asarray(top1s), np.asarray(bests)
    out = {
        "n_held_out": int(len(top1s)),
        "corpus_meta": meta,
        "per_complex": per,
        "top1_rmsds_below_2": round(float(np.mean(top1s < 2)), 4),
        "best_rmsds_below_2": round(float(np.mean(bests < 2)), 4),
        "mean_top1_rmsd": round(float(top1s.mean()), 3),
        "mean_best_rmsd": round(float(bests.mean()), 3),
        "catastrophic_misranks": misranks,
        "n_catastrophic_misranks": len(misranks),
        "rank_failures_top1_gt2_best_lt2": rank_failures,
        "n_rank_failures": len(rank_failures),
        "eval_summary": eval_summary,
    }
    with open(OUT_JSON, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("per_complex", "eval_summary", "corpus_meta")},
                     indent=2))


if __name__ == "__main__":
    main()
