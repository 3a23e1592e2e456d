"""Report the generated-pose label balance of a filtering pose cache and
recommend the tightest usable sc-RMSD classification cutoff.

The reference default (filtering_train.py --sc_rmsd_classification_cutoff 1)
starves the binary labels when the score model rarely samples sc_rmsd < 1 A
(round-3 corpus: positive rate ~1%), so the journey relaxed it to 2.0.  With
a better-trained sc head the tight cutoff becomes usable again — this script
measures instead of guessing: it prints the positive rate
(rmsd < 2 AND sc_rmsd < c) for each candidate cutoff and emits the tightest
one whose TRAIN positive rate is >= MIN_POS (default 0.10) on its last line
(consumed by scripts/corpus_journey.sh).

Usage: python scripts/pose_cache_stats.py <poses_train.pkl> [poses_val.pkl ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diffdock_pocket_tpu.confidence.dataset import combine_pose_caches

CUTOFFS = (1.0, 1.5, 2.0)
MIN_POS = float(os.environ.get("MIN_POS_RATE", "0.10"))


def rates(paths):
    poses = combine_pose_caches(paths)
    rmsds = np.concatenate([p.rmsds for p in poses.values()])
    sc = (
        np.concatenate([p.sc_rmsds for p in poses.values()])
        if next(iter(poses.values())).sc_rmsds is not None else None
    )
    out = {}
    for c in CUTOFFS:
        y = (rmsds < 2.0) & (sc < c if sc is not None else True)
        out[c] = float(np.mean(y))
    return out, len(rmsds), sc


def main(argv):
    train_paths = [p for p in argv if "/train/" in p] or argv[:1]
    val_paths = [p for p in argv if "/val/" in p]
    tr, n_tr, sc = rates(train_paths)
    print(f"train poses: {n_tr}")
    if sc is not None:
        print(f"train sc_rmsd quartiles: "
              f"{np.percentile(sc, [25, 50, 75]).round(2).tolist()}")
    for c in CUTOFFS:
        line = f"  sc_cutoff {c}: train pos rate {tr[c]:.3f}"
        if val_paths:
            va, n_va, _ = rates(val_paths)
            line += f"   val pos rate {va[c]:.3f} (n={n_va})"
        print(line)
    chosen = next((c for c in CUTOFFS if tr[c] >= MIN_POS), CUTOFFS[-1])
    print(chosen)


if __name__ == "__main__":
    main(sys.argv[1:])
