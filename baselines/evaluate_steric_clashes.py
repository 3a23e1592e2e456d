"""Dataset-wide steric-clash statistics for arbitrary pose directories.

Parity with reference baselines/evaluate_steric_clashes.py:1-110: walk a
results dir of ligand poses (ours or a baseline's), count vdW-overlap
clashes against the receptors, report per-complex counts and the dataset
clash fraction.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import evaluation as ev
from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data import sdf as sdfio
from diffdock_pocket_tpu.data.pdb import parse_pdb


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results_path", required=True)
    p.add_argument("--data_csv", required=True)
    p.add_argument("--pose_glob", default="rank1*.sdf")
    args = p.parse_args()

    df = ds.load_protein_ligand_df(args.data_csv)
    counts = []
    for _, row in df.iterrows():
        name = str(row["complex_name"])
        poses = sorted(glob.glob(os.path.join(args.results_path, name, args.pose_glob)))
        if not poses:
            continue
        lig = sdfio.read_molecule(poses[0], remove_hs=True)
        rec = parse_pdb(str(row["experimental_protein"]))
        rec.remove_hydrogens()
        atoms = rec.atom_coords()
        elements = [a.element for a in rec.get_atoms()]
        counts.append(
            ev.rec_lig_clashes(atoms, elements, lig.coords, lig.symbols)
        )
    counts = np.asarray(counts)
    out = {
        "n_complexes": int(len(counts)),
        "clash_fraction": float(np.mean(counts > 0)) if len(counts) else 0.0,
        "mean_clashes": float(counts.mean()) if len(counts) else 0.0,
        "max_clashes": int(counts.max()) if len(counts) else 0,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
