"""Apo-holo RMSD analysis: pocket vs global RMSD between computational
(e.g. ESMFold) and experimental structures.

Parity with reference datasets/calculate_rmsd.py:24-115 (paper-figure
analysis): for each complex with both structures, compute all-atom RMSD
globally and within the binding pocket.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data import receptor as recmod
from diffdock_pocket_tpu.data import sdf as sdfio
from diffdock_pocket_tpu.data.pdb import parse_pdb


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_csv", required=True,
                   help="table with experimental_protein + computational_protein")
    p.add_argument("--pocket_cutoff", type=float, default=5.0)
    p.add_argument("--pocket_buffer", type=float, default=10.0)
    args = p.parse_args()

    df = ds.load_protein_ligand_df(args.data_csv)
    glob_rmsds, pocket_rmsds = [], []
    for _, row in df.iterrows():
        comp_path = row.get("computational_protein")
        if not isinstance(comp_path, str) or not os.path.exists(comp_path):
            continue
        exp = parse_pdb(str(row["experimental_protein"]))
        comp = parse_pdb(comp_path)
        for m in (exp, comp):
            m.remove_waters()
            m.remove_hydrogens()
            recmod.sort_atoms(m)
        a = exp.atom_coords()
        b = comp.atom_coords()
        if a.shape != b.shape:
            continue
        glob_rmsds.append(float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1)))))
        lig = sdfio.read_molecule(row["ligand_path"], remove_hs=True)
        ca = np.asarray([at.coord for at in exp.get_atoms() if at.name == "CA"], np.float32)
        center, radius = recmod.calculate_binding_pocket(
            ca, lig.coords, args.pocket_buffer, args.pocket_cutoff
        )
        in_pocket = np.linalg.norm(a - center, axis=1) < radius
        if in_pocket.any():
            pocket_rmsds.append(
                float(np.sqrt(np.mean(np.sum((a[in_pocket] - b[in_pocket]) ** 2, axis=1))))
            )
    out = {
        "n": len(glob_rmsds),
        "global_rmsd_mean": float(np.mean(glob_rmsds)) if glob_rmsds else None,
        "global_rmsd_median": float(np.median(glob_rmsds)) if glob_rmsds else None,
        "pocket_rmsd_mean": float(np.mean(pocket_rmsds)) if pocket_rmsds else None,
        "pocket_rmsd_median": float(np.median(pocket_rmsds)) if pocket_rmsds else None,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
