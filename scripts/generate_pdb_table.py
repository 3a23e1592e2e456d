"""Generate train/val CSV tables from a PDBBind-style directory.

Parity with reference data/generate_pdb_table.py:18-169: walk the directory,
emit complex_name + experimental (+ computational) protein paths + ligand
paths, split time-based (by a year table) or randomly.
"""
import argparse
import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu.data.dataset import sdf_or_mol2


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--protein_file", default="protein_processed")
    p.add_argument("--computational_protein_file", default=None,
                   help="e.g. protein_esmfold_aligned_tr_fix")
    p.add_argument("--out_train", default="train_table.csv")
    p.add_argument("--out_val", default="val_table.csv")
    p.add_argument("--val_fraction", type=float, default=0.05)
    p.add_argument("--split_file", default=None,
                   help="optional explicit val-complex list (one name/line)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rows = []
    for name in sorted(os.listdir(args.data_dir)):
        cdir = os.path.join(args.data_dir, name)
        if not os.path.isdir(cdir):
            continue
        prot = os.path.join(cdir, f"{name}_{args.protein_file}.pdb")
        lig = sdf_or_mol2(os.path.join(cdir, f"{name}_ligand"))
        if not os.path.exists(prot) or lig is None:
            continue
        row = {"complex_name": name, "experimental_protein": prot, "ligand": lig}
        if args.computational_protein_file:
            comp = os.path.join(cdir, f"{name}_{args.computational_protein_file}.pdb")
            if not os.path.exists(comp):
                continue
            row["computational_protein"] = comp
        rows.append(row)

    if args.split_file:
        with open(args.split_file) as fh:
            val_names = {l.strip() for l in fh if l.strip()}
        val = [r for r in rows if r["complex_name"] in val_names]
        train = [r for r in rows if r["complex_name"] not in val_names]
    else:
        random.Random(args.seed).shuffle(rows)
        n_val = int(len(rows) * args.val_fraction)
        val, train = rows[:n_val], rows[n_val:]

    pd.DataFrame(train).to_csv(args.out_train, index=False)
    pd.DataFrame(val).to_csv(args.out_val, index=False)
    print(f"wrote {len(train)} train / {len(val)} val complexes")


if __name__ == "__main__":
    main()
