"""Re-insert gnina --out_flex side chains into full receptor structures.

Parity with reference evaluation/get_orig_flex.py:20-176: gnina's flexible
docking writes only the moved side-chain atoms (flex.pdb, possibly
multi-MODEL); for fair evaluation those must be merged back into the full
receptor.  Matching is by (chain, residue seq, atom name).
"""
import argparse
import copy
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data.pdb import parse_pdb, write_pdb


def merge_flex(full_model, flex_model):
    merged = copy.deepcopy(full_model)
    index = {}
    for chain in merged.chains:
        for res in chain.residues:
            for atom in res.atoms:
                index[(chain.id.strip(), res.seq, atom.name)] = atom
    n = 0
    for chain in flex_model.chains:
        for res in chain.residues:
            for atom in res.atoms:
                key = (chain.id.strip(), res.seq, atom.name)
                tgt = index.get(key)
                if tgt is not None:
                    tgt.coord = atom.coord
                    n += 1
    return merged, n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results_path", required=True, help="gnina output dirs")
    p.add_argument("--data_csv", required=True)
    p.add_argument("--flex_name", default="flex.pdb")
    p.add_argument("--out_name", default="full_flex_{model}.pdb")
    args = p.parse_args()

    df = ds.load_protein_ligand_df(args.data_csv)
    for _, row in df.iterrows():
        name = str(row["complex_name"])
        flex_path = os.path.join(args.results_path, name, args.flex_name)
        if not os.path.exists(flex_path):
            continue
        full = parse_pdb(str(row["experimental_protein"]))
        flex_models = parse_pdb(flex_path, all_models=True)
        if not isinstance(flex_models, list):
            flex_models = [flex_models]
        for mi, fm in enumerate(flex_models):
            merged, n = merge_flex(full, fm)
            out = os.path.join(
                args.results_path, name, args.out_name.format(model=mi + 1)
            )
            write_pdb(out, merged)
            print(f"{name} model {mi + 1}: merged {n} flex atoms -> {out}")


if __name__ == "__main__":
    main()
