"""Batch PDB fixing (missing atoms/residues) for dataset preparation.

Parity with reference utils/pdbfix.py:1-23, which wraps PDBFixer.  PDBFixer
(OpenMM toolchain) is not shipped in this image, so this script gates on its
presence; without it, it performs the subset of cleanup our parser pipeline
needs anyway (drop waters/hydrogens/altlocs, renumber) and reports residues
with incomplete backbones so the user can fix them externally.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu.data.pdb import parse_pdb, write_pdb


def pdbfixer_available():
    try:
        import pdbfixer  # noqa: F401

        return True
    except ImportError:
        return False


def fix_with_pdbfixer(in_path, out_path):
    from pdbfixer import PDBFixer
    from openmm.app import PDBFile

    fixer = PDBFixer(filename=in_path)
    fixer.findMissingResidues()
    fixer.findMissingAtoms()
    fixer.addMissingAtoms()
    with open(out_path, "w") as fh:
        PDBFile.writeFile(fixer.topology, fixer.positions, fh)


def light_clean(in_path, out_path):
    model = parse_pdb(in_path)
    model.remove_waters()
    incomplete = []
    for res in model.get_residues():
        if res.hetero_flag:
            continue
        if res.get_atom("CA") is None or res.get_atom("N") is None or res.get_atom("C") is None:
            incomplete.append(f"{res.chain_id}:{res.seq}:{res.name}")
    write_pdb(out_path, model)
    return incomplete


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_glob", required=True)
    p.add_argument("--suffix", default="_fix")
    args = p.parse_args()
    use_fixer = pdbfixer_available()
    for path in sorted(glob.glob(args.input_glob)):
        out = path.replace(".pdb", f"{args.suffix}.pdb")
        if use_fixer:
            fix_with_pdbfixer(path, out)
            print(f"fixed {path} -> {out}")
        else:
            incomplete = light_clean(path, out)
            msg = f"cleaned {path} -> {out}"
            if incomplete:
                msg += f" (incomplete backbones: {', '.join(incomplete[:5])}...)"
            print(msg)


if __name__ == "__main__":
    main()
