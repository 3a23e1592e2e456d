"""Offline evaluation of prediction directories against ground truth.

Usage parity with the reference harness (evaluate_files.py:23-431): walk a
results directory of per-complex rank{k}*.sdf poses (+ rank{k}_protein.pdb
receptors), compare against the true ligand/receptor, and report
symmetry-corrected RMSDs, centroid distances, side-chain RMSDs, steric
clashes, and top-1/5/10 aggregates.  Saves per-complex arrays as .npy and a
summary JSON.

    python evaluate_files.py --results_path results/user_inference \
        --data_csv data/testset_csv.csv [--flexible_sidechains]
"""
import argparse
import glob
import json
import logging
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdock_pocket_tpu import evaluation as ev  # noqa: E402
from diffdock_pocket_tpu.data import sdf as sdfio  # noqa: E402
from diffdock_pocket_tpu.data import dataset as ds  # noqa: E402
from diffdock_pocket_tpu.data.pdb import parse_pdb  # noqa: E402

logger = logging.getLogger(__name__)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results_path", required=True)
    p.add_argument("--data_csv", required=True,
                   help="table with complex_name, experimental_protein, ligand")
    p.add_argument("--flexible_sidechains", action="store_true")
    p.add_argument("--max_autos", type=int, default=256,
                   help="cap on ligand automorphisms for symmetry RMSD")
    p.add_argument("--out_json", type=str, default=None)
    p.add_argument("--names_no_rec_overlap", type=str, default=None,
                   help="txt of complex names without receptor overlap with "
                        "the training set; adds a no_overlap_* metric slice "
                        "(reference evaluate_files.py:257-280)")
    return p


def ranked_poses(complex_dir: str):
    """[(rank, confidence|None, path)] sorted by rank."""
    out = []
    for path in glob.glob(os.path.join(complex_dir, "rank*.sdf")):
        base = os.path.basename(path)
        if "relaxed" in base or "reverseprocess" in base:
            continue
        m = re.match(r"rank(\d+)(?:_confidence(-?[\d.]+))?\.sdf", base)
        if not m:
            continue
        out.append((int(m.group(1)), float(m.group(2)) if m.group(2) else None, path))
    return sorted(out)


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    df = ds.load_protein_ligand_df(args.data_csv)

    per_complex_rmsds = []
    per_complex_centroid = []
    sc_rmsds_top1 = []
    clash_counts_top1 = []
    names = []

    for _, row in df.iterrows():
        name = str(row["complex_name"])
        cdir = os.path.join(args.results_path, name)
        if not os.path.isdir(cdir):
            continue
        true_mol = sdfio.read_molecule(row["ligand_path"], remove_hs=True)
        if true_mol is None:
            continue
        poses = ranked_poses(cdir)
        if not poses:
            continue
        rmsds, cents = [], []
        for rank, conf, path in poses:
            pred = sdfio.read_molecule(path, remove_hs=True)
            if pred is None or pred.n_atoms != true_mol.n_atoms:
                rmsds.append(np.inf)
                cents.append(np.inf)
                continue
            try:
                r = ev.symmetry_rmsd(
                    true_mol, pred.coords, true_mol.coords, max_autos=args.max_autos
                )
            except Exception:
                r = ev.rmsd(pred.coords, true_mol.coords)
            rmsds.append(r)
            cents.append(ev.centroid_distance(pred.coords, true_mol.coords))
        per_complex_rmsds.append(np.asarray(rmsds))
        per_complex_centroid.append(np.asarray(cents))
        names.append(name)

        # top-1 receptor metrics
        prot_path = os.path.join(cdir, "rank1_protein.pdb")
        if os.path.exists(prot_path) and os.path.exists(str(row["experimental_protein"])):
            pred_rec = parse_pdb(prot_path)
            pred_atoms = pred_rec.atom_coords()
            elements = [a.element for a in pred_rec.get_atoms()]
            pred_lig = sdfio.read_molecule(poses[0][2], remove_hs=True)
            if pred_lig is not None:
                clash_counts_top1.append((len(names) - 1, ev.rec_lig_clashes(
                    pred_atoms, elements, pred_lig.coords, pred_lig.symbols
                )))
            if args.flexible_sidechains:
                true_rec = parse_pdb(str(row["experimental_protein"]))
                true_rec.remove_hydrogens()
                ta = true_rec.atom_coords()
                if len(ta) == len(pred_atoms):
                    sc_rmsds_top1.append((len(names) - 1, ev.rmsd(pred_atoms, ta)))

    def summarize(keep):
        """Metric block over the complexes whose index passes ``keep``."""
        rmsds = [r for i, r in enumerate(per_complex_rmsds) if keep(i)]
        cents = [c for i, c in enumerate(per_complex_centroid) if keep(i)]
        s = ev.summarize_rmsds(rmsds)
        top1_cent = np.asarray([c[0] for c in cents if len(c)])
        s.update({
            "n_complexes": len(rmsds),
            "top1_centroid_below_2": float(np.mean(top1_cent < 2.0)) if len(top1_cent) else 0.0,
            "top1_centroid_below_5": float(np.mean(top1_cent < 5.0)) if len(top1_cent) else 0.0,
        })
        cc = np.asarray([v for i, v in clash_counts_top1 if keep(i)])
        if len(cc):
            s["top1_steric_clash_fraction"] = float(np.mean(cc > 0))
            s["top1_mean_clashes"] = float(cc.mean())
        sc = np.asarray([v for i, v in sc_rmsds_top1 if keep(i)])
        if len(sc):
            s["top1_sc_rmsd_below_025"] = float(np.mean(sc < 0.25))
            s["top1_sc_rmsd_below_05"] = float(np.mean(sc < 0.5))
            s["top1_sc_rmsd_below_1"] = float(np.mean(sc < 1.0))
        return s

    summary = summarize(lambda i: True)
    if args.names_no_rec_overlap:
        from diffdock_pocket_tpu.utils.misc import read_strings_from_txt

        keep_names = set(read_strings_from_txt(args.names_no_rec_overlap))
        no_overlap = summarize(lambda i: names[i] in keep_names)
        summary.update({f"no_overlap_{k}": v for k, v in no_overlap.items()})

    np.save(os.path.join(args.results_path, "rmsds.npy"),
            np.asarray(per_complex_rmsds, dtype=object), allow_pickle=True)
    np.save(os.path.join(args.results_path, "names.npy"), np.asarray(names))
    out_json = args.out_json or os.path.join(args.results_path, "summary.json")
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
