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
    p.add_argument("--ecdf_plot", type=str, default=None,
                   help="write an RMSD ECDF plot (html via plotly when "
                        "installed, else a matplotlib png/svg; reference "
                        "evaluate_files.py:446-474)")
    p.add_argument("--wandb", action="store_true",
                   help="log the summary metrics (+ ECDF image) to wandb")
    return p


def write_ecdf(path: str, per_complex_rmsds, names):
    """Top-1 RMSD ECDF (reference px.ecdf, evaluate_files.py:446-474)."""
    top1 = np.asarray([r[0] for r in per_complex_rmsds if len(r)])
    top1 = top1[np.isfinite(top1)]
    if not len(top1):
        return None
    try:
        import plotly.express as px

        fig = px.ecdf(x=np.minimum(top1, 10.0),
                      labels={"x": "top-1 RMSD (A)"})
        fig.update_layout(title="Top-1 ligand RMSD ECDF")
        if not path.endswith(".html"):
            path += ".html"
        fig.write_html(path)
        return path
    except ImportError:
        pass
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = np.sort(np.minimum(top1, 10.0))
        ys = np.arange(1, len(xs) + 1) / len(xs)
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.step(xs, ys, where="post")
        ax.axvline(2.0, color="gray", ls="--", lw=1)
        ax.set_xlabel("top-1 RMSD (A, capped at 10)")
        ax.set_ylabel("fraction of complexes")
        ax.set_title("Top-1 ligand RMSD ECDF")
        if not path.endswith((".png", ".svg", ".pdf")):
            path += ".png"
        fig.savefig(path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return path
    except ImportError:
        logger.warning("neither plotly nor matplotlib available; no ECDF plot")
        return None


BACKBONE = {"CA", "N", "C", "O", "OXT"}


def sidechain_rmsd(pred_rec, true_protein_path: str, flex_file: str):
    """Side-chain RMSD over the heavy atoms of the *flexible* residues
    (reference evaluate_files.py:324-339 filters backbone + H; we also
    restrict to the residues the run actually treated as flexible via the
    flexible_residues.txt sidecar — a whole-receptor RMSD would be diluted
    by the frozen atoms).  Atoms are matched by (chain, resid, atom name)
    so pocket-reduced predictions compare against the full truth receptor.
    Returns None when no side-chain atoms can be matched."""
    flex = None
    if os.path.exists(flex_file):
        flex = set()
        with open(flex_file) as fh:
            for line in fh:
                parts = line.strip().split(":")
                if len(parts) >= 2:
                    flex.add((parts[0], int(parts[1])))
    true_rec = parse_pdb(true_protein_path)
    true_map = {}
    for res in true_rec.get_residues():
        for a in res.atoms:
            true_map[(res.chain_id, res.seq, a.name)] = a.coord
    pred_xyz, true_xyz = [], []
    for res in pred_rec.get_residues():
        if flex is not None and (res.chain_id, res.seq) not in flex:
            continue
        for a in res.atoms:
            if a.element == "H" or a.name in BACKBONE:
                continue
            t = true_map.get((res.chain_id, res.seq, a.name))
            if t is not None:
                pred_xyz.append(a.coord)
                true_xyz.append(t)
    if not pred_xyz:
        return None
    return ev.rmsd(np.asarray(pred_xyz), np.asarray(true_xyz))


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
    per_complex_min_cross = []
    per_complex_min_self = []
    sc_rmsds_top1 = []
    sc_rmsds_best = []
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
        prot_path = os.path.join(cdir, "rank1_protein.pdb")
        rec_atoms = rec_elements = None
        if os.path.exists(prot_path):
            pred_rec = parse_pdb(prot_path)
            rec_atoms = pred_rec.atom_coords()
            rec_elements = [a.element for a in pred_rec.get_atoms()]
        rmsds, cents, mcross, mself = [], [], [], []
        for rank, conf, path in poses:
            pred = sdfio.read_molecule(path, remove_hs=True)
            if pred is None or pred.n_atoms != true_mol.n_atoms:
                rmsds.append(np.inf)
                cents.append(np.inf)
                mcross.append(np.inf)
                mself.append(np.inf)
                continue
            try:
                r = ev.symmetry_rmsd(
                    true_mol, pred.coords, true_mol.coords, max_autos=args.max_autos
                )
            except Exception:
                r = ev.rmsd(pred.coords, true_mol.coords)
            rmsds.append(r)
            cents.append(ev.centroid_distance(pred.coords, true_mol.coords))
            # min receptor-ligand / intra-ligand distances (reference
            # evaluate_files.py:244-249)
            if rec_atoms is not None and len(rec_atoms):
                d = np.linalg.norm(
                    rec_atoms[:, None] - pred.coords[None, :], axis=-1
                )
                mcross.append(float(d.min()))
            else:
                mcross.append(np.inf)
            dself = np.linalg.norm(
                pred.coords[:, None] - pred.coords[None, :], axis=-1
            )
            np.fill_diagonal(dself, np.inf)
            mself.append(float(dself.min()) if pred.n_atoms > 1 else np.inf)
        per_complex_rmsds.append(np.asarray(rmsds))
        per_complex_centroid.append(np.asarray(cents))
        per_complex_min_cross.append(np.asarray(mcross))
        per_complex_min_self.append(np.asarray(mself))
        names.append(name)

        # top-1 receptor metrics
        if rec_atoms is not None and os.path.exists(str(row["experimental_protein"])):
            pred_lig = sdfio.read_molecule(poses[0][2], remove_hs=True)
            if pred_lig is not None:
                clash_counts_top1.append((len(names) - 1, ev.rec_lig_clashes(
                    rec_atoms, rec_elements, pred_lig.coords, pred_lig.symbols
                )))
            if args.flexible_sidechains:
                sc = sidechain_rmsd(
                    pred_rec, str(row["experimental_protein"]),
                    os.path.join(cdir, "flexible_residues.txt"),
                )
                if sc is not None:
                    sc_rmsds_top1.append((len(names) - 1, sc))
                # best-sample sc-RMSD over ALL ranked poses (each rank has
                # its own receptor): separates "the sampler can't reach
                # sc<1" from "the confidence ranking doesn't pick it"
                sc_all = []
                for rank, _conf, _path in poses:
                    rp = os.path.join(cdir, f"rank{rank}_protein.pdb")
                    if not os.path.exists(rp):
                        continue
                    s_k = sidechain_rmsd(
                        parse_pdb(rp), str(row["experimental_protein"]),
                        os.path.join(cdir, "flexible_residues.txt"),
                    )
                    if s_k is not None:
                        sc_all.append(s_k)
                if sc_all:
                    sc_rmsds_best.append((len(names) - 1, float(min(sc_all))))

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
        # vdW-overlap fractions over all predictions (reference
        # evaluate_files.py:292-297: min cross/self distance < 0.4 A)
        mc = np.concatenate([
            v for i, v in enumerate(per_complex_min_cross) if keep(i)
        ]) if per_complex_min_cross else np.zeros(0)
        msf = np.concatenate([
            v for i, v in enumerate(per_complex_min_self) if keep(i)
        ]) if per_complex_min_self else np.zeros(0)
        mc, msf = mc[np.isfinite(mc)], msf[np.isfinite(msf)]
        if len(mc):
            s["steric_clash_fraction"] = float(np.mean(mc < 0.4))
        if len(msf):
            s["self_intersect_fraction"] = float(np.mean(msf < 0.4))
        sc = np.asarray([v for i, v in sc_rmsds_top1 if keep(i)])
        if len(sc):
            s["top1_sc_rmsd_below_025"] = float(np.mean(sc < 0.25))
            s["top1_sc_rmsd_below_05"] = float(np.mean(sc < 0.5))
            s["top1_sc_rmsd_below_1"] = float(np.mean(sc < 1.0))
            s["mean_sidechain_rmsd"] = float(sc.mean())
        sc_b = np.asarray([v for i, v in sc_rmsds_best if keep(i)])
        if len(sc_b):
            s["best_sc_rmsd_below_05"] = float(np.mean(sc_b < 0.5))
            s["best_sc_rmsd_below_1"] = float(np.mean(sc_b < 1.0))
            s["mean_best_sidechain_rmsd"] = float(sc_b.mean())
        return s

    summary = summarize(lambda i: True)
    if args.names_no_rec_overlap:
        from diffdock_pocket_tpu.utils.misc import read_strings_from_txt

        keep_names = set(read_strings_from_txt(args.names_no_rec_overlap))
        no_overlap = summarize(lambda i: names[i] in keep_names)
        summary.update({f"no_overlap_{k}": v for k, v in no_overlap.items()})

    np.save(os.path.join(args.results_path, "rmsds.npy"),
            np.asarray(per_complex_rmsds, dtype=object), allow_pickle=True)
    np.save(os.path.join(args.results_path, "min_cross_distances.npy"),
            np.asarray(per_complex_min_cross, dtype=object), allow_pickle=True)
    np.save(os.path.join(args.results_path, "min_self_distances.npy"),
            np.asarray(per_complex_min_self, dtype=object), allow_pickle=True)
    np.save(os.path.join(args.results_path, "names.npy"), np.asarray(names))
    plot_path = None
    if args.ecdf_plot:
        plot_path = write_ecdf(args.ecdf_plot, per_complex_rmsds, names)
        if plot_path:
            logger.info("wrote ECDF plot to %s", plot_path)
    if args.wandb:
        try:
            import wandb

            wandb.init(project="diffdock_pocket_tpu_eval",
                       name=os.path.basename(args.results_path.rstrip("/")))
            wandb.log(summary)
            if plot_path and plot_path.endswith((".png", ".svg")):
                wandb.log({"rmsd_ecdf": wandb.Image(plot_path)})
        except ImportError:
            logger.warning("wandb requested but not installed; skipping")

    out_json = args.out_json or os.path.join(args.results_path, "summary.json")
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
