"""General GNINA/SMINA runner for arbitrary ligand directories.

Parity with reference baselines/run_gnina_general.py:1-102+: dock every
ligand file in --ligand_dir against one --protein_path, optionally seeded /
boxed around a --seed_molecule_path pose (autobox), whole-protein or pocket
mode, optional flexible side chains within --flexdist of the seed molecule,
wall-time logging per ligand.  Used for linker-design-style screens where
many ligands target one receptor.

The gnina binary is external; the runner gates on --gnina_path or $GNINA.
"""
import argparse
import logging
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger(__name__)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ligand_dir", type=str, required=True,
                   help="directory of ligand files (sdf/mol2/pdb)")
    p.add_argument("--protein_path", type=str, required=True)
    p.add_argument("--results_path", type=str, default="results/gnina_general")
    p.add_argument("--seed_molecule_path", type=str, default=None,
                   help="box/flex reference pose; defaults to each ligand")
    p.add_argument("--gnina_path", type=str, default=os.environ.get("GNINA", "gnina"))
    p.add_argument("--smina", action="store_true")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--exhaustiveness", type=int, default=8)
    p.add_argument("--num_cpu", type=int, default=16)
    p.add_argument("--pocket_mode", action="store_true",
                   help="box around the seed molecule instead of whole protein")
    p.add_argument("--num_modes", type=int, default=10)
    p.add_argument("--autobox_add", type=int, default=4)
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--flexdist", type=float, default=-1,
                   help="-1 disables flexible side chains")
    p.add_argument("--flex_max", type=int, default=-1)
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    if not (os.path.isabs(args.gnina_path) and os.path.exists(args.gnina_path)):
        import shutil

        if shutil.which(args.gnina_path) is None:
            raise SystemExit(
                f"gnina binary not found ({args.gnina_path}); install gnina "
                "or point --gnina_path/$GNINA at it"
            )
    os.makedirs(args.results_path, exist_ok=True)

    ligands = sorted(
        f for f in os.listdir(args.ligand_dir)
        if f.rsplit(".", 1)[-1].lower() in ("sdf", "mol2", "pdb")
    )
    logger.info("%d ligands against %s", len(ligands), args.protein_path)

    times = []
    for name in ligands:
        stem = name.rsplit(".", 1)[0]
        out_sdf = os.path.join(args.results_path, f"{stem}_gnina.sdf")
        log_path = os.path.join(args.results_path, f"{stem}_gnina.log")
        if args.skip_existing and os.path.exists(out_sdf):
            continue
        lig_path = os.path.join(args.ligand_dir, name)
        seed = args.seed_molecule_path or lig_path

        cmd = [
            args.gnina_path,
            "--receptor", args.protein_path,
            "--ligand", lig_path,
            "--num_modes", str(args.num_modes),
            "--exhaustiveness", str(args.exhaustiveness),
            "--cpu", str(args.num_cpu),
            "-o", out_sdf,
            "--log", log_path,
        ]
        if args.pocket_mode:
            cmd += ["--autobox_ligand", seed, "--autobox_add", str(args.autobox_add)]
        if args.smina:
            cmd += ["--scoring", "vinardo", "--cnn_scoring", "none"]
        if args.no_gpu:
            cmd += ["--no_gpu"]
        if args.flexdist > 0:
            cmd += ["--flexdist", str(args.flexdist), "--flexdist_ligand", seed]
            if args.flex_max > 0:
                cmd += ["--flex_max", str(args.flex_max)]

        t0 = time.time()
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            logger.error("gnina failed for %s: %s", name, e.stderr[-500:])
            continue
        dt = time.time() - t0
        times.append(dt)
        logger.info("%s done in %.1fs -> %s", name, dt, out_sdf)

    if times:
        logger.info(
            "docked %d ligands, mean %.1fs median %.1fs total %.1fs",
            len(times), sum(times) / len(times),
            sorted(times)[len(times) // 2], sum(times),
        )


if __name__ == "__main__":
    main()
