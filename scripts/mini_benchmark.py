"""Mini-benchmark: the full user workflow on trained weights.

Builds on the multi-complex journey but exercises the PRODUCT surfaces the
way a user would: the trained score + confidence models are saved as run
dirs (model_parameters.yml incl. data_config + orbax checkpoints — the yml
contract), held-out complexes go through the ``inference.py`` CLI from a
protein-ligand CSV (conformers regenerated: blind local structures), and
the predictions are scored by the ``evaluate_files.py`` CLI (symmetry RMSD,
side-chain RMSD over the flexible residues, clashes, ECDF plot).

Run on TPU:  python scripts/mini_benchmark.py
Artifacts in results/mini_bench/ (run dirs, predictions, summary.json).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime, tables

runtime.setup()

import dataclasses

import jax
import numpy as np
import optax
import pandas as pd

from diffdock_pocket_tpu import graph as graphlib, pipeline, sampling, training
from diffdock_pocket_tpu.data import featurize, sdf as sdfio
from diffdock_pocket_tpu.data import dataset as dsmod
from diffdock_pocket_tpu.data.sdf import read_molecule
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.utils import checkpoint as ckpt
from diffdock_pocket_tpu.models.score_model import get_model

from multi_complex_journey import ListDataset, make_fragments  # noqa: E402

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
ROOT = os.path.join("results", "mini_bench")
STEPS = int(os.environ.get("STEPS", "3000"))
SPC = int(os.environ.get("SPC", "16"))
N_FRAGMENTS = 8
HELD_OUT = [3, 6]

CFG = ModelConfig(
    ns=24, nv=6, num_conv_layers=4, sh_lmax=1,
    sigma_embed_dim=32, distance_embed_dim=32, cross_distance_embed_dim=32,
    dynamic_max_cross=True, dropout=0.0, all_atoms=True,
    flexible_sidechains=True, atom_max_neighbors=8,
    cross_lig_rec_max_neighbors=32, cross_rec_lig_max_neighbors=16,
    approx_neighbor_search=True,
)


def main():
    t_start = time.time()
    os.makedirs(ROOT, exist_ok=True)
    protein = os.path.join(EX, "3dpf_protein.pdb")
    lig = read_molecule(os.path.join(EX, "3dpf_ligand.sdf"), remove_hs=True)
    frags = make_fragments(lig, N_FRAGMENTS)

    # ---- write fragment SDFs (crystal coordinates = ground truth) --------
    inputs = os.path.join(ROOT, "inputs")
    os.makedirs(inputs, exist_ok=True)
    lig_paths = []
    for i, f in enumerate(frags):
        p = os.path.join(inputs, f"frag{i}.sdf")
        sdfio.write_sdf(p, f, f.coords, name=f"3dpf_frag{i}")
        lig_paths.append(p)

    # ---- train the score model (library loop), save the run dir ----------
    train_dc = featurize.DataConfig(matching=True, keep_local_structures=False)
    complexes = []
    for i, f in enumerate(frags):
        if i in HELD_OUT:
            complexes.append(None)
            continue
        complexes.append(featurize.build_complex(
            f, protein, train_dc, name=f"3dpf_frag{i}",
            rng=np.random.default_rng(100 + i)))
    train_cs = [c for c in complexes if c is not None]

    model = get_model(CFG)
    optimizer = optax.adam(1e-3)
    step_fn = jax.jit(training.make_train_step(
        model, optimizer, CFG.sigma, training.NoiseConfig()))
    tbl = tables.all_tables()
    graphs = [
        graphlib.stack([graphlib.from_raw(c.raw) for c in b])
        for b in dsmod.bucketed_batches(train_cs, batch_size=len(train_cs))
    ]
    variables = pipeline.init_random_variables(CFG, graphs[0])
    state = training.create_train_state(variables, optimizer)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(STEPS):
        for g in graphs:
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, sub, g, tbl)
        if i % 500 == 0 or i == STEPS - 1:
            print(f"score step {i:5d} loss {float(aux['loss']):.4f} "
                  f"({time.time()-t0:.0f}s)")

    score_dir = os.path.join(ROOT, "score_run")
    ckpt.save_yaml_config(score_dir, CFG, data_cfg=train_dc)
    ckpt.save_checkpoint(
        os.path.join(score_dir, "best_ema_inference_epoch_model"),
        {"params": state.ema.params, "batch_stats": state.batch_stats},
    )

    # ---- confidence model: generate + train, save run dir ----------------
    from diffdock_pocket_tpu.confidence.dataset import (
        FilteringDataset, combine_pose_caches, generate_poses,
    )
    from diffdock_pocket_tpu.confidence.train import ConfidenceTrainer

    ema_vars = {"params": state.ema.params, "batch_stats": state.batch_stats}
    gen_pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        samples_per_complex=8, batch_size=8,
    )
    train_ds = ListDataset(train_cs)
    pose_path = generate_poses(gen_pipe, train_ds, os.path.join(ROOT, "poses"),
                               cache_creation_id=1, seed=0)
    poses = combine_pose_caches([pose_path])
    conf_cfg = dataclasses.replace(
        CFG, ns=16, nv=4, num_conv_layers=3, confidence_mode=True,
    )
    conf_dir = os.path.join(ROOT, "conf_run")
    trainer = ConfidenceTrainer(
        conf_cfg, FilteringDataset(train_ds, poses),
        FilteringDataset(train_ds, poses),
        run_dir=conf_dir, batch_size=8, lr=3e-4, data_cfg=train_dc,
    )
    trainer.fit(n_epochs=30)

    # ---- held-out CSV -> inference.py CLI ---------------------------------
    rows = [{
        "complex_name": f"3dpf_frag{i}",
        "experimental_protein": protein,
        "ligand": lig_paths[i],
    } for i in HELD_OUT]
    csv_path = os.path.join(ROOT, "heldout.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    pred_dir = os.path.join(ROOT, "predictions")
    cli = [
        sys.executable, "inference.py",
        "--protein_ligand_csv", csv_path,
        "--score_model_dir", score_dir,
        "--filtering_model_dir", conf_dir, "--filtering_ckpt", "best_model",
        "--samples_per_complex", str(SPC), "--batch_size", str(SPC),
        "--inference_steps", "20",
        "--out_dir", pred_dir,
    ]
    print("running:", " ".join(cli))
    subprocess.run(cli, check=True, cwd=os.path.join(os.path.dirname(__file__), os.pardir))

    # ---- evaluate_files.py CLI -------------------------------------------
    eval_cli = [
        sys.executable, "evaluate_files.py",
        "--results_path", pred_dir, "--data_csv", csv_path,
        "--flexible_sidechains",
        "--ecdf_plot", os.path.join(ROOT, "rmsd_ecdf"),
        "--out_json", os.path.join(ROOT, "summary.json"),
    ]
    print("running:", " ".join(eval_cli))
    subprocess.run(eval_cli, check=True, cwd=os.path.join(os.path.dirname(__file__), os.pardir))

    with open(os.path.join(ROOT, "summary.json")) as fh:
        summary = json.load(fh)
    summary["wall_time_s"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
