"""Extended journey: 16 complexes (8 ligand fragments x {holo, apo}
receptors), the largest on-chip quality run.

Combines the ligand-fragmentation derivation (multi_complex_journey) with
the perturbed-receptor apo derivation (apo_journey): every fragment is
featurized against BOTH the crystal receptor and the chi-perturbed apo
receptor (through side-chain conformer matching), giving 16 distinct
complexes.  Fragments 3 and 6 are held out across BOTH receptors (the model
never sees those ligand graphs), so the held-out set has 4 complexes.
Reports held-out docking + confidence-ranked top-1 metrics.

Run on TPU: python scripts/extended_journey.py
Writes results/extended_journey.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime, tables

runtime.setup()

import dataclasses

import jax
import numpy as np
import optax

from diffdock_pocket_tpu import evaluation, graph as graphlib, pipeline, sampling, training
from diffdock_pocket_tpu.data import featurize
from diffdock_pocket_tpu.data import dataset as dsmod
from diffdock_pocket_tpu.data.sdf import read_molecule
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import get_model

from apo_journey import make_apo  # noqa: E402
from multi_complex_journey import ListDataset, make_fragments  # noqa: E402

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
STEPS = int(os.environ.get("STEPS", "3000"))
SPC = int(os.environ.get("SPC", "16"))
GEN_SPC = int(os.environ.get("GEN_SPC", "16"))
CONF_NS = int(os.environ.get("CONF_NS", "24"))
CONF_NV = int(os.environ.get("CONF_NV", "6"))
CONF_LAYERS = int(os.environ.get("CONF_LAYERS", "4"))
CONF_EPOCHS = int(os.environ.get("CONF_EPOCHS", "60"))
N_FRAGMENTS = 8
HELD_OUT_FRAGS = {3, 6}

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
    os.makedirs("results", exist_ok=True)
    holo = os.path.join(EX, "3dpf_protein.pdb")
    apo_path = os.path.join("results", "apo_3dpf_ext.pdb")
    rng = np.random.default_rng(1)
    apo_before, n_flex = make_apo(holo, os.path.join(EX, "3dpf_ligand.sdf"),
                                  apo_path, rng)
    print(f"apo receptor: {n_flex} flexible atoms perturbed, "
          f"sc-RMSD {apo_before:.2f} A")

    lig = read_molecule(os.path.join(EX, "3dpf_ligand.sdf"), remove_hs=True)
    frags = make_fragments(lig, N_FRAGMENTS)

    dc_holo = featurize.DataConfig(matching=True, keep_local_structures=False)
    dc_apo = featurize.DataConfig(
        matching=True, keep_local_structures=False,
        conformer_match_sidechains=True, conformer_match_score="exp",
        match_max_rmsd=2.0,
    )
    complexes = []  # (frag_idx, receptor_tag, ComplexData)
    for i, f in enumerate(frags):
        for tag, dc, comp in (("holo", dc_holo, None), ("apo", dc_apo, apo_path)):
            t0 = time.time()
            data = featurize.build_complex(
                f, holo, dc, name=f"frag{i}_{tag}",
                computational_protein=comp,
                rng=np.random.default_rng(1000 + 10 * i + (tag == "apo")),
            )
            complexes.append((i, tag, data))
            print(f"featurized frag{i}_{tag} in {time.time()-t0:.1f}s")

    train_cs = [d for i, _, d in complexes if i not in HELD_OUT_FRAGS]
    held_cs = [d for i, _, d in complexes if i in HELD_OUT_FRAGS]
    print(f"{len(train_cs)} training complexes, {len(held_cs)} held out")

    # ---- train -----------------------------------------------------------
    model = get_model(CFG)
    optimizer = optax.adam(1e-3)
    step_fn = jax.jit(training.make_train_step(
        model, optimizer, CFG.sigma, training.NoiseConfig()))
    tbl = tables.all_tables()
    rng_np = np.random.default_rng(0)
    groups = [
        graphlib.stack([graphlib.from_raw(c.raw) for c in b])
        for b in dsmod.bucketed_batches(train_cs, batch_size=8,
                                        shuffle_rng=rng_np)
    ]
    print(f"{len(groups)} batches/epoch over {len(train_cs)} complexes")
    variables = pipeline.init_random_variables(CFG, groups[0])
    state = training.create_train_state(variables, optimizer)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(STEPS):
        for g in groups:
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, sub, g, tbl)
        if i % 500 == 0 or i == STEPS - 1:
            print(f"step {i:5d} loss {float(aux['loss']):.4f} ({time.time()-t0:.0f}s)")

    ema_vars = {"params": state.ema.params, "batch_stats": state.batch_stats}

    # ---- confidence ------------------------------------------------------
    from diffdock_pocket_tpu.confidence.dataset import (
        FilteringDataset, combine_pose_caches, generate_poses,
    )
    from diffdock_pocket_tpu.confidence.train import ConfidenceTrainer

    gen_pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        samples_per_complex=GEN_SPC, batch_size=GEN_SPC,
    )
    train_ds = ListDataset(train_cs)
    workdir = os.path.join("results", "ext_journey")
    pose_path = generate_poses(gen_pipe, train_ds, workdir,
                               cache_creation_id=1, seed=0)
    poses = combine_pose_caches([pose_path])
    conf_cfg = dataclasses.replace(
        CFG, ns=CONF_NS, nv=CONF_NV, num_conv_layers=CONF_LAYERS,
        confidence_mode=True,
    )
    trainer = ConfidenceTrainer(
        conf_cfg, FilteringDataset(train_ds, poses),
        FilteringDataset(train_ds, poses),
        run_dir=os.path.join(workdir, "conf"), batch_size=8, lr=3e-4,
    )
    params, batch_stats = trainer.fit(n_epochs=CONF_EPOCHS)

    # ---- held-out ranked docking -----------------------------------------
    pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        confidence_cfg=conf_cfg,
        confidence_variables={"params": params, "batch_stats": batch_stats},
        samples_per_complex=SPC, batch_size=SPC,
    )
    per = {}
    top1s, bests, lt2 = [], [], []
    for data in held_cs:
        key, sub = jax.random.split(key)
        result = pipe.dock(data, sub)
        nl = len(data.raw["lig_pos"])
        true = data.raw["lig_orig_pos"]
        rmsds = np.asarray([
            evaluation.rmsd(result.lig_pos[s][:nl], true) for s in range(SPC)
        ])
        per[data.name] = {
            "top1_rmsd": float(rmsds[0]), "best_rmsd": float(rmsds.min()),
            "median_rmsd": float(np.median(rmsds)),
            "lt2_rate": float(np.mean(rmsds < 2)),
        }
        top1s.append(rmsds[0])
        bests.append(rmsds.min())
        lt2.append(rmsds.min() < 2)
        print(f"{data.name}: top1 {rmsds[0]:.2f} best {rmsds.min():.2f} "
              f"median {np.median(rmsds):.2f}")

    out = {
        "n_train_complexes": len(train_cs),
        "n_held_out": len(held_cs),
        "apo_sc_rmsd_before": float(apo_before),
        "per_complex": per,
        "top1_rmsds_below_2": float(np.mean(np.asarray(top1s) < 2.0)),
        "valinf_rmsds_lt2": float(np.mean(lt2)),
        "mean_top1_rmsd": float(np.mean(top1s)),
        "mean_best_rmsd": float(np.mean(bests)),
        "wall_time_s": round(time.time() - t_start, 1),
    }
    with open("results/extended_journey.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
