"""Multi-complex training + confidence-ranking journey (quality evidence
beyond the single-complex overfit).

Derives >=8 DISTINCT complexes from the vendored 3dpf example by fragmenting
the ligand (terminal heavy atoms removed one at a time — each fragment is a
chemically valid connected substructure whose crystal coordinates are the
ground-truth pose), featurizes them through the real training path
(conformer matching + flexible side chains), trains a small score model on 6
fragments, and reports:

1. valinf_rmsds_lt2 on the 2 HELD-OUT fragments (generalization);
2. the full confidence journey: pose generation with the frozen score model,
   confidence training, and proof that ranking by confidence beats the mean
   sample (top-1-by-confidence RMSD < mean-sample RMSD on held-out).

Run on TPU:  python scripts/multi_complex_journey.py
Env knobs:   STEPS (train steps, default 3000), SPC (samples/complex, 16)
Writes results/multi_complex_journey.json and prints a summary block for
BASELINE.md.
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
import pandas as pd

from diffdock_pocket_tpu import evaluation, graph as graphlib, pipeline, sampling, training
from diffdock_pocket_tpu.data import featurize
from diffdock_pocket_tpu.data import dataset as dsmod
from diffdock_pocket_tpu.data.mol import Bond, Molecule
from diffdock_pocket_tpu.data.sdf import read_molecule
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import get_model

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
STEPS = int(os.environ.get("STEPS", "3000"))
SPC = int(os.environ.get("SPC", "16"))
N_FRAGMENTS = int(os.environ.get("N_FRAGMENTS", "8"))
GEN_SPC = int(os.environ.get("GEN_SPC", "8"))
CONF_EPOCHS = int(os.environ.get("CONF_EPOCHS", "30"))
HELD_OUT = [3, 6] if N_FRAGMENTS >= 7 else [N_FRAGMENTS - 1]

CFG = ModelConfig(
    ns=24, nv=6, num_conv_layers=4, sh_lmax=1,
    sigma_embed_dim=32, distance_embed_dim=32, cross_distance_embed_dim=32,
    dynamic_max_cross=True, dropout=0.0, all_atoms=True,
    flexible_sidechains=True, atom_max_neighbors=8,
    # the capped cross-family architecture (the bench flagship setting) —
    # this journey doubles as its quality validation
    cross_lig_rec_max_neighbors=int(os.environ.get("KLR", "32")),
    cross_rec_lig_max_neighbors=int(os.environ.get("KRL", "16")),
)


def subset_molecule(mol: Molecule, keep: list[int]) -> Molecule:
    remap = {old: new for new, old in enumerate(keep)}
    bonds = [
        Bond(remap[b.a], remap[b.b], b.type)
        for b in mol.bonds
        if b.a in remap and b.b in remap
    ]
    return Molecule(
        [mol.symbols[i] for i in keep], mol.coords[keep], bonds,
        [mol.charges[i] for i in keep], name=mol.name,
    )


def make_fragments(mol: Molecule, n: int) -> list[Molecule]:
    """n DISTINCT fragments: fragment i strips i terminal heavy atoms
    (degree-1 in the heavy-atom graph, seed-dependent random order) from the
    full ligand — each is a connected, chemically valid substructure of a
    different size, so every complex has a distinct ligand graph."""
    frags = [mol]
    for i in range(1, n):
        rng = np.random.default_rng(i)
        cur = mol
        removed = 0
        while removed < i:
            deg = np.zeros(cur.n_atoms, int)
            for b in cur.bonds:
                deg[b.a] += 1
                deg[b.b] += 1
            terminals = np.flatnonzero(deg == 1)
            if not len(terminals):
                break
            drop = int(terminals[rng.integers(len(terminals))])
            cur = subset_molecule(cur, [j for j in range(cur.n_atoms) if j != drop])
            removed += 1
        frags.append(cur)
    sizes = [f.n_atoms for f in frags]
    assert len(set(sizes)) == len(sizes), f"fragments not distinct: {sizes}"
    return frags


class ListDataset:
    """DockingDataset-compatible wrapper over in-memory ComplexData."""

    def __init__(self, items):
        self.items = list(items)
        self.df = pd.DataFrame({"complex_name": [d.name for d in self.items]})

    def __len__(self):
        return len(self.items)

    def get(self, i):
        return self.items[i]


def dock_and_rmsds(pipe, data, key, n_samples):
    result = pipe.dock(data, key)
    nl = len(data.raw["lig_pos"])
    true = data.raw["lig_orig_pos"]
    rmsds = np.asarray([
        evaluation.rmsd(result.lig_pos[s][:nl], true)
        for s in range(min(n_samples, result.lig_pos.shape[0]))
    ])
    return result, rmsds


def main():
    t_start = time.time()
    lig = read_molecule(os.path.join(EX, "3dpf_ligand.sdf"), remove_hs=True)
    frags = make_fragments(lig, N_FRAGMENTS)
    print("fragment sizes:", [f.n_atoms for f in frags])

    dc = featurize.DataConfig(matching=True, keep_local_structures=False)
    complexes = []
    for i, f in enumerate(frags):
        t0 = time.time()
        data = featurize.build_complex(
            f, os.path.join(EX, "3dpf_protein.pdb"), dc, name=f"3dpf_frag{i}",
            rng=np.random.default_rng(100 + i),
        )
        complexes.append(data)
        print(f"featurized frag{i} ({f.n_atoms} atoms, "
              f"match rmsd {data.rmsd_matching:.2f} A) in {time.time()-t0:.1f}s")

    train_cs = [c for i, c in enumerate(complexes) if i not in HELD_OUT]
    held_cs = [c for i, c in enumerate(complexes) if i in HELD_OUT]

    # ---- score training --------------------------------------------------
    model = get_model(CFG)
    noise_cfg = training.NoiseConfig()
    optimizer = optax.adam(1e-3)
    step_fn = jax.jit(training.make_train_step(model, optimizer, CFG.sigma, noise_cfg))
    tbl = tables.all_tables()

    batches = list(dsmod.bucketed_batches(train_cs, batch_size=len(train_cs)))
    graphs = [graphlib.stack([graphlib.from_raw(c.raw) for c in b]) for b in batches]
    print(f"{len(graphs)} bucket group(s) over {len(train_cs)} training complexes")

    variables = pipeline.init_random_variables(CFG, graphs[0])
    state = training.create_train_state(variables, optimizer)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(STEPS):
        for g in graphs:
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, sub, g, tbl)
        if i % 250 == 0 or i == STEPS - 1:
            print(f"step {i:5d} loss {float(aux['loss']):.4f} "
                  f"({(time.time()-t0):.0f}s)")
    print(f"trained {STEPS} steps in {time.time()-t0:.0f}s")

    ema_vars = {"params": state.ema.params, "batch_stats": state.batch_stats}
    pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        samples_per_complex=SPC, batch_size=SPC,
    )

    # ---- held-out docking metrics -----------------------------------------
    out = {"fragment_sizes": [f.n_atoms for f in frags],
           "held_out": HELD_OUT, "train_steps": STEPS}
    held_rmsds = {}
    for data in held_cs:
        key, sub = jax.random.split(key)
        _, rmsds = dock_and_rmsds(pipe, data, sub, SPC)
        held_rmsds[data.name] = rmsds
        print(f"{data.name}: best {rmsds.min():.2f} A, "
              f"median {np.median(rmsds):.2f} A, lt2-rate {np.mean(rmsds < 2):.2f}")
    best = np.asarray([v.min() for v in held_rmsds.values()])
    out["valinf_rmsds_lt2"] = float(np.mean(best < 2.0))
    out["valinf_rmsds_lt5"] = float(np.mean(best < 5.0))
    out["held_out_best_rmsds"] = {k: float(v.min()) for k, v in held_rmsds.items()}
    out["held_out_median_rmsds"] = {k: float(np.median(v)) for k, v in held_rmsds.items()}

    # ---- confidence journey ------------------------------------------------
    from diffdock_pocket_tpu.confidence.dataset import (
        FilteringDataset, combine_pose_caches, generate_poses,
    )
    from diffdock_pocket_tpu.confidence.train import ConfidenceTrainer

    workdir = os.path.join("results", "journey")
    os.makedirs(workdir, exist_ok=True)
    gen_pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        samples_per_complex=GEN_SPC, batch_size=GEN_SPC,
    )
    train_ds = ListDataset(train_cs)
    pose_path = generate_poses(gen_pipe, train_ds, workdir,
                               cache_creation_id=1, seed=0)
    poses = combine_pose_caches([pose_path])
    labels = {n: (np.asarray(p.rmsds) < 2).mean() for n, p in poses.items()}
    print("pose-cache success rates:", {k: round(v, 2) for k, v in labels.items()})

    conf_cfg = dataclasses.replace(
        CFG, ns=16, nv=4, num_conv_layers=3, confidence_mode=True,
    )
    fd = FilteringDataset(train_ds, poses)
    trainer = ConfidenceTrainer(
        conf_cfg, fd, fd, run_dir=os.path.join(workdir, "conf"),
        batch_size=8, lr=3e-4,
    )
    params, batch_stats = trainer.fit(n_epochs=CONF_EPOCHS)

    # ranked docking on held-out: does confidence ranking beat the mean?
    rank_pipe = pipeline.DockingPipeline(
        model_cfg=CFG, variables=ema_vars,
        sampler_cfg=sampling.SamplerConfig(inference_steps=20),
        confidence_cfg=conf_cfg,
        confidence_variables={"params": params, "batch_stats": batch_stats},
        samples_per_complex=SPC, batch_size=SPC,
    )
    top1, means, bests, rand_top1 = [], [], [], []
    rng = np.random.default_rng(0)
    for data in held_cs:
        key, sub = jax.random.split(key)
        result, rmsds = dock_and_rmsds(rank_pipe, data, sub, SPC)
        # result is ranked by confidence: top-1 = index 0
        top1.append(rmsds[0])
        means.append(rmsds.mean())
        bests.append(rmsds.min())
        rand_top1.append(rmsds[rng.integers(len(rmsds))])
        print(f"{data.name}: conf-top1 {rmsds[0]:.2f} A vs mean {rmsds.mean():.2f} "
              f"best {rmsds.min():.2f}")
    out["conf_top1_rmsd_mean"] = float(np.mean(top1))
    out["sample_mean_rmsd"] = float(np.mean(means))
    out["sample_best_rmsd"] = float(np.mean(bests))
    out["random_top1_rmsd_mean"] = float(np.mean(rand_top1))
    out["confidence_beats_mean"] = bool(np.mean(top1) < np.mean(means))
    out["wall_time_s"] = round(time.time() - t_start, 1)

    os.makedirs("results", exist_ok=True)
    with open("results/multi_complex_journey.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
