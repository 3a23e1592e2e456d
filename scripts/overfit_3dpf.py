"""End-to-end learning sanity: overfit a score model on the single 3dpf
complex, then sample and measure ligand RMSD to the crystal pose.

A correct diffusion/score/training/sampling stack must drive top-1 RMSD
far below the ~32 A random-weight baseline — near or below 2 A when
overfit.  Run on the TPU: python scripts/overfit_3dpf.py [STEPS=400 B=8]
"""
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
from diffdock_pocket_tpu.models.config import SMALL_SCORE_CONFIG
from diffdock_pocket_tpu.models.score_model import get_model

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
STEPS = int(os.environ.get("STEPS", "400"))
B = int(os.environ.get("B", "8"))


def main():
    data = featurize.build_complex(
        os.path.join(EX, "3dpf_ligand.sdf"), os.path.join(EX, "3dpf_protein.pdb"),
        featurize.DataConfig(), name="3dpf",
    )
    g1 = graphlib.from_raw(data.raw)
    g = graphlib.replicate(g1, B)

    cfg = dataclasses.replace(SMALL_SCORE_CONFIG, dropout=0.0)
    model = get_model(cfg)
    variables = pipeline.init_random_variables(cfg, g)
    noise_cfg = training.NoiseConfig(
        no_torsion=cfg.no_torsion, flexible_sidechains=cfg.flexible_sidechains
    )
    optimizer = optax.adam(1e-3)
    step_fn = jax.jit(training.make_train_step(model, optimizer, cfg.sigma, noise_cfg))
    tbl = tables.all_tables()
    state = training.create_train_state(variables, optimizer)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        state, aux = step_fn(state, sub, g, tbl)
        if i % 50 == 0 or i == STEPS - 1:
            print(f"step {i:4d} loss {float(aux['loss']):.4f} "
                  f"(tr {float(aux['tr_loss']):.3f} rot {float(aux['rot_loss']):.3f} "
                  f"tor {float(aux['tor_loss']):.3f} sc {float(aux['sc_tor_loss']):.3f})")
    print(f"trained {STEPS} steps in {time.time() - t0:.1f}s")

    # sample with the EMA weights
    pipe = pipeline.DockingPipeline(
        model_cfg=cfg,
        variables={"params": state.ema.params, "batch_stats": state.batch_stats},
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=20, flexible_sidechains=cfg.flexible_sidechains
        ),
        samples_per_complex=8, batch_size=8,
    )
    result = pipe.dock(data, jax.random.PRNGKey(1))
    nl = len(data.raw["lig_pos"])
    true = data.raw["lig_orig_pos"]
    rmsds = np.asarray(
        [evaluation.rmsd(result.lig_pos[s][:nl], true) for s in range(8)]
    )
    print("sample RMSDs (A):", np.round(np.sort(rmsds), 2))
    print(f"best {rmsds.min():.2f} A, median {np.median(rmsds):.2f} A")


if __name__ == "__main__":
    main()
