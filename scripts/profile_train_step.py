"""Training-step throughput on the real TPU at 3dpf bucket sizes.

Times the full jitted train step (on-device noise transform + forward with
fused Pallas kernels + custom-VJP backward kernels + 4-term loss + Adam +
EMA) for the big score model.  Run: python scripts/profile_train_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime, tables

runtime.setup()

import jax
import jax.numpy as jnp
import optax

from diffdock_pocket_tpu import graph as graphlib, pipeline, training
from diffdock_pocket_tpu.data import featurize
from diffdock_pocket_tpu.models.config import BIG_SCORE_CONFIG
from diffdock_pocket_tpu.models.score_model import get_model

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
B = int(os.environ.get("B", "8"))


def main():
    data = featurize.build_complex(
        os.path.join(EX, "3dpf_ligand.sdf"), os.path.join(EX, "3dpf_protein.pdb"),
        featurize.DataConfig(), name="3dpf",
    )
    g = graphlib.replicate(graphlib.from_raw(data.raw), B)

    cfg = BIG_SCORE_CONFIG
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

    def run_once():
        nonlocal state, key
        key, sub = jax.random.split(key)
        state, aux = step_fn(state, sub, g, tbl)
        return aux

    aux = run_once()
    print("warmup loss:", float(aux["loss"]))
    n = 10
    t0 = time.time()
    for _ in range(n):
        aux = run_once()
    float(aux["loss"])  # host sync
    dt = (time.time() - t0) / n
    print(f"train step (B={B}, big model): {dt * 1000:.1f} ms "
          f"-> {B / dt:.1f} complexes/s")


if __name__ == "__main__":
    main()
