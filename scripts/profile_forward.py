"""Profile the score-model forward on the real TPU at 3dpf bucket sizes.

Times the full forward and ablations (confidence mode = no heads; fewer
layers) to locate the hot spots.  Run: python scripts/profile_forward.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime

runtime.setup()

import dataclasses

import jax
import jax.numpy as jnp

from diffdock_pocket_tpu import graph as graphlib
from diffdock_pocket_tpu import pipeline, tables
from diffdock_pocket_tpu.data import featurize
from diffdock_pocket_tpu.models.config import BIG_SCORE_CONFIG
from diffdock_pocket_tpu.models.score_model import get_model

EX = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
B = int(os.environ.get("B", "8"))


def _sync(out):
    # block_until_ready is unreliable through the axon tunnel; force a host
    # fetch of a scalar reduction instead
    leaves = jax.tree.leaves(out)
    return float(sum(jnp.sum(l) for l in leaves))


def timeit(fn, *args, n=5):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n


def bench_cfg(name, cfg, g, t):
    model = get_model(cfg)
    variables = pipeline.init_random_variables(cfg, g)
    so3 = tables.so3_tables()
    torus = tables.torus_tables()

    @jax.jit
    def fwd(v, g_, t_):
        if cfg.confidence_mode:
            sn = None
        else:
            _, s_rot, s_tor, s_sc = cfg.sigma.t_to_sigma(t_["tr"], t_["rot"], t_["tor"], t_["sc_tor"])
            sn = {"rot": so3.score_norm(s_rot), "tor": torus.score_norm(s_tor),
                  "sc_tor": torus.score_norm(s_sc)}
        return model.apply(v, g_, t_, sn)

    dt = timeit(fwd, variables, g, t)
    print(f"{name:40s} {dt * 1000:8.1f} ms")
    return dt


def main():
    data = featurize.build_complex(
        os.path.join(EX, "3dpf_ligand.sdf"), os.path.join(EX, "3dpf_protein.pdb"),
        featurize.DataConfig(), name="3dpf",
    )
    g1 = graphlib.from_raw(data.raw)
    g = graphlib.replicate(g1, B)
    t = {k: jnp.full((B,), 0.5) for k in ("tr", "rot", "tor", "sc_tor")}
    print(f"B={B} NL={g1.n_lig} NR={g1.n_rec} NA={g1.n_atom} T={g1.n_tor} S={g1.n_sc}")

    cfg = BIG_SCORE_CONFIG
    bench_cfg("full forward (6 layers + heads)", cfg, g, t)
    bench_cfg("confidence mode (6 layers, no heads)",
              dataclasses.replace(cfg, confidence_mode=True), g, t)
    bench_cfg("3 layers + heads",
              dataclasses.replace(cfg, num_conv_layers=3), g, t)
    bench_cfg("6 layers, no flex sidechains (no sc head)",
              dataclasses.replace(cfg, flexible_sidechains=False), g, t)
    bench_cfg("6 layers, no torsion head",
              dataclasses.replace(cfg, no_torsion=True, flexible_sidechains=False), g, t)


if __name__ == "__main__":
    main()
