"""Diagnose the affinity-head eval-mode blowup (round-4).

Loads the live conf_affinity checkpoint, rebuilds the val FilteringDataset
from the committed cache, and runs the SAME batch through the model in
train-mode (batch statistics) vs eval-mode (running statistics), printing
the affinity predictions and per-layer activation scales.  CPU-only so it
can run while the chip job continues.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from diffdock_pocket_tpu.utils import checkpoint as ckpt
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import get_model
from diffdock_pocket_tpu.confidence.dataset import (
    FilteringDataset, combine_pose_caches, load_affinity_index)
from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu import graph as graphlib

RUN = "results/corpus/workdir/conf_affinity"
CACHE = "results/corpus/cache_affinity"

cfg = ckpt.load_yaml_config(RUN)
data_cfg = ckpt.load_data_config(RUN)
state = ckpt.load_checkpoint(os.path.join(RUN, "last_model"))
params, batch_stats = state["params"], state["batch_stats"]
model = get_model(cfg)
P = cfg.parallel

df_val = pd.read_csv("results/corpus/conf_val.csv")
val_set = ds.DockingDataset(df_val, data_cfg, cache_dir=CACHE, esm_embeddings=None)
poses = combine_pose_caches([os.path.join(CACHE, "poses", "val", "poses_id1.pkl")])
aff = load_affinity_index("results/corpus/affinity_index.txt")
val_fd = FilteringDataset(val_set, poses, 2.0, 1.0, affinities=aff, parallel=P)

rng = np.random.default_rng(0)
exs = [val_fd.get(i, rng) for i in range(len(val_fd))]
exs = [e for e in exs if e is not None][:2]
flat = [d for dsx, _, _, _ in exs for d in dsx]
g = graphlib.stack([graphlib.from_raw(d.raw) for d in flat])
tvals = jnp.zeros((len(flat),), jnp.float32)
t = {k: tvals for k in ("tr", "rot", "tor", "sc_tor")}

out_eval = model.apply({"params": params, "batch_stats": batch_stats},
                       g, t, None, train=False)
out_train, _ = model.apply({"params": params, "batch_stats": batch_stats},
                           g, t, None, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           mutable=["batch_stats"])
for name, out in (("eval", out_eval), ("train", out_train)):
    conf, affp = out
    print(f"{name}: filtering logits {np.asarray(conf).ravel()[:8]}")
    print(f"{name}: affinity z-preds {np.asarray(affp).ravel()}")

# per-layer intermediate capture in both modes
inter_eval = model.apply({"params": params, "batch_stats": batch_stats},
                         g, t, None, train=False,
                         capture_intermediates=True, mutable=["intermediates"])
_, inter_train = model.apply({"params": params, "batch_stats": batch_stats},
                             g, t, None, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats", "intermediates"])
ie = inter_eval[1]["intermediates"] if isinstance(inter_eval, tuple) else {}
it = inter_train["intermediates"]


def scales(tree, tag):
    rows = []
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(v)
        if a.size:
            rows.append((float(np.abs(a).max()), jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    print(f"-- {tag}: top activation |max| --")
    for m, p in rows[:12]:
        print(f"  {m:12.4e}  {p}")


scales(ie, "eval")
scales(it, "train")
