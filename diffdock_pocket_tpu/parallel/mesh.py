"""Device-mesh data parallelism (the TPU-native replacement for the
reference's PyG DataParallel + torch.multiprocessing fan-out).

Reference parallelism is pure data parallelism over complexes/samples
(SURVEY.md §2.2; utils/utils.py:110-112 DataParallel, inference.py:466-490
multiprocessing pools).  Here:

- one mesh axis ``dp`` over all chips;
- training: batch sharded on ``dp``, parameters replicated; XLA/GSPMD inserts
  the gradient psum over ICI automatically under jit-with-shardings;
- inference: samples x complexes sharded on ``dp`` with zero collectives
  (every shard computes its own poses).

The model is tens of M params — far below the threshold where TP/PP/FSDP
would pay; DP over ICI is the right (and the reference-equivalent) scaling
axis.  The mesh helpers still leave room for extra axes later.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch/sample) axis of every array in a pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a batched pytree with its leading axis split across the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "dp"):
    """jit the train step with explicit shardings: state replicated, batch
    sharded on ``dp``.  GSPMD lowers the parameter-gradient reduction to a
    psum over ICI; the masked batch-norm statistics likewise become
    cross-device means — identical semantics to single-chip large-batch
    training."""
    state_sh = replicated(mesh)
    data_sh = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        # (state, key, batch, tables) — tables replicated like the state
        in_shardings=(state_sh, state_sh, data_sh, state_sh),
        out_shardings=(state_sh, state_sh),
    )


def make_sharded_sampler(run_batch, mesh: Mesh, axis: str = "dp"):
    """jit the whole reverse-diffusion run with samples sharded on ``dp`` —
    embarrassingly parallel; XLA inserts no collectives."""
    data_sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    return jax.jit(
        run_batch,
        in_shardings=(rep, data_sh, rep),
    )
