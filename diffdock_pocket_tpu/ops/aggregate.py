"""Masked aggregation primitives (replaces torch_scatter).

The pair-block / K-list message-passing formulation needs only axis
reductions and an occasional scatter for reversed edge sets; everything is
masked so padded nodes/edges contribute exactly nothing (reference semantics:
scatter(reduce='mean') over real edges, models/score_model.py:117).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_mean(msgs: Array, mask: Array, axis: int) -> Array:
    """Mean of ``msgs`` over ``axis`` counting only ``mask`` entries.

    msgs [..., F], mask broadcastable to msgs[..., 0]-shape.  Nodes with zero
    valid edges yield 0 (reference: scatter-mean over an empty set is 0).
    """
    m = mask.astype(msgs.dtype)[..., None]
    s = jnp.sum(msgs * m, axis=axis)
    c = jnp.sum(m, axis=axis)
    return s / jnp.maximum(c, 1.0)


def masked_sum(msgs: Array, mask: Array, axis: int) -> Array:
    m = mask.astype(msgs.dtype)[..., None]
    return jnp.sum(msgs * m, axis=axis)


def scatter_mean_batched(
    msgs: Array, index: Array, mask: Array, num_out: int
) -> Array:
    """Batched masked scatter-mean: msgs [B, E, F], index [B, E] -> [B, N, F].

    Used for reversed edge sets where messages land on the *other* side of a
    K-neighbor list (e.g. ligand->atom 'al' updates, all_atom:294-296) and for
    atom->residue pooling ('ra', all_atom:310-312).
    """
    def one(m, i, k):
        w = k.astype(m.dtype)
        s = jax.ops.segment_sum(m * w[:, None], i, num_segments=num_out)
        c = jax.ops.segment_sum(w, i, num_segments=num_out)
        return s / jnp.maximum(c, 1.0)[:, None]

    return jax.vmap(one)(msgs, index, mask)


def scatter_sum_batched(
    msgs: Array, index: Array, mask: Array, num_out: int
) -> Array:
    def one(m, i, k):
        w = k.astype(m.dtype)
        return jax.ops.segment_sum(m * w[:, None], i, num_segments=num_out)

    return jax.vmap(one)(msgs, index, mask)
