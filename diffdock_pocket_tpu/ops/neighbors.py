"""Static-capacity neighbor search on device (replaces torch_cluster).

The reference rebuilds dynamic-shape radius/kNN graphs on every forward
(torch_cluster calls at models/score_model.py:491,563-568 and
all_atom_score_model.py:457,524,545-564).  TPU-native equivalents here keep
*static* shapes:

- ``pairwise_dist2``: masked dense distance blocks (pocket-scale point sets
  are small, so dense [Na, Nb] maps straight onto the MXU/VPU),
- ``topk_neighbors``: fixed-K nearest-neighbor lists via top_k over masked
  distances (used for ligand radius graphs, atom kNN graphs, cross edges),
- dense adjacency masks for the pair-block message-passing formulation.

All functions take a leading batch axis [B, ...] and are jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e9


def pairwise_dist2(
    pos_a: Array, mask_a: Array, pos_b: Array, mask_b: Array
) -> tuple[Array, Array]:
    """Squared distances [B, Na, Nb] and validity mask [B, Na, Nb]."""
    diff = pos_a[..., :, None, :] - pos_b[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    valid = mask_a[..., :, None] & mask_b[..., None, :]
    return d2, valid


def radius_adjacency(
    pos_a: Array,
    mask_a: Array,
    pos_b: Array,
    mask_b: Array,
    cutoff: Array,
) -> Array:
    """Dense adjacency [B, Na, Nb]: valid pairs within ``cutoff``.

    ``cutoff`` may be scalar or [B] (per-sample dynamic cutoff, the
    sigma-dependent cross cutoff of the reference, all_atom:263)."""
    d2, valid = pairwise_dist2(pos_a, mask_a, pos_b, mask_b)
    c = jnp.asarray(cutoff)
    if c.ndim == 1:
        c = c[:, None, None]
    return valid & (d2 < c * c)


def topk_neighbors(
    pos_a: Array,
    mask_a: Array,
    pos_b: Array,
    mask_b: Array,
    k: int,
    cutoff: float | Array | None = None,
    exclude_self: bool = False,
    approx: bool = False,
) -> tuple[Array, Array]:
    """For each point in ``a``: indices of its K nearest valid points in ``b``.

    Returns (idx [B, Na, K] int32, valid [B, Na, K] bool).  ``exclude_self``
    removes the diagonal (a and b are the same point set).  ``cutoff`` further
    restricts to a radius (radius-graph-with-cap semantics, matching
    torch_cluster's radius_graph(max_num_neighbors=K)).
    """
    d2, valid = pairwise_dist2(pos_a, mask_a, pos_b, mask_b)
    if exclude_self:
        n = d2.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        valid = valid & ~eye
    if cutoff is not None:
        c = jnp.asarray(cutoff)
        if c.ndim == 1:
            c = c[:, None, None]
        valid = valid & (d2 < c * c)
    masked = jnp.where(valid, d2, _BIG)
    if approx and jax.default_backend() == "tpu":
        # TPU-native approximate selection (recall >= ~0.95); avoids the
        # sort-based top_k, whose cost inside lax.scan loops is pathological
        neg, idx = jax.lax.approx_max_k(-masked, k)
    else:
        neg, idx = jax.lax.top_k(-masked, k)  # smallest distances
    k_valid = (-neg) < _BIG / 2
    return idx.astype(jnp.int32), k_valid


def gather_nodes(x: Array, idx: Array) -> Array:
    """Batched gather: x [B, N, F], idx [B, ...] -> [B, ..., F]."""
    B = x.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(x, flat[..., None], axis=1)
    return out.reshape(idx.shape + (x.shape[-1],))
