"""Node feature encoders (categorical embeddings + scalar/LM projections).

Parity: AtomEncoder / OldAtomEncoder (reference: models/score_model.py:17-82).
Feature dimension tables match datasets/process_mols.py:70-97 via
data/chem.py.  Batch-first, mask-agnostic (padded rows embed slot 0 and are
masked downstream).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class AtomEncoder(nn.Module):
    """Sum of per-category embeddings, then Linear([emb || extra]) -> emb.

    ``extra`` carries the sigma embedding (and the ESM embedding for receptor
    residues).  This is the reference's new-style AtomEncoder
    (models/score_model.py:54-82); the old style (separate linear added into
    the sum) is selectable for completeness.
    """

    emb_dim: int
    feature_dims: Sequence[int]  # cardinality per categorical column
    old_style: bool = False

    @nn.compact
    def __call__(self, cat_feats: Array, extra: Array) -> Array:
        emb = 0.0
        for i, dim in enumerate(self.feature_dims):
            table = nn.Embed(
                dim, self.emb_dim, embedding_init=nn.initializers.glorot_uniform()
            )
            emb = emb + table(cat_feats[..., i])
        if self.old_style:
            if extra.shape[-1] > 0:
                emb = emb + nn.Dense(self.emb_dim)(extra)
            return emb
        if extra.shape[-1] > 0:
            emb = nn.Dense(self.emb_dim)(jnp.concatenate([emb, extra], axis=-1))
        return emb
