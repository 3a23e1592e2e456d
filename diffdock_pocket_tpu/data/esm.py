"""ESM2 language-model embeddings for receptor residues.

Parity targets (reference utils/esm.py:46-188): per-chain sequences from the
PDB structure, ESM2-650M layer-33 per-residue embeddings, regrouped per
complex/chain; plus the legacy precomputed-.pt loading path
(--esm_embeddings_path).

Availability tiers (this image has no fair-esm and no network egress):
1. precomputed embeddings file (.pt / .npz keyed by complex name) — always
   supported;
2. a locally cached HuggingFace ``facebook/esm2_t33_650M_UR50D`` via
   transformers, if present on disk;
3. none — the model runs without LM embeddings (esm_embeddings_dim=0), which
   is a supported reference configuration (lm_embedding_type=None).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from .chem import THREE_TO_ONE
from .pdb import PDBModel, parse_pdb

logger = logging.getLogger(__name__)

ESM_DIM = 1280
_MODEL_NAME = "facebook/esm2_t33_650M_UR50D"


def get_chain_sequences(model: PDBModel) -> list[str]:
    """One sequence per chain over backbone-complete residues (matching the
    residue units the featurizer emits — the alignment contract with
    extract_receptor)."""
    seqs = []
    for chain in model.chains:
        s = []
        for res in chain.residues:
            if res.is_water():
                continue
            if res.get_atom("CA") is None or res.get_atom("N") is None or res.get_atom("C") is None:
                continue
            s.append(THREE_TO_ONE.get(res.name, "X"))
        seqs.append("".join(s))
    return seqs


def get_sequence_simple(path: str) -> str:
    """Fast line-based sequence extraction from a PDB file (reference
    get_sequence_simple, utils/esm.py:118-140)."""
    out = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("ATOM") and line[12:16].strip() == "CA":
                out.append(THREE_TO_ONE.get(line[17:20].strip(), "X"))
    return "".join(out)


def load_precomputed(path: str) -> dict[str, list[np.ndarray]]:
    """Load {complex_name: [per-chain [L, 1280] arrays]} from .pt or .npz."""
    if path.endswith(".npz"):
        raw = np.load(path, allow_pickle=True)
        out = {}
        for k in raw.files:
            name, chain = k.rsplit("_chain_", 1)
            out.setdefault(name, []).append((int(chain), raw[k]))
        return {
            n: [a for _, a in sorted(v)] for n, v in out.items()
        }
    # torch .pt (reference format: {f"{name}_chain_{i}": tensor})
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in raw.items():
        name, chain = k.rsplit("_chain_", 1)
        out.setdefault(name, []).append((int(chain), np.asarray(v, np.float32)))
    return {n: [a for _, a in sorted(v)] for n, v in out.items()}


class ESMEmbedder:
    """transformers-backed ESM2 embedder (tier 2)."""

    def __init__(self, model_name: str = _MODEL_NAME, device: str = "cpu"):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name)
        self.model.eval()

    def embed_chains(self, sequences: list[str], batch_tokens: int = 4096):
        import torch

        out = []
        with torch.no_grad():
            for seq in sequences:
                if not seq:
                    out.append(np.zeros((0, ESM_DIM), np.float32))
                    continue
                toks = self.tokenizer(seq, return_tensors="pt")
                h = self.model(**toks).last_hidden_state[0]
                # strip BOS/EOS
                out.append(np.asarray(h[1 : 1 + len(seq)], np.float32))
        return out


def esm_available() -> bool:
    try:
        from transformers import AutoTokenizer

        AutoTokenizer.from_pretrained(_MODEL_NAME, local_files_only=True)
        return True
    except Exception:
        return False


def embeddings_for_complexes(
    names: list[str],
    protein_paths: list[str],
    precomputed_path: Optional[str] = None,
) -> Optional[dict[str, list[np.ndarray]]]:
    """Resolve embeddings through the tier list; None = run without ESM."""
    if precomputed_path:
        table = load_precomputed(precomputed_path)
        return {n: table[n] for n in names if n in table}
    if esm_available():
        emb = ESMEmbedder()
        out = {}
        for name, path in zip(names, protein_paths):
            seqs = get_chain_sequences(parse_pdb(path))
            out[name] = emb.embed_chains(seqs)
        return out
    logger.warning(
        "No ESM weights or precomputed embeddings available; proceeding "
        "without LM embeddings (esm_embeddings_dim=0)."
    )
    return None
