"""ESM2 language-model embeddings for receptor residues.

Parity targets (reference utils/esm.py:46-188): per-chain sequences from the
PDB structure, ESM2-650M layer-33 per-residue embeddings, regrouped per
complex/chain; plus the legacy precomputed-.pt loading path
(--esm_embeddings_path).

Availability tiers (this image has no fair-esm and no network egress):
1. precomputed embeddings file (.pt / .npz keyed by complex name) — always
   supported;
2. a locally cached HuggingFace ``facebook/esm2_t33_650M_UR50D`` checkpoint:
   run through the TPU-native flax port (esm_flax.py) when JAX has an
   accelerator, else through torch-CPU;
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


class FlaxESMEmbedder:
    """TPU-native ESM2 embedder: torch checkpoint converted once to the flax
    port (esm_flax.py), then jitted per length bucket on the default JAX
    device.  Numerically pinned to the torch tier by tests/test_esm_flax.py."""

    def __init__(self, model_name: str = _MODEL_NAME):
        import jax

        from transformers import AutoModel

        from . import esm_flax

        torch_model = AutoModel.from_pretrained(model_name)
        self.cfg, self.params = esm_flax.convert_torch_esm(torch_model)
        del torch_model
        self._esm_flax = esm_flax
        self._apply = jax.jit(esm_flax.ESM2(self.cfg).apply)

    def embed_chains(self, sequences: list[str], batch_tokens: int = 4096):
        import numpy as np

        ef = self._esm_flax
        out = [None] * len(sequences)
        todo = [(i, s) for i, s in enumerate(sequences) if s]
        for i, s in enumerate(sequences):
            if not s:
                out[i] = np.zeros((0, self.cfg.hidden_size), np.float32)
        for i, s in todo:
            # bucket lengths to multiples of 64 to bound recompiles
            L = (len(s) + 63) // 64 * 64
            toks, mask = ef.tokenize([s], max_len=L)
            h = self._apply({"params": self.params}, toks, mask)
            out[i] = np.asarray(h[0, 1 : 1 + len(s)], np.float32)
        return out


class ESMEmbedder:
    """transformers-backed torch ESM2 embedder (tier 2, CPU)."""

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


def _make_embedder():
    """Flax (on-device) embedder when an accelerator backs JAX, else the
    torch-CPU tier (faster than jax-CPU for a one-off preprocessing pass)."""
    try:
        import jax

        if jax.devices()[0].platform != "cpu":
            return FlaxESMEmbedder()
    except Exception:
        pass
    return ESMEmbedder()


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
        emb = _make_embedder()
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
