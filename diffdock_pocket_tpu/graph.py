"""ComplexGraph: the static-shape padded complex representation.

Replaces the reference's PyG ``HeteroData`` complexes (datasets/pdbbind.py,
datasets/process_mols.py graph fields) with a single pytree of padded arrays
+ masks, bucketed so XLA compiles once per bucket:

node types  : ligand atoms [NL], receptor residues [NR], receptor atoms [NA]
edge data   : ligand bond list [EB] (directed, both ways), receptor residue
              K-NN lists [NR, KR] (precomputed — protein backbone is rigid),
              atom->residue map [NA]
torsions    : ligand rotatable bonds [T] (+ [T, NL] rotate masks),
              side-chain chi bonds [S] (+ [S, NA] rotate masks, residue ids)

All other edge families (ligand radius graph, atom kNN graph, lig<->rec /
lig<->atom cross edges, torsion-bond neighborhoods) are rebuilt **on device,
inside jit** every forward — that is the TPU-native replacement for the
reference's per-forward torch_cluster calls.

Batching: arrays carry NO leading batch axis here; ``stack``/``replicate``
add axis 0 and every model/sampler consumes batch-first arrays.
"""
from __future__ import annotations

from dataclasses import fields
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = Any


@struct.dataclass
class ComplexGraph:
    # --- ligand -----------------------------------------------------------
    lig_pos: Array  # [NL, 3] f32 — current ligand coordinates
    lig_orig_pos: Array  # [NL, 3] f32 — ground-truth (holo) coordinates
    lig_feat: Array  # [NL, 16] int32 categorical features
    lig_mask: Array  # [NL] bool
    lig_bond_index: Array  # [EB, 2] int32 (directed; both directions present)
    lig_bond_attr: Array  # [EB, 4] f32 one-hot bond type
    lig_bond_mask: Array  # [EB] bool
    # --- ligand torsions --------------------------------------------------
    tor_bond_index: Array  # [T, 2] int32 — rotatable bond (u, v); v side moves
    tor_rotate_mask: Array  # [T, NL] bool
    tor_bond_mask: Array  # [T] bool
    # --- receptor residues ------------------------------------------------
    rec_pos: Array  # [NR, 3] f32 — C-alpha coordinates
    rec_feat: Array  # [NR, 1] int32 amino-acid id
    rec_esm: Array  # [NR, esm_dim] f32 (esm_dim may be 0)
    rec_mask: Array  # [NR] bool
    rec_nbr_idx: Array  # [NR, KR] int32 — precomputed residue kNN lists
    rec_nbr_mask: Array  # [NR, KR] bool
    # --- receptor atoms (all-atom mode; NA may be 1 in CG mode) ----------
    atom_pos: Array  # [NA, 3] f32 — current receptor atom coordinates
    atom_orig_pos: Array  # [NA, 3] f32 — input (apo/holo) coordinates
    atom_feat: Array  # [NA, 4] int32
    atom_mask: Array  # [NA] bool
    atom_res_index: Array  # [NA] int32 atom -> residue
    # --- flexible side chains --------------------------------------------
    sc_bond_index: Array  # [S, 2] int32 atom-index bonds, CA-outward order
    sc_rotate_mask: Array  # [S, NA] bool
    sc_bond_mask: Array  # [S] bool
    sc_res_index: Array  # [S] int32 — flexible-residue id per bond
    # --- global -----------------------------------------------------------
    original_center: Array  # [3] f32 — pocket center in the original frame

    # ---------------------------------------------------------------------
    @property
    def n_lig(self) -> int:
        return self.lig_pos.shape[-2]

    @property
    def n_rec(self) -> int:
        return self.rec_pos.shape[-2]

    @property
    def n_atom(self) -> int:
        return self.atom_pos.shape[-2]

    @property
    def n_tor(self) -> int:
        return self.tor_bond_index.shape[-2]

    @property
    def n_sc(self) -> int:
        return self.sc_bond_index.shape[-2]


def stack(graphs: list[ComplexGraph]) -> ComplexGraph:
    """Stack same-bucket graphs along a new leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *graphs)


def replicate(graph: ComplexGraph, n: int) -> ComplexGraph:
    """Broadcast one complex to a batch of n copies (samples_per_complex)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy()
        if hasattr(x, "shape")
        else x,
        graph,
    )


def index(graph: ComplexGraph, i) -> ComplexGraph:
    """Take batch element(s) i from a batched ComplexGraph."""
    return jax.tree.map(lambda x: x[i], graph)


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------

def _round_up(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


# Default bucket ladders per dimension.  A pocket-reduced complex fits well
# inside the largest bucket; jit compiles once per (NL, NR, NA, T, S, EB)
# combination, so ladders are kept short.
DEFAULT_BUCKETS = {
    # NOTE: finer rungs (lig 48 / rec 160) were measured to cut model-fwd
    # time 12% via less padding, but EVERY compile of those shapes took
    # ~25 min on the bench chip (vs 2-8 min for these) — unacceptable per
    # bucket at dataset scale, so the coarser ladder stays
    "lig": (32, 64, 96, 128),
    "rec": (96, 192, 288, 384),
    "atom": (384, 768, 1152, 1536),
    "tor": (8, 16, 32, 64),
    "sc": (16, 32, 64, 128),
    "bond": (80, 160, 240, 320),
    "rec_k": (24,),
}


def bucket_sizes(
    n_lig: int,
    n_rec: int,
    n_atom: int,
    n_tor: int,
    n_sc: int,
    n_bond: int,
    buckets: dict | None = None,
) -> dict[str, int]:
    b = dict(DEFAULT_BUCKETS)
    if buckets:
        b.update(buckets)
    return {
        "lig": _round_up(max(n_lig, 1), b["lig"]),
        "rec": _round_up(max(n_rec, 2), b["rec"]),
        "atom": _round_up(max(n_atom, 1), b["atom"]),
        "tor": _round_up(max(n_tor, 1), b["tor"]),
        "sc": _round_up(max(n_sc, 1), b["sc"]),
        "bond": _round_up(max(n_bond, 1), b["bond"]),
    }


def pad_graph_arrays(raw: dict[str, np.ndarray], sizes: dict[str, int]) -> dict:
    """Pad a dict of per-complex numpy arrays to bucket sizes.

    ``raw`` uses the ComplexGraph field names with true (unpadded) shapes.
    Padded index arrays point at slot 0 and are masked out; padded positions
    are placed far away (1e4) so any distance-based op ignores them even
    before masking.
    """
    FAR = 1.0e4

    def pad_to(x: np.ndarray, n: int, fill=0.0):
        pad_width = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width, constant_values=fill)

    nl, nr, na = sizes["lig"], sizes["rec"], sizes["atom"]
    t, s, eb = sizes["tor"], sizes["sc"], sizes["bond"]

    out = {}
    out["lig_pos"] = pad_to(raw["lig_pos"].astype(np.float32), nl, FAR)
    out["lig_orig_pos"] = pad_to(raw["lig_orig_pos"].astype(np.float32), nl, FAR)
    out["lig_feat"] = pad_to(raw["lig_feat"].astype(np.int32), nl, 0)
    out["lig_mask"] = pad_to(np.ones(len(raw["lig_pos"]), dtype=bool), nl, False)
    out["lig_bond_index"] = pad_to(raw["lig_bond_index"].astype(np.int32), eb, 0)
    out["lig_bond_attr"] = pad_to(raw["lig_bond_attr"].astype(np.float32), eb, 0.0)
    out["lig_bond_mask"] = pad_to(np.ones(len(raw["lig_bond_index"]), dtype=bool), eb, False)

    tor_idx = raw["tor_bond_index"].reshape(-1, 2).astype(np.int32)
    out["tor_bond_index"] = pad_to(tor_idx, t, 0)
    rot = raw["tor_rotate_mask"].astype(bool)
    rot = np.pad(rot, [(0, t - rot.shape[0]), (0, nl - rot.shape[1])], constant_values=False)
    out["tor_rotate_mask"] = rot
    out["tor_bond_mask"] = pad_to(np.ones(len(tor_idx), dtype=bool), t, False)

    out["rec_pos"] = pad_to(raw["rec_pos"].astype(np.float32), nr, FAR)
    out["rec_feat"] = pad_to(raw["rec_feat"].astype(np.int32), nr, 0)
    esm = raw.get("rec_esm")
    if esm is None or esm.size == 0:
        esm = np.zeros((len(raw["rec_pos"]), 0), dtype=np.float32)
    out["rec_esm"] = pad_to(esm.astype(np.float32), nr, 0.0)
    out["rec_mask"] = pad_to(np.ones(len(raw["rec_pos"]), dtype=bool), nr, False)
    kr = raw["rec_nbr_idx"].shape[1]
    nbr = np.pad(
        raw["rec_nbr_idx"].astype(np.int32), [(0, nr - raw["rec_nbr_idx"].shape[0]), (0, 0)]
    )
    nbm = np.pad(
        raw["rec_nbr_mask"].astype(bool), [(0, nr - raw["rec_nbr_mask"].shape[0]), (0, 0)]
    )
    out["rec_nbr_idx"] = nbr
    out["rec_nbr_mask"] = nbm

    out["atom_pos"] = pad_to(raw["atom_pos"].astype(np.float32), na, FAR)
    out["atom_orig_pos"] = pad_to(raw["atom_orig_pos"].astype(np.float32), na, FAR)
    out["atom_feat"] = pad_to(raw["atom_feat"].astype(np.int32), na, 0)
    out["atom_mask"] = pad_to(np.ones(len(raw["atom_pos"]), dtype=bool), na, False)
    out["atom_res_index"] = pad_to(raw["atom_res_index"].astype(np.int32), na, 0)

    sc_idx = raw["sc_bond_index"].reshape(-1, 2).astype(np.int32)
    out["sc_bond_index"] = pad_to(sc_idx, s, 0)
    scr = raw["sc_rotate_mask"].astype(bool)
    scr = np.pad(scr, [(0, s - scr.shape[0]), (0, na - scr.shape[1])], constant_values=False)
    out["sc_rotate_mask"] = scr
    out["sc_bond_mask"] = pad_to(np.ones(len(sc_idx), dtype=bool), s, False)
    out["sc_res_index"] = pad_to(raw["sc_res_index"].astype(np.int32), s, 0)

    out["original_center"] = raw["original_center"].astype(np.float32).reshape(3)
    return out


def from_raw(raw: dict[str, np.ndarray], buckets: dict | None = None) -> ComplexGraph:
    """Build a padded ComplexGraph (device arrays) from host numpy arrays."""
    sizes = bucket_sizes(
        len(raw["lig_pos"]),
        len(raw["rec_pos"]),
        len(raw["atom_pos"]),
        len(raw["tor_bond_index"]),
        len(raw["sc_bond_index"]),
        len(raw["lig_bond_index"]),
        buckets,
    )
    padded = pad_graph_arrays(raw, sizes)
    return ComplexGraph(**{k: jnp.asarray(v) for k, v in padded.items()})
