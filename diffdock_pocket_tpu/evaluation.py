"""Evaluation metrics: symmetry-corrected ligand RMSD, side-chain RMSD,
centroid distances, steric clashes, and top-k aggregates.

Parity targets (reference):
- get_symmetry_rmsd (spyrmsd)              utils/utils.py:116-130
- steric clash suite                       datasets/steric_clash.py:9-173
- evaluate_files metric definitions        evaluate_files.py:256-431

Symmetry-corrected RMSD here enumerates element/bond-preserving graph
automorphisms of the ligand (networkx VF2, capped) and minimizes RMSD over
them — the same quantity spyrmsd computes via graph isomorphisms.
"""
from __future__ import annotations

import itertools
import time

import networkx as nx
import numpy as np

from .data import chem
from .data.mol import Molecule


# ---------------------------------------------------------------------------
# RMSD
# ---------------------------------------------------------------------------

def rmsd(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))


def ligand_automorphisms(mol: Molecule, max_autos: int = 256, time_limit: float = 10.0):
    """Element- and bond-type-preserving automorphisms of the ligand graph
    (identity first).  Capped in count and wall time (the reference wraps
    spyrmsd in a 10 s SIGALRM, utils/utils.py:150-163)."""
    g = nx.Graph()
    for i, s in enumerate(mol.symbols):
        g.add_node(i, el=s)
    for b in mol.bonds:
        g.add_edge(b.a, b.b, t=b.type)
    gm = nx.algorithms.isomorphism.GraphMatcher(
        g, g,
        node_match=lambda x, y: x["el"] == y["el"],
        edge_match=lambda x, y: x["t"] == y["t"],
    )
    autos = []
    start = time.time()
    n = mol.n_atoms
    for mapping in gm.isomorphisms_iter():
        perm = np.asarray([mapping[i] for i in range(n)])
        autos.append(perm)
        if len(autos) >= max_autos or time.time() - start > time_limit:
            break
    if not autos:
        autos = [np.arange(n)]
    return autos


def symmetry_rmsd(
    mol: Molecule, pred: np.ndarray, true: np.ndarray, max_autos: int = 256
) -> float:
    """Minimum RMSD over ligand graph automorphisms (no realignment —
    docking RMSD is computed in the fixed receptor frame)."""
    best = np.inf
    for perm in ligand_automorphisms(mol, max_autos=max_autos):
        best = min(best, rmsd(pred[perm], true))
    return float(best)


def centroid_distance(pred: np.ndarray, true: np.ndarray) -> float:
    return float(np.linalg.norm(pred.mean(0) - true.mean(0)))


def sidechain_rmsds(
    pred_atom_pos: np.ndarray,
    true_atom_pos: np.ndarray,
    sc_rotate_mask: np.ndarray,  # [S, NA]
    sc_res_index: np.ndarray,  # [S]
):
    """Per-flexible-residue side-chain RMSD (over each residue's union of
    rotated atoms) + overall flexible-atom RMSD."""
    if sc_rotate_mask.size == 0:
        return np.zeros(0), 0.0
    n_res = int(sc_res_index.max()) + 1 if len(sc_res_index) else 0
    per_res = []
    for r in range(n_res):
        m = sc_rotate_mask[sc_res_index == r].any(axis=0)
        if m.any():
            per_res.append(rmsd(pred_atom_pos[m], true_atom_pos[m]))
    allm = sc_rotate_mask.any(axis=0)
    overall = rmsd(pred_atom_pos[allm], true_atom_pos[allm]) if allm.any() else 0.0
    return np.asarray(per_res), overall


# ---------------------------------------------------------------------------
# steric clashes
# ---------------------------------------------------------------------------

CLASH_TOLERANCE = 0.4  # Angstrom per atom (reference steric_clash.py:74)


def steric_clash_pairs(
    pos_a: np.ndarray, elements_a: list[str],
    pos_b: np.ndarray, elements_b: list[str],
    tolerance: float = CLASH_TOLERANCE,
) -> np.ndarray:
    """Boolean [Na, Nb]: vdW overlap test d < r_a + r_b - 2*tolerance."""
    ra = np.asarray([chem.vdw_radius(e) for e in elements_a])
    rb = np.asarray([chem.vdw_radius(e) for e in elements_b])
    d = np.linalg.norm(pos_a[:, None] - pos_b[None, :], axis=-1)
    return d < (ra[:, None] + rb[None, :] - 2 * tolerance)


def rec_lig_clashes(
    atom_pos: np.ndarray, atom_elements: list[str],
    lig_pos: np.ndarray, lig_elements: list[str],
) -> int:
    from .data import native

    ra = np.asarray([chem.vdw_radius(e) - CLASH_TOLERANCE for e in atom_elements],
                    np.float32)
    rb = np.asarray([chem.vdw_radius(e) - CLASH_TOLERANCE for e in lig_elements],
                    np.float32)
    return native.clash_count(atom_pos, ra, lig_pos, rb)


def sidechain_clashes(
    atom_pos: np.ndarray,
    atom_elements: list[str],
    sc_rotate_mask: np.ndarray,  # [S, NA]
    sc_res_index: np.ndarray,
    versus_rest: bool = True,
) -> int:
    """Clashes of flexible side-chain atoms vs rest-of-receptor
    (versus_rest=True) or vs *other* flexible side chains (False) — the two
    families of reference get_steric_clash_per_flexble_sidechain_atom
    (steric_clash.py:97-135).  Directly-bonded/intra-residue pairs excluded
    by residue identity."""
    if sc_rotate_mask.size == 0:
        return 0
    n_res = int(sc_res_index.max()) + 1 if len(sc_res_index) else 0
    total = 0
    res_masks = [
        sc_rotate_mask[sc_res_index == r].any(axis=0) for r in range(n_res)
    ]
    any_flex = sc_rotate_mask.any(axis=0)
    for r, m in enumerate(res_masks):
        if not m.any():
            continue
        if versus_rest:
            other = ~any_flex
        else:
            other = any_flex & ~m
        if not other.any():
            continue
        # exclude the residue's own atoms entirely
        pa = atom_pos[m]
        ea = [atom_elements[i] for i in np.where(m)[0]]
        pb = atom_pos[other]
        eb = [atom_elements[i] for i in np.where(other)[0]]
        clashes = steric_clash_pairs(pa, ea, pb, eb)
        # ignore near-neighbor backbone contacts: reference excludes pairs
        # closer than a covalent bond by the tolerance itself; keep as-is
        total += int(clashes.sum())
    return total


def elements_from_atom_feat(atom_feat: np.ndarray) -> list[str]:
    """Recover element symbols from the receptor atom feature column 1
    (index into possible_atomic_num_list = Z - 1; reference
    steric_clash.py:138-158)."""
    out = []
    for idx in atom_feat[:, 1]:
        z = int(idx) + 1
        out.append(chem.Z_TO_SYMBOL.get(z, "C"))
    return out


# ---------------------------------------------------------------------------
# aggregates (reference evaluate_files.py:256-431)
# ---------------------------------------------------------------------------

def topk_rate(values_per_complex: list[np.ndarray], k: int, threshold: float) -> float:
    """Fraction of complexes whose best of the top-k ranked values is below
    threshold (values are rank-ordered per complex)."""
    hits = [float(np.min(v[:k]) < threshold) for v in values_per_complex if len(v)]
    return float(np.mean(hits)) if hits else 0.0


def summarize_rmsds(rmsds_per_complex: list[np.ndarray]) -> dict:
    top1 = np.asarray([v[0] for v in rmsds_per_complex if len(v)])
    return {
        "top1_rmsds_below_2": float(np.mean(top1 < 2.0)) if len(top1) else 0.0,
        "top1_rmsds_below_5": float(np.mean(top1 < 5.0)) if len(top1) else 0.0,
        "top5_rmsds_below_2": topk_rate(rmsds_per_complex, 5, 2.0),
        "top10_rmsds_below_2": topk_rate(rmsds_per_complex, 10, 2.0),
        "mean_top1_rmsd": float(np.mean(top1)) if len(top1) else 0.0,
        "median_top1_rmsd": float(np.median(top1)) if len(top1) else 0.0,
    }
