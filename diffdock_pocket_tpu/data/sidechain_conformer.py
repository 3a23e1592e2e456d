"""Side-chain conformer matching: fit the computational (apo/ESMFold)
receptor's pocket side chains onto the experimental (holo) structure.

Parity targets (reference datasets/sidechain_conformer_matching.py:10-192):
per flexible residue, differential evolution over its chi angles minimizing
one of three objectives —
- 'dist':    plain side-chain RMSD to the experimental structure,
- 'nearest': RMSD minus the nearest-clash distance to the rest,
- 'exp':     exponentially clash-penalized RMSD —
applying a residue's optimal rotations only when they improve it, and
asserting the overall RMSD never increases.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
from scipy.optimize import differential_evolution
from scipy.spatial.transform import Rotation as R

from .pdb import PDBModel
from . import receptor as recmod

logger = logging.getLogger(__name__)


def _apply_bond_rotation(pos, u, v, sel, angle):
    axis = pos[u] - pos[v]
    n = np.linalg.norm(axis)
    if n < 1e-9 or angle == 0:
        return pos
    rot = R.from_rotvec(axis * angle / n).as_matrix()
    pos = pos.copy()
    pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def pocket_rmsd(idxs: np.ndarray, comp: np.ndarray, exp: np.ndarray) -> float:
    """RMSD over selected (pocket) atoms between the two structures
    (reference RMSD, sidechain_conformer_matching.py:91-105)."""
    if idxs.sum() == 0:
        return 0.0
    return float(np.sqrt(np.mean(np.sum((comp[idxs] - exp[idxs]) ** 2, axis=1))))


def _residue_score(score: str, sc_pos, exp_sc_pos, other_pos):
    rmsd = float(np.sqrt(np.mean(np.sum((sc_pos - exp_sc_pos) ** 2, axis=1))))
    if score == "dist" or other_pos is None or len(other_pos) == 0:
        return rmsd
    d = np.linalg.norm(sc_pos[:, None] - other_pos[None, :], axis=-1)
    nearest = float(d.min())
    if score == "nearest":
        return rmsd - nearest
    if score == "exp":
        return rmsd + float(np.exp(-d.min(axis=1)).sum())
    raise ValueError(score)


def conformer_match_sidechains(
    computational: PDBModel,
    experimental: PDBModel,
    selector,
    lig_pos: np.ndarray,
    cfg,
    rng: Optional[np.random.Generator] = None,
) -> tuple[PDBModel, float]:
    """Match the computational receptor's pocket side chains to the
    experimental structure; returns (matched model, pocket RMSD before
    matching).  Raises if the pre-match pocket RMSD exceeds
    cfg.match_max_rmsd (unless cfg.use_original_conformer, in which case the
    experimental structure is returned — reference pdbbind.py:622-631)."""
    comp_atoms = np.asarray([a.coord for a in computational.get_atoms()], np.float64)
    exp_atoms = np.asarray([a.coord for a in experimental.get_atoms()], np.float64)
    assert comp_atoms.shape == exp_atoms.shape, "structures must be atom-aligned"

    # pocket selection mask over atoms
    idxs = []
    for res in computational.get_residues():
        keep = selector(res) if selector is not None else True
        idxs.extend([keep] * len(res.atoms))
    idxs = np.asarray(idxs, bool)
    rmsd_before = pocket_rmsd(idxs, comp_atoms, exp_atoms)

    if cfg.match_max_rmsd is not None and rmsd_before > cfg.match_max_rmsd:
        if cfg.use_original_conformer:
            return experimental, rmsd_before
        raise ValueError(
            f"pocket RMSD {rmsd_before:.2f} > match_max_rmsd {cfg.match_max_rmsd}"
        )

    # flexible residues near the pocket, with chi-rotation machinery over the
    # flat atom index space of the model
    residues = list(computational.get_residues())
    offsets = []
    off = 0
    for res in residues:
        offsets.append(off)
        off += len(res.atoms)

    pos = comp_atoms.copy()
    ca_pos = np.asarray(
        [a.coord for a in computational.get_atoms() if a.name == "CA"], np.float32
    )
    accept = recmod.make_flexdist_func(
        ca_pos, lig_pos, cfg.flexdist, cfg.flexdist_distance_metric, cfg.pocket_cutoff
    )

    improved_total = 0.0
    for ri, res in enumerate(residues):
        if res.name in ("ALA", "GLY", "PRO"):
            continue
        sc_atoms = [
            a for a in res.atoms
            if a.element != "H" and a.name not in ("CA", "N", "C", "O", "OXT")
        ]
        if not sc_atoms or not any(accept(a.coord) for a in sc_atoms):
            continue
        bonds = recmod.sidechain_rotation_mask(res, offsets[ri])
        if not bonds:
            continue

        res_atom_idx = np.arange(offsets[ri], offsets[ri] + len(res.atoms))
        other_mask = np.ones(len(pos), bool)
        other_mask[res_atom_idx] = False
        other_pos = pos[other_mask]

        def apply_chis(base, x):
            p = base
            for k, (sel_atoms, (u, v)) in enumerate(bonds):
                sel = np.asarray(sel_atoms)
                p = _apply_bond_rotation(p, u, v, sel, x[k])
            return p

        moved = sorted({i for sel, _ in bonds for i in sel})
        moved = np.asarray(moved)

        def objective(x):
            p = apply_chis(pos, x)
            return _residue_score(
                cfg.conformer_match_score, p[moved], exp_atoms[moved], other_pos
            )

        before = objective(np.zeros(len(bonds)))
        result = differential_evolution(
            objective,
            [(-np.pi, np.pi)] * len(bonds),
            popsize=8, maxiter=20, seed=0, tol=0.01,
        )
        if result.fun < before:  # apply only if improving (reference :64-77)
            pos = apply_chis(pos, result.x)
            improved_total += before - result.fun

    rmsd_after = pocket_rmsd(idxs, pos, exp_atoms)
    if rmsd_after > rmsd_before + 1e-6:
        logger.warning(
            "side-chain matching did not improve pocket RMSD (%.3f -> %.3f)",
            rmsd_before, rmsd_after,
        )

    # write matched coordinates back into a copy of the model
    import copy as _copy

    matched = _copy.deepcopy(computational)
    for atom, coord in zip(matched.get_atoms(), pos):
        atom.coord = coord.astype(np.float32)
    return matched, rmsd_before
