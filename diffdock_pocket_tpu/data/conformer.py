"""Ligand conformer generation + torsional conformer matching.

Parity targets (reference):
- generate_conformer (RDKit ETKDG)         datasets/process_mols.py:456-464
- optimize_rotatable_bonds (torsional
  differential evolution vs the crystal)   datasets/conformer_matching.py:16-82

This environment has no RDKit, so conformer generation is implemented as a
documented two-tier strategy:
1. if RDKit happens to be importable, use ETKDG (exact reference behaviour);
2. otherwise ``randomize_torsions`` produces an independent conformer by
   uniformly re-drawing every rotatable-bond torsion of the input conformer —
   local structure (bond lengths/angles) is preserved, global torsional state
   is decorrelated.  The subsequent differential-evolution matching then
   recovers torsions against the crystal exactly like the reference.

The matching objective is RMSD after optimal rigid alignment (Kabsch), which
is what AllChem.AlignMol minimizes.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
from scipy.optimize import differential_evolution

from .mol import Molecule

logger = logging.getLogger(__name__)


def _apply_torsions_np(pos, bond_index, rotate_mask, updates):
    """Sequential bond rotations (numpy mirror of diffusion.apply_torsion_updates)."""
    from scipy.spatial.transform import Rotation as R

    pos = pos.copy()
    for i, (u, v) in enumerate(bond_index):
        if updates[i] == 0:
            continue
        axis = pos[u] - pos[v]
        n = np.linalg.norm(axis)
        if n < 1e-9:
            continue
        rot = R.from_rotvec(axis * updates[i] / n).as_matrix()
        sel = rotate_mask[i]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def aligned_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """RMSD after optimal rigid alignment of a onto b."""
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    h = ac.T @ bc
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return float(np.sqrt(np.mean(np.sum((ac @ r.T - bc) ** 2, axis=1))))


def randomize_torsions(mol: Molecule, rng: np.random.Generator) -> Molecule:
    bond_index, rotate_mask = mol.rotatable_bonds()
    if len(bond_index) == 0:
        return mol
    updates = rng.uniform(-np.pi, np.pi, len(bond_index))
    return mol.with_coords(
        _apply_torsions_np(mol.coords, bond_index, rotate_mask, updates)
    )


def generate_conformer(mol: Molecule, rng: Optional[np.random.Generator] = None) -> Molecule:
    """An independent conformer of ``mol`` (see module docstring strategy)."""
    try:  # tier 1: real ETKDG when RDKit exists
        from rdkit import Chem
        from rdkit.Chem import AllChem

        rd = Chem.RWMol()
        for s in mol.symbols:
            rd.AddAtom(Chem.Atom(s))
        order = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE,
                 3: Chem.BondType.TRIPLE, 4: Chem.BondType.AROMATIC}
        for b in mol.bonds:
            rd.AddBond(b.a, b.b, order.get(b.type, Chem.BondType.SINGLE))
        m = rd.GetMol()
        Chem.SanitizeMol(m)
        AllChem.EmbedMolecule(m, AllChem.ETKDGv2())
        conf = m.GetConformer()
        coords = np.asarray(
            [[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y, conf.GetAtomPosition(i).z]
             for i in range(m.GetNumAtoms())],
            np.float32,
        )
        return mol.with_coords(coords)
    except Exception:
        rng = rng or np.random.default_rng(0)
        return randomize_torsions(mol, rng)


def optimize_rotatable_bonds(
    conformer: Molecule,
    target: Molecule,
    popsize: int = 15,
    maxiter: int = 15,
    seed: int = 0,
) -> tuple[Molecule, float]:
    """Differential evolution over the conformer's rotatable-bond torsions to
    minimize aligned RMSD against ``target``.  Returns (matched conformer,
    final aligned RMSD)."""
    bond_index, rotate_mask = conformer.rotatable_bonds()
    if len(bond_index) == 0:
        return conformer, aligned_rmsd(conformer.coords, target.coords)

    base = conformer.coords

    def objective(x):
        pos = _apply_torsions_np(base, bond_index, rotate_mask, x)
        return aligned_rmsd(pos, target.coords)

    bounds = [(-np.pi, np.pi)] * len(bond_index)
    res = differential_evolution(
        objective, bounds, popsize=popsize, maxiter=maxiter, seed=seed, tol=0.01,
    )
    matched = conformer.with_coords(
        _apply_torsions_np(base, bond_index, rotate_mask, res.x)
    )
    return matched, float(res.fun)


def conformer_match_ligand(
    lig: Molecule,
    popsize: int = 15,
    maxiter: int = 15,
    rng: Optional[np.random.Generator] = None,
) -> tuple[Molecule, float]:
    """Training-input ligand: independent conformer with torsions matched to
    the crystal (reference get_lig_graph_with_matching semantics,
    process_mols.py:467-512).  The matched conformer is finally rigid-aligned
    onto the crystal frame."""
    rng = rng or np.random.default_rng(0)
    gen = generate_conformer(lig, rng)
    matched, score = optimize_rotatable_bonds(gen, lig, popsize, maxiter)
    # place in the crystal frame (AlignMol side effect in the reference)
    a = matched.coords - matched.coords.mean(0)
    b = lig.coords - lig.coords.mean(0)
    h = a.T @ b
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    placed = a @ r.T + lig.coords.mean(0)
    return matched.with_coords(placed.astype(np.float32)), score
