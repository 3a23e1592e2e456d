"""Pose/trajectory writers.

Parity with reference utils/visualise.py: ``LigandTrajectoryWriter`` writes a
multi-MODEL PDB of the ligand's reverse-diffusion trajectory (PDBFile:17-59);
``write_receptor_with_sidechains`` re-inserts predicted flexible side-chain
coordinates into the receptor structure and writes (multi-MODEL) PDB
(SidechainPDBFile:62-133).  Built on our own PDB/SDF IO (no RDKit/Biopython).
"""
from __future__ import annotations

import copy

import numpy as np

from .data.chem import Z_TO_SYMBOL, atomic_number
from .data.mol import Molecule
from .data.pdb import PDBAtom, PDBChain, PDBModel, PDBResidue, write_pdb
from .data.receptor import ReceptorArrays
from .data.sdf import write_sdf


def ligand_to_pdb_model(mol: Molecule, coords: np.ndarray) -> PDBModel:
    res = PDBResidue("UNL", 1, "", "L", hetero_flag="H_UNL")
    for i, s in enumerate(mol.symbols):
        res.atoms.append(
            PDBAtom(
                name=f"{s}{i + 1}"[:4], element=s,
                coord=np.asarray(coords[i], np.float32), serial=i + 1, hetero=True,
            )
        )
    chain = PDBChain("L", [res])
    return PDBModel([chain])


class LigandTrajectoryWriter:
    """Accumulates ligand coordinate frames; writes a multi-MODEL PDB."""

    def __init__(self, mol: Molecule):
        self.mol = mol
        self.frames: list[np.ndarray] = []

    def add(self, coords: np.ndarray):
        self.frames.append(np.asarray(coords, np.float32))

    def write(self, path: str):
        models = [ligand_to_pdb_model(self.mol, c) for c in self.frames]
        write_pdb(path, models)


def receptor_with_atom_coords(
    rec: ReceptorArrays, atom_pos: np.ndarray, center: np.ndarray
) -> PDBModel:
    """A copy of the extracted receptor with (pocket-frame) atom coordinates
    written back (the flexible side chains moved during sampling; everything
    else is identical).  ``atom_pos`` is [NA, 3] over the same flat heavy-atom
    order as ReceptorArrays.atom_pos; ``center`` restores the original frame.
    """
    model = PDBModel()
    chains: dict[str, PDBChain] = {}
    idx = 0
    for ri, res in enumerate(rec.residues):
        new_res = PDBResidue(res.name, res.seq, res.icode, res.chain_id)
        for atom in res.atoms:
            if atom.element == "H":
                continue
            a = copy.copy(atom)
            a.coord = np.asarray(atom_pos[idx] + center, np.float32)
            new_res.atoms.append(a)
            idx += 1
        cid = res.chain_id or "A"
        if cid not in chains:
            chains[cid] = PDBChain(cid)
            model.chains.append(chains[cid])
        chains[cid].residues.append(new_res)
    assert idx == len(atom_pos), "atom count mismatch vs receptor arrays"
    return model


def write_receptor_with_sidechains(
    path: str,
    rec: ReceptorArrays,
    atom_pos_frames: "np.ndarray | list[np.ndarray]",
    center: np.ndarray,
):
    """Write the receptor with updated side-chain coords; multi-MODEL if
    several frames are given (trajectory)."""
    if isinstance(atom_pos_frames, np.ndarray) and atom_pos_frames.ndim == 2:
        write_pdb(path, receptor_with_atom_coords(rec, atom_pos_frames, center))
    else:
        models = [
            receptor_with_atom_coords(rec, f, center) for f in atom_pos_frames
        ]
        write_pdb(path, models)


def write_ligand_sdf(path: str, mol: Molecule, coords: np.ndarray, center: np.ndarray, name=None):
    write_sdf(path, mol, np.asarray(coords) + center, name=name)
