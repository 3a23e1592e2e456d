"""Small-molecule IO: SDF (V2000), MOL2, and ligand PDB reading; SDF writing.

Replaces the RDKit IO surface the reference uses (datasets/process_mols.py
read_molecule:735-770, write_mol_with_coords:726-733) for the formats in the
DiffDock-Pocket workflow.  Produces a lightweight ``Molecule`` (data/mol.py).
"""
from __future__ import annotations

import gzip

import numpy as np

from .mol import Bond, Molecule


def parse_sdf(path_or_text: str, first_only: bool = True):
    """Parse an SDF/MOL (V2000) file.  Returns Molecule or list[Molecule]."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        opener = gzip.open if path_or_text.endswith(".gz") else open
        with opener(path_or_text, "rt") as fh:
            text = fh.read()

    mols = []
    for block in text.split("$$$$"):
        lines = block.splitlines()
        # strip leading blank lines left by the split
        while lines and not lines[0].strip() and len(lines) > 4:
            lines.pop(0)
        if len(lines) < 4:
            continue
        counts = lines[3]
        try:
            n_atoms = int(counts[0:3])
            n_bonds = int(counts[3:6])
        except (ValueError, IndexError):
            continue
        coords = np.zeros((n_atoms, 3), dtype=np.float32)
        symbols = []
        charges = [0] * n_atoms
        ok = True
        for i in range(n_atoms):
            ln = lines[4 + i]
            try:
                coords[i] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
                symbols.append(ln[31:34].strip())
            except (ValueError, IndexError):
                ok = False
                break
            # old-style charge column (value 4 = +1? chg code: 0 none,
            # 1:+3 2:+2 3:+1 4:radical 5:-1 6:-2 7:-3)
            try:
                cc = int(ln[36:39])
                charges[i] = {1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}.get(cc, 0)
            except (ValueError, IndexError):
                pass
        if not ok:
            continue
        bonds = []
        for i in range(n_bonds):
            ln = lines[4 + n_atoms + i]
            try:
                a = int(ln[0:3]) - 1
                b = int(ln[3:6]) - 1
                t = int(ln[6:9])
            except (ValueError, IndexError):
                ok = False
                break
            bonds.append(Bond(a, b, t))
        if not ok:
            continue
        # property block: M  CHG overrides atom-line charges
        j = 4 + n_atoms + n_bonds
        name = lines[0].strip()
        while j < len(lines):
            ln = lines[j]
            if ln.startswith("M  CHG"):
                fields = ln.split()
                n = int(fields[2])
                for k in range(n):
                    idx = int(fields[3 + 2 * k]) - 1
                    charges[idx] = int(fields[4 + 2 * k])
            elif ln.startswith("M  END"):
                pass
            j += 1
        mols.append(Molecule(symbols, coords, bonds, charges, name=name))
        if first_only:
            return mols[0]
    if first_only:
        return mols[0] if mols else None
    return mols


def parse_mol2(path_or_text: str):
    """Parse a TRIPOS MOL2 file (first molecule)."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as fh:
            text = fh.read()
    lines = text.splitlines()
    section = None
    symbols, coords, bonds, charges = [], [], [], []
    name = ""
    for ln in lines:
        if ln.startswith("@<TRIPOS>"):
            section = ln[9:].strip()
            continue
        if section == "MOLECULE" and not name and ln.strip():
            name = ln.strip()
            section = "MOLECULE_DONE"
        elif section == "ATOM" and ln.strip():
            f = ln.split()
            coords.append([float(f[2]), float(f[3]), float(f[4])])
            sybyl = f[5]
            symbols.append(sybyl.split(".")[0])
            charges.append(int(round(float(f[8]))) if len(f) > 8 else 0)
        elif section == "BOND" and ln.strip():
            f = ln.split()
            t = f[3]
            btype = {"1": 1, "2": 2, "3": 3, "ar": 4, "am": 1}.get(t, 1)
            bonds.append(Bond(int(f[1]) - 1, int(f[2]) - 1, btype))
    if not symbols:
        return None
    return Molecule(
        symbols, np.asarray(coords, dtype=np.float32), bonds, charges, name=name
    )


def parse_ligand_pdb(path_or_text: str):
    """Ligand from a PDB/PDBQT file: atoms + distance-perceived bonds."""
    from .pdb import parse_pdb

    model = parse_pdb(path_or_text)
    symbols, coords = [], []
    for atom in model.get_atoms():
        symbols.append(atom.element)
        coords.append(atom.coord)
    if not symbols:
        return None
    mol = Molecule(symbols, np.asarray(coords, dtype=np.float32), [], None)
    mol.perceive_bonds()
    return mol


def parse_pdbqt(path: str):
    """Ligand from an AutoDock pdbqt file: every line truncated to the PDB
    columns (strips the partial-charge + AD-type columns, which would
    otherwise corrupt element inference) before PDB parsing — exactly the
    reference's handling (process_mols.py:741-747)."""
    with open(path) as fh:
        block = "".join(line[:66] + "\n" for line in fh)
    return parse_ligand_pdb(block)


def read_molecule(path: str, remove_hs: bool = False):
    """Format-dispatching reader (reference read_molecule semantics)."""
    low = path.lower()
    if low.endswith(".sdf") or low.endswith(".mol") or low.endswith(".sdf.gz"):
        mol = parse_sdf(path)
    elif low.endswith(".mol2"):
        mol = parse_mol2(path)
    elif low.endswith(".pdbqt"):
        mol = parse_pdbqt(path)
    elif low.endswith(".pdb"):
        mol = parse_ligand_pdb(path)
    else:
        raise ValueError(f"unsupported molecule format: {path}")
    if mol is not None and remove_hs:
        mol = mol.remove_hydrogens()
    return mol


def format_sdf(mol: Molecule, coords: np.ndarray | None = None, name: str | None = None) -> str:
    """Write a V2000 mol block (optionally with replacement coordinates)."""
    coords = mol.coords if coords is None else np.asarray(coords)
    n, nb = len(mol.symbols), len(mol.bonds)
    out = [name if name is not None else (mol.name or ""), "  ddptpu", ""]
    out.append(f"{n:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000")
    for i in range(n):
        x, y, z = coords[i]
        out.append(
            f"{x:10.4f}{y:10.4f}{z:10.4f} {mol.symbols[i]:<3s} 0  0  0  0  0"
        )
    for b in mol.bonds:
        out.append(f"{b.a + 1:3d}{b.b + 1:3d}{b.type:3d}  0")
    chg = [(i, c) for i, c in enumerate(mol.charges) if c]
    for i0 in range(0, len(chg), 8):
        grp = chg[i0 : i0 + 8]
        out.append(
            "M  CHG" + f"{len(grp):3d}" + "".join(f"{i + 1:4d}{c:4d}" for i, c in grp)
        )
    out.append("M  END")
    out.append("$$$$")
    return "\n".join(out) + "\n"


def write_sdf(path: str, mol: Molecule, coords=None, name=None):
    with open(path, "w") as fh:
        fh.write(format_sdf(mol, coords, name))
