"""Minimal PDB structure parser/writer (replaces Biopython for this
framework's needs).

Covers what the reference uses Biopython for (datasets/process_mols.py
parse_pdb_from_path, receptor extraction; utils/visualise.py writers):
ATOM/HETATM records, chains/residues/atoms, altloc filtering, element
inference, first-MODEL selection (optionally all models for multi-MODEL
trajectory files), and writing (incl. multi-MODEL trajectories).

Data model: plain dataclasses, list-ordered exactly as in the file (the
atom-order contract matters for apo/holo matching and side-chain masks).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .chem import SYMBOL_TO_Z


@dataclass
class PDBAtom:
    name: str
    element: str
    coord: np.ndarray  # (3,) float32
    serial: int = 0
    altloc: str = ""
    occupancy: float = 1.0
    bfactor: float = 0.0
    hetero: bool = False


@dataclass
class PDBResidue:
    name: str
    seq: int
    icode: str = ""
    chain_id: str = ""
    atoms: list[PDBAtom] = field(default_factory=list)
    hetero_flag: str = ""  # 'W' for waters, 'H_XXX' for het groups

    @property
    def id(self):
        return (self.hetero_flag, self.seq, self.icode)

    def get_atom(self, name: str) -> PDBAtom | None:
        for a in self.atoms:
            if a.name == name:
                return a
        return None

    def atom_coords(self) -> np.ndarray:
        return np.asarray([a.coord for a in self.atoms], dtype=np.float32)

    def remove_hydrogens(self):
        self.atoms = [a for a in self.atoms if a.element != "H"]

    def is_water(self) -> bool:
        return self.name == "HOH"


@dataclass
class PDBChain:
    id: str
    residues: list[PDBResidue] = field(default_factory=list)

    def __iter__(self):
        return iter(self.residues)


@dataclass
class PDBModel:
    chains: list[PDBChain] = field(default_factory=list)

    def __iter__(self):
        return iter(self.chains)

    def get_residues(self):
        for c in self.chains:
            yield from c.residues

    def get_atoms(self):
        for r in self.get_residues():
            yield from r.atoms

    def remove_hydrogens(self):
        for r in self.get_residues():
            r.remove_hydrogens()

    def remove_waters(self):
        for c in self.chains:
            c.residues = [r for r in c.residues if not r.is_water()]

    def atom_coords(self) -> np.ndarray:
        return np.asarray([a.coord for a in self.get_atoms()], dtype=np.float32)


def _infer_element(name: str, resname: str) -> str:
    """Element from the atom-name columns when cols 77-78 are absent."""
    n = name.strip()
    if not n:
        return ""
    # two-letter elements common in PDB hetero groups
    two = n[:2].capitalize()
    if two in ("Cl", "Br", "Fe", "Zn", "Mg", "Mn", "Na", "Ca", "Cu", "Ni", "Se", "Co") and two in SYMBOL_TO_Z:
        return two
    for ch in n:
        if ch.isalpha():
            return ch.upper()
    return ""


def parse_pdb(path_or_text: str, all_models: bool = False):
    """Parse a PDB file.  Returns a PDBModel (first model) or a list of
    PDBModel when ``all_models`` and the file has MODEL records.

    Uses the native single-pass parser (native/fastpdb.cpp) for the common
    first-model case when the shared library is available; the pure-Python
    path below is the reference implementation and the fallback."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as fh:
            text = fh.read()
    if not all_models:
        fast = _parse_pdb_native(text)
        if fast is not None:
            return fast
    lines = text.splitlines()

    models: list[PDBModel] = []
    model = PDBModel()
    chains: dict[str, PDBChain] = {}
    cur_res: PDBResidue | None = None
    in_model_block = False

    def flush_model():
        nonlocal model, chains, cur_res
        if model.chains:
            models.append(model)
        model = PDBModel()
        chains = {}
        cur_res = None

    for line in lines:
        rec = line[:6]
        if rec == "MODEL ":
            in_model_block = True
            if model.chains:
                flush_model()
        elif rec == "ENDMDL":
            flush_model()
            if not all_models:
                break
        elif rec in ("ATOM  ", "HETATM"):
            altloc = line[16:17].strip()
            if altloc not in ("", "A", "1"):
                continue
            name = line[12:16].strip()
            resname = line[17:20].strip()
            chain_id = line[21:22]
            try:
                seq = int(line[22:26])
            except ValueError:
                continue
            icode = line[26:27].strip()
            try:
                xyz = np.array(
                    [float(line[30:38]), float(line[38:46]), float(line[46:54])],
                    dtype=np.float32,
                )
            except ValueError:
                continue
            try:
                occ = float(line[54:60])
            except (ValueError, IndexError):
                occ = 1.0
            try:
                bf = float(line[60:66])
            except (ValueError, IndexError):
                bf = 0.0
            element = line[76:78].strip() if len(line) >= 77 else ""
            element = element.capitalize() if len(element) == 2 else element.upper()
            if not element or element not in SYMBOL_TO_Z:
                element = _infer_element(name, resname)
            hetero = rec == "HETATM"
            try:
                serial = int(line[6:11])
            except ValueError:
                serial = 0

            if chain_id not in chains:
                chains[chain_id] = PDBChain(chain_id)
                model.chains.append(chains[chain_id])
            ch = chains[chain_id]
            hetflag = "W" if resname == "HOH" else (f"H_{resname}" if hetero else "")
            if (
                cur_res is None
                or cur_res.seq != seq
                or cur_res.icode != icode
                or cur_res.chain_id != chain_id
                or cur_res.name != resname
            ):
                cur_res = PDBResidue(resname, seq, icode, chain_id, hetero_flag=hetflag)
                ch.residues.append(cur_res)
            cur_res.atoms.append(
                PDBAtom(name, element, xyz, serial, altloc, occ, bf, hetero)
            )

    if model.chains:
        models.append(model)
    if not models:
        models = [PDBModel()]
    return models if all_models else models[0]


def _parse_pdb_native(text: str):
    """Build a PDBModel from the native parser's flat arrays; None if the
    native tier is unavailable."""
    from . import native

    arrs = native.parse_pdb_arrays(text)
    if arrs is None:
        return None
    n = arrs["n"]
    if n == 0:
        return None if ("ATOM" in text or "HETATM" in text) else PDBModel()

    # vectorized string decoding (the per-atom Python loop would otherwise
    # dominate and erase the native parser's 9x win)
    names = np.char.decode(
        np.char.rstrip(arrs["name"].copy().view("S4")[:, 0], b"\x00"), "ascii"
    )
    resnames = np.char.decode(
        np.char.rstrip(arrs["resname"].copy().view("S3")[:, 0], b"\x00"), "ascii"
    )
    elements_raw = np.char.decode(
        np.char.rstrip(arrs["element"].copy().view("S2")[:, 0], b"\x00"), "ascii"
    )
    chains_arr = arrs["chain"]
    seqs = arrs["resseq"]
    icodes = arrs["icode"]
    hets = arrs["het"]
    coords = arrs["coords"]
    occs = arrs["occ"]
    bfacs = arrs["bfac"]
    serials = arrs["serial"]

    # residue boundaries
    brk = np.zeros(n, dtype=bool)
    brk[0] = True
    brk[1:] = (
        (chains_arr[1:] != chains_arr[:-1])
        | (seqs[1:] != seqs[:-1])
        | (icodes[1:] != icodes[:-1])
        | (resnames[1:] != resnames[:-1])
    )
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], n)

    model = PDBModel()
    chain_map: dict[str, PDBChain] = {}
    for s0, e0 in zip(starts, ends):
        resname = str(resnames[s0])
        chain_id = chr(chains_arr[s0])
        icode = chr(icodes[s0]) if icodes[s0] else ""
        hetero0 = bool(hets[s0])
        hetflag = "W" if resname == "HOH" else (f"H_{resname}" if hetero0 else "")
        res = PDBResidue(resname, int(seqs[s0]), icode, chain_id, hetero_flag=hetflag)
        atoms = res.atoms
        for i in range(s0, e0):
            el = str(elements_raw[i])
            el = el.capitalize() if len(el) == 2 else el.upper()
            if not el or el not in SYMBOL_TO_Z:
                el = _infer_element(str(names[i]), resname)
            atoms.append(
                PDBAtom(
                    str(names[i]), el, coords[i], int(serials[i]), "",
                    float(occs[i]), float(bfacs[i]), bool(hets[i]),
                )
            )
        if chain_id not in chain_map:
            chain_map[chain_id] = PDBChain(chain_id)
            model.chains.append(chain_map[chain_id])
        chain_map[chain_id].residues.append(res)
    return model


def format_pdb_model(model: PDBModel, model_number: int | None = None) -> str:
    """Format one model's ATOM records."""
    out = []
    if model_number is not None:
        out.append(f"MODEL     {model_number:4d}")
    serial = 1
    for chain in model.chains:
        for res in chain.residues:
            for a in res.atoms:
                rec = "HETATM" if a.hetero else "ATOM  "
                name = a.name
                if len(name) < 4 and len(a.element) == 1:
                    name = " " + name
                out.append(
                    f"{rec}{serial:5d} {name:<4s}{'':1s}{res.name:<3s} "
                    f"{chain.id:1s}{res.seq:4d}{res.icode or '':1s}   "
                    f"{a.coord[0]:8.3f}{a.coord[1]:8.3f}{a.coord[2]:8.3f}"
                    f"{a.occupancy:6.2f}{a.bfactor:6.2f}          "
                    f"{a.element:>2s}"
                )
                serial += 1
        out.append("TER")
    if model_number is not None:
        out.append("ENDMDL")
    return "\n".join(out) + "\n"


def write_pdb(path: str, models: "PDBModel | list[PDBModel]"):
    if isinstance(models, PDBModel):
        text = format_pdb_model(models) + "END\n"
    else:
        text = "".join(
            format_pdb_model(m, i + 1) for i, m in enumerate(models)
        ) + "END\n"
    with open(path, "w") as fh:
        fh.write(text)
