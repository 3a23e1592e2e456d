"""Receptor extraction, featurization, pocket reduction, and side-chain
rotation masks.

Parity targets (reference):
- extract_receptor_structure          datasets/process_mols.py:291-432
- rec_residue/rec_atom featurizers    datasets/process_mols.py:146-162, 518-576
- get_calpha/get_fullrec graph        datasets/process_mols.py:580-724
- PocketSelector / ligand-dist        datasets/pdbbind.py:775-789
- _calculate_binding_pocket           datasets/pdbbind.py:324-339
- _get_flexdist_cutoff_func           datasets/pdbbind.py:341-363
- get_sidechain_rotation_mask(s)      utils/torsion.py:163-249,
                                      datasets/process_mols.py:773-914
- order_atoms_in_residue              datasets/pdbbind.py:365-theirs

Differences (documented): the legacy EquiBind features mu_r_norm /
side_chain_vecs are computed by the reference featurizer but never consumed
by any DiffDock-Pocket model, so they are not produced here.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field

import networkx as nx
import numpy as np

from . import chem
from .chem import ALLOWABLE_FEATURES as AF
from .chem import safe_index
from .pdb import PDBModel, PDBResidue

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# atom ordering / cleanup
# ---------------------------------------------------------------------------

def atom_sort_key(resname: str, atom) -> tuple:
    """Canonical intra-residue atom order: N/CA/C/O then side chain in
    chemical-component order, OXT second-to-last, hydrogens last."""
    if atom.element == "H":
        return (3, 0)
    if atom.name == "OXT":
        return (2, 0)
    order = chem.RESIDUE_ATOM_ORDER.get(resname)
    if order and atom.name in order:
        return (0, order.index(atom.name))
    return (1, atom.name)


def sort_atoms(model: PDBModel):
    for res in model.get_residues():
        res.atoms.sort(key=lambda a: atom_sort_key(res.name, a))


# ---------------------------------------------------------------------------
# pocket math
# ---------------------------------------------------------------------------

class NoAtomCloseToLigandError(ValueError):
    """Raised under skip_no_pocket_atoms when no receptor point is within
    pocket_cutoff of the ligand (reference NoAtomCloseToLigandException,
    pdbbind.py:330-331)."""


def calculate_binding_pocket(
    rec_points: np.ndarray, lig_pos: np.ndarray, buffer: float,
    pocket_cutoff: float, skip_no_pocket_atoms: bool = False,
):
    """(pocket center, buffered radius) — center = mean of receptor points
    within pocket_cutoff of any ligand atom (closest point fallback)."""
    d = np.linalg.norm(rec_points[:, None] - lig_pos[None, :], axis=-1)
    label = (d < pocket_cutoff).any(axis=1)
    if label.any():
        center = rec_points[label].mean(axis=0)
    else:
        if skip_no_pocket_atoms:
            raise NoAtomCloseToLigandError(
                f"no receptor point within pocket_cutoff={pocket_cutoff} A "
                f"of the ligand (closest {d.min():.2f} A)"
            )
        logger.warning(
            "No pocket residue below %s A; taking closest at %.2f",
            pocket_cutoff, d.min(),
        )
        center = rec_points[d.min(axis=1).argmin()]
    radius = np.linalg.norm(lig_pos - center[None, :], axis=1).max() + buffer
    return center.astype(np.float32), float(radius)


def make_pocket_selector(mode, center, radius, lig_pos, all_atoms):
    """Residue-acceptance predicate for pocket reduction
    ('center-dist' sphere or 'ligand-dist')."""
    if mode == "center-dist":
        def accept(res: PDBResidue) -> bool:
            if all_atoms:
                c = res.atom_coords()
                return bool((np.linalg.norm(c - center, axis=1) < radius).any())
            ca = res.get_atom("CA")
            return ca is not None and np.linalg.norm(ca.coord - center) < radius

        return accept
    elif mode == "ligand-dist":
        def accept(res: PDBResidue) -> bool:
            c = np.asarray(
                [a.coord for a in res.atoms if a.element != "H"], dtype=np.float32
            )
            if len(c) == 0:
                return False
            d = np.linalg.norm(c[:, None] - lig_pos[None], axis=-1)
            return bool((d < 12.0).any())

        return accept
    raise NotImplementedError(mode)


def make_flexdist_func(rec_ca: np.ndarray, lig_pos: np.ndarray, flexdist, mode, pocket_cutoff):
    """Atom-acceptance predicate for flexible-side-chain selection
    (L2 pocket sphere or gnina-style prism; reference pdbbind.py:341-363)."""
    if mode == "L2":
        center, radius = calculate_binding_pocket(rec_ca, lig_pos, flexdist, pocket_cutoff)

        def accept(coord: np.ndarray) -> bool:
            return bool(np.linalg.norm(coord - center) <= radius)

        return accept
    elif mode == "prism":
        mins = lig_pos.min(axis=0) - flexdist
        maxs = lig_pos.max(axis=0) + flexdist

        def accept(coord: np.ndarray) -> bool:
            if np.all(coord >= mins) and np.all(coord <= maxs):
                return bool(
                    (np.linalg.norm(lig_pos - coord[None], axis=1) < flexdist).any()
                )
            return False

        return accept
    raise NotImplementedError(mode)


# ---------------------------------------------------------------------------
# receptor extraction
# ---------------------------------------------------------------------------

@dataclass
class ReceptorArrays:
    """Flat receptor arrays in a fixed atom order (the contract between host
    featurization and the device graphs + the PDB writers)."""

    residues: list[PDBResidue]  # extracted residues, in order
    ca_pos: np.ndarray  # [NR, 3]
    res_feat: np.ndarray  # [NR, 1] amino-acid ids
    atom_pos: np.ndarray  # [NA, 3]
    atom_feat: np.ndarray  # [NA, 4]
    atom_res_index: np.ndarray  # [NA]
    lm_embeddings: np.ndarray | None = None  # [NR, esm_dim]


def residue_feature(res: PDBResidue) -> int:
    return safe_index(AF["possible_amino_acids"], res.name)


def atom_feature(res: PDBResidue, atom) -> list[int]:
    element = atom.element
    if element == "CD":
        element = "C"
    z = chem.atomic_number(element)
    return [
        safe_index(AF["possible_amino_acids"], res.name),
        safe_index(AF["possible_atomic_num_list"], z if z > 0 else "misc"),
        safe_index(AF["possible_atom_type_2"], (atom.name + "*")[:2]),
        safe_index(AF["possible_atom_type_3"], atom.name),
    ]


def extract_receptor(
    model: PDBModel,
    lig_pos: np.ndarray,
    chain_cutoff: float = 10.0,
    pocket_selector=None,
    lm_embedding_chains: list[np.ndarray] | None = None,
    remove_hs: bool = True,
) -> ReceptorArrays:
    """Select chains near the ligand, keep residues with complete backbone
    (CA/N/C), optionally reduce to the pocket, and emit flat arrays.

    Chain filtering: a chain survives if any of its (complete) residues has
    an atom within chain_cutoff of the ligand; if none do, the closest chain
    is kept (reference process_mols.py:380-383).
    """
    # per-chain candidate residues (backbone-complete, non-water)
    chain_res: list[list[tuple[int, PDBResidue]]] = []
    chain_min_d: list[float] = []
    for chain in model.chains:
        picked = []
        coords = []
        res_counter = 0
        for res in chain.residues:
            if res.is_water():
                continue
            ca, n_at, c_at = res.get_atom("CA"), res.get_atom("N"), res.get_atom("C")
            if ca is None or n_at is None or c_at is None:
                continue
            # index within the chain's complete residues — the unit the ESM
            # embeddings are aligned to
            picked.append((res_counter, res))
            res_counter += 1
            coords.append(res.atom_coords())
        if coords:
            allc = np.concatenate(coords, axis=0)
            from . import native

            d = float(native.min_dist(allc, lig_pos).min())
        else:
            d = np.inf
        chain_res.append(picked)
        chain_min_d.append(d)

    chain_min_d = np.asarray(chain_min_d)
    valid = [
        i for i, d in enumerate(chain_min_d) if d < chain_cutoff and chain_res[i]
    ]
    if not valid:
        valid = [int(chain_min_d.argmin())]

    residues: list[PDBResidue] = []
    lm_rows: list[np.ndarray] = []
    for ci in valid:
        for local_idx, res in chain_res[ci]:
            if pocket_selector is not None and not pocket_selector(res):
                continue
            if remove_hs:
                res.remove_hydrogens()
            residues.append(res)
            if lm_embedding_chains is not None:
                if ci >= len(lm_embedding_chains):
                    raise ValueError(
                        "valid chain id not present in the LM embeddings"
                    )
                lm_rows.append(lm_embedding_chains[ci][local_idx])

    if not residues:
        raise ValueError("receptor extraction produced no residues")

    ca_pos = np.asarray([r.get_atom("CA").coord for r in residues], np.float32)
    res_feat = np.asarray([[residue_feature(r)] for r in residues], np.int32)

    atom_pos, atom_feat, atom_res = [], [], []
    for ri, res in enumerate(residues):
        for atom in res.atoms:
            if remove_hs and atom.element == "H":
                continue
            atom_pos.append(atom.coord)
            atom_feat.append(atom_feature(res, atom))
            atom_res.append(ri)

    lm = np.asarray(lm_rows, np.float32) if lm_embedding_chains is not None else None
    return ReceptorArrays(
        residues=residues,
        ca_pos=ca_pos,
        res_feat=res_feat,
        atom_pos=np.asarray(atom_pos, np.float32),
        atom_feat=np.asarray(atom_feat, np.int32),
        atom_res_index=np.asarray(atom_res, np.int32),
        lm_embeddings=lm,
    )


def calpha_knn_lists(ca_pos: np.ndarray, cutoff: float, max_neighbors: int | None):
    """Residue neighbor lists: within-cutoff capped at max_neighbors nearest;
    isolated residues get their single nearest neighbor (reference
    get_calpha_graph semantics, process_mols.py:600-612)."""
    n = len(ca_pos)
    k = max_neighbors or 32
    k = min(k, n - 1)
    d = np.linalg.norm(ca_pos[:, None] - ca_pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)[:, :k]
    dist = np.take_along_axis(d, order, axis=1)
    mask = dist < cutoff
    none = ~mask.any(axis=1)
    mask[none, 0] = True  # closest fallback
    return order.astype(np.int32), mask


# ---------------------------------------------------------------------------
# side-chain rotation masks
# ---------------------------------------------------------------------------

_GREEK_ORDER = {"A": "B", "B": "G", "G": "D", "D": "E", "E": "Z", "Z": "H", "H": ""}
_RING_EDGES = {("CE1", "NE2"), ("NE1", "CE2"), ("CD2", "CE3"), ("CZ3", "CH2")}


def _sidechain_atom_names(res: PDBResidue) -> list[str]:
    """Heavy atoms participating in the chi-rotation graph: drop backbone
    C/O/N, OXT and hydrogens; keep CA as the root."""
    out = []
    for a in res.atoms:
        n = a.name
        if n in ("C", "O", "N", "OXT") or a.element == "H" or n.startswith("H"):
            continue
        out.append(n)
    return out


def _sidechain_graph(names: list[str]) -> nx.Graph:
    """Connect side-chain heavy atoms in Greek-letter order (CA->CB->CG->...),
    with the His/Trp ring closures (reference add_edges, torsion.py:225-249)."""
    g = nx.Graph()
    g.add_nodes_from(names)
    for i in range(len(names) - 1):
        for j in range(i + 1, len(names)):
            cur, nxt = names[i], names[j]
            if (cur, nxt) in _RING_EDGES:
                g.add_edge(cur, nxt)
            if len(cur) < 2 or len(nxt) < 2:
                continue
            if cur[1] not in _GREEK_ORDER:
                continue
            if len(cur) == len(nxt) == 3:
                if _GREEK_ORDER[cur[1]] == nxt[1] and cur[2] == nxt[2]:
                    g.add_edge(cur, nxt)
            else:
                if _GREEK_ORDER[cur[1]] == nxt[1]:
                    g.add_edge(cur, nxt)
    return g


def sidechain_rotation_mask(res: PDBResidue, atom_offset: int):
    """Rotatable chi bonds of one residue, ordered CA-outward (BFS), each
    with the set of (globally-indexed) atoms it rotates.

    Returns list of (subcomponent_atom_indices, (u, v)) like the reference's
    per-residue mask_rotate (torsion.py:163-223)."""
    names = _sidechain_atom_names(res)
    if "CA" not in names:
        return []
    # map graph node name -> index within the residue's atom list
    name_to_local = {}
    for i, a in enumerate(res.atoms):
        if a.name in names and a.name not in name_to_local:
            name_to_local[a.name] = i
    g = _sidechain_graph(names)
    out = []
    for edge in nx.bfs_tree(g, "CA").edges():
        g2 = g.copy()
        g2.remove_edge(*edge)
        if nx.is_connected(g2):
            continue
        comps = list(nx.connected_components(g2))
        comp = next(c for c in comps if edge[1] in c)
        if len(comp) <= 1:
            continue
        rotated = [name_to_local[n] + atom_offset for n in comp]
        bond = (
            name_to_local[edge[0]] + atom_offset,
            name_to_local[edge[1]] + atom_offset,
        )
        out.append((rotated, bond))
    return out


def sidechain_rotation_masks(
    rec: ReceptorArrays, accept_atom, flexible_resnames=None
):
    """All flexible residues' chi bonds over the flat atom arrays.

    A residue is flexible when (a) its name allows side-chain torsions
    (not ALA/GLY/PRO), and (b) any side-chain heavy atom passes
    ``accept_atom`` (a coord predicate).  Returns
    (sc_bond_index [S,2], sc_rotate_mask [S, NA], sc_res_index [S],
     flex_residue_ids list)."""
    flexible_resnames = flexible_resnames or (
        chem.FLEXIBLE_SIDECHAIN_RESIDUES - {"ALA", "GLY", "PRO"}
    )
    na = len(rec.atom_pos)
    bonds, masks, res_ids, flex_res = [], [], [], []
    # atom offset of each residue in the flat arrays
    offsets = {}
    for i, ri in enumerate(rec.atom_res_index):
        offsets.setdefault(int(ri), i)

    flex_idx = 0
    for ri, res in enumerate(rec.residues):
        if res.name in ("ALA", "GLY", "PRO") or res.name not in flexible_resnames:
            continue
        accepted = False
        for a in res.atoms:
            if a.element == "H" or a.name in ("CA", "N", "C", "O", "OXT"):
                continue
            if accept_atom(a.coord):
                accepted = True
                break
        if not accepted:
            continue
        try:
            per_res = sidechain_rotation_mask(res, offsets[ri])
        except Exception as e:  # reference skips residues that fail (pdbbind)
            logger.warning("skipping flexible residue %s: %s", res.name, e)
            continue
        for rotated, bond in per_res:
            m = np.zeros(na, dtype=bool)
            m[rotated] = True
            bonds.append(bond)
            masks.append(m)
            res_ids.append(flex_idx)
        if per_res:
            flex_res.append((res.chain_id, res.seq, res.name))
            flex_idx += 1

    if not bonds:
        return (
            np.zeros((0, 2), np.int32),
            np.zeros((0, na), bool),
            np.zeros((0,), np.int32),
            [],
        )
    return (
        np.asarray(bonds, np.int32),
        np.asarray(masks),
        np.asarray(res_ids, np.int32),
        flex_res,
    )


def extract_misc_atoms(model: PDBModel, ca_pos: np.ndarray, remove_hs: bool = True,
                       max_dist: float = 10.0):
    """Miscellaneous atoms: atoms of residues lacking a complete backbone
    (cofactors, ions, het groups; waters excluded upstream), kept when within
    ``max_dist`` of any retained C-alpha (reference process_mols.py:404-414).
    Returns (pos [NM,3], feat [NM,4], res_index [NM] = nearest residue)."""
    pos, feats = [], []
    for res in model.get_residues():
        if res.is_water():
            continue
        if (res.get_atom("CA") is not None and res.get_atom("N") is not None
                and res.get_atom("C") is not None):
            continue
        for a in res.atoms:
            if remove_hs and a.element == "H":
                continue
            pos.append(a.coord)
            feats.append(atom_feature(res, a))
    if not pos:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 4), np.int32),
                np.zeros((0,), np.int32))
    pos = np.asarray(pos, np.float32)
    feats = np.asarray(feats, np.int32)
    d = np.linalg.norm(pos[:, None] - ca_pos[None, :], axis=-1)
    keep = d.min(axis=1) < max_dist
    res_index = d.argmin(axis=1).astype(np.int32)
    return pos[keep], feats[keep], res_index[keep]
