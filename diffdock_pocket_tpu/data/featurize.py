"""Complex featurization: ligand + receptor files -> ComplexGraph raw arrays.

This is the host-side equivalent of the reference's PDBBind.get_complex
(datasets/pdbbind.py:480-757): parse structures, (optionally) conformer-match,
compute the binding pocket, reduce the receptor to the pocket, select
flexible side chains, and center the complex on the pocket center — emitting
padded-ready numpy arrays instead of PyG HeteroData.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import receptor as R
from .mol import Molecule
from .pdb import PDBModel, parse_pdb
from .sdf import read_molecule

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class DataConfig:
    """Dataset/featurization knobs (subset of reference PDBBind __init__
    arguments that affect graph construction)."""

    chain_cutoff: float = 10.0
    receptor_radius: float = 15.0
    c_alpha_max_neighbors: int = 24
    remove_hs: bool = True
    all_atoms: bool = True
    pocket_reduction: bool = True
    pocket_buffer: float = 10.0
    pocket_cutoff: float = 5.0
    pocket_reduction_mode: str = "center-dist"
    flexible_sidechains: bool = True
    flexdist: float = 3.5
    flexdist_distance_metric: str = "prism"
    keep_local_structures: bool = True
    include_miscellaneous_atoms: bool = False
    matching: bool = False  # torsional conformer matching (training)
    popsize: int = 15
    maxiter: int = 15
    # >1: store several independently matched conformers; the trainer picks
    # one at random per batch assembly (reference num_conformers,
    # process_mols.py:478-501 + pdbbind.py:80-81 random.choice)
    num_conformers: int = 1
    conformer_match_sidechains: bool = False
    conformer_match_score: str = "dist"
    match_max_rmsd: Optional[float] = None
    use_original_conformer_fallback: bool = True
    use_original_conformer: bool = False
    max_lig_size: Optional[int] = None
    # store the experimental (holo) side-chain coordinates alongside the
    # computational (apo) input so validation can measure sc-RMSD vs the
    # TRUE protein (reference compare_true_protein, pdbbind.py:550-553 +
    # process_mols.py:860-866 true_sc_pos)
    compare_true_protein: bool = False
    # drop complexes whose reduced pocket has no receptor atoms near the
    # ligand (reference skip_no_pocket_atoms, pdbbind.py:181-182)
    skip_no_pocket_atoms: bool = False
    # tetrahedral chirality tags from the 3D ligand coordinates
    # (Molecule.chiral_tags; the reference's featurizer gets them from
    # RDKit AssignStereochemistryFrom3D).  Default True for new runs;
    # model yml reconstruction defaults it False for run dirs predating
    # the field so old checkpoints keep their training-time features
    # (utils/checkpoint.py::load_data_config).
    lig_chirality: bool = True
    # hybridization heuristic revision ("v1" = round-2 rules; "v2" adds
    # carboxylate/nitro SP2, hypervalent SP3D/SP3D2 and the N/O
    # conjugation pass).  Same back-compat contract as lig_chirality: the
    # feature feeds a trained embedding, so old run dirs reconstruct "v1".
    hybridization_version: str = "v2"


@dataclass
class ComplexData:
    """Raw (unpadded) complex arrays + host-side metadata for writers."""

    raw: dict  # ComplexGraph field arrays (see graph.py)
    name: str
    ligand: Molecule  # H-stripped ligand (template for SDF output)
    receptor_arrays: R.ReceptorArrays
    flex_residue_ids: list
    pocket_center: np.ndarray  # original-frame pocket center [3]
    rmsd_matching: float = 0.0
    match_rmsd: Optional[float] = None


def build_complex(
    ligand: "Molecule | str",
    protein: "PDBModel | str",
    cfg: DataConfig,
    name: str = "complex",
    computational_protein: "PDBModel | str | None" = None,
    lm_embedding_chains: Optional[list] = None,
    predefined_flexible_sidechains: Optional[list] = None,
    pocket_center_override: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
) -> ComplexData:
    """Featurize one protein-ligand complex.

    ``protein`` is the experimental (holo) structure; ``computational_protein``
    the apo/ESMFold structure used as the model input when side-chain
    conformer matching is enabled (training) — at inference the experimental
    structure is used directly (use_original_conformer_fallback semantics).
    """
    if isinstance(ligand, str):
        ligand = read_molecule(ligand, remove_hs=False)
    if isinstance(protein, str):
        protein = parse_pdb(protein)
    if isinstance(computational_protein, str):
        computational_protein = parse_pdb(computational_protein)

    if cfg.max_lig_size is not None:
        heavy = sum(1 for s in ligand.symbols if s != "H")
        if heavy > cfg.max_lig_size:
            raise ValueError(f"ligand larger than max_lig_size ({heavy})")

    # --- ligand ------------------------------------------------------------
    lig = ligand.remove_hydrogens() if cfg.remove_hs else ligand
    rmsd_matching = 0.0
    extra_conformers: list[np.ndarray] = []
    # the input (crystal) ligand geometry: ground truth for lig_orig_pos and
    # the anchor for pocket/receptor extraction even when the working
    # conformer is matched or regenerated below
    orig_coords = lig.coords.copy()
    if not cfg.keep_local_structures and not cfg.matching:
        # inference path: discard the input's local structure and start from
        # a freshly generated conformer (reference pdbbind.py:441-448)
        from .conformer import generate_conformer

        lig = generate_conformer(lig, rng=rng)
    if cfg.matching and not cfg.keep_local_structures:
        from .conformer import conformer_match_ligand

        crystal = lig  # each conformer is matched against the crystal
        if cfg.num_conformers > 1 and rng is None:
            rng = np.random.default_rng(0)  # vary the extra conformers
        lig, rmsd_matching = conformer_match_ligand(
            crystal, popsize=cfg.popsize, maxiter=cfg.maxiter, rng=rng
        )
        for _ in range(cfg.num_conformers - 1):
            alt, _ = conformer_match_ligand(
                crystal, popsize=cfg.popsize, maxiter=cfg.maxiter, rng=rng
            )
            extra_conformers.append(alt.coords)
    lig_feat = lig.featurize(chirality=cfg.lig_chirality,
                             hybridization_version=cfg.hybridization_version)
    bond_index, bond_attr = lig.bond_arrays()
    tor_index, tor_mask = lig.rotatable_bonds()

    # --- receptor cleanup --------------------------------------------------
    needs_sort = cfg.flexible_sidechains or cfg.conformer_match_sidechains
    for model in filter(None, [protein, computational_protein]):
        model.remove_waters()
        if needs_sort or cfg.remove_hs:
            model.remove_hydrogens()
        if needs_sort:
            R.sort_atoms(model)

    match_rmsd = None
    rec_model = protein
    if computational_protein is not None:
        n_exp = sum(1 for _ in protein.get_atoms())
        n_comp = sum(1 for _ in computational_protein.get_atoms())
        assert n_exp == n_comp, (
            f"experimental/computational atom counts differ ({n_exp} vs {n_comp})"
        )
        rec_model = computational_protein

    # --- pocket ------------------------------------------------------------
    pocket_model = protein if cfg.conformer_match_sidechains else rec_model
    ca_all = np.asarray(
        [a.coord for a in pocket_model.get_atoms() if a.name == "CA"], np.float32
    )
    if pocket_center_override is not None:
        pocket_center = np.asarray(pocket_center_override, np.float32)
        mol_center = orig_coords.mean(0)
        pocket_radius = float(
            np.linalg.norm(orig_coords - mol_center[None], axis=1).max()
        )
    else:
        pocket_center, pocket_radius = R.calculate_binding_pocket(
            ca_all, orig_coords, 0.0, cfg.pocket_cutoff,
            skip_no_pocket_atoms=cfg.skip_no_pocket_atoms,
        )
    pocket_radius_buffered = pocket_radius + cfg.pocket_buffer

    selector = None
    if cfg.pocket_reduction or cfg.conformer_match_sidechains:
        selector = R.make_pocket_selector(
            cfg.pocket_reduction_mode, pocket_center, pocket_radius_buffered,
            orig_coords, cfg.all_atoms,
        )

    # --- side-chain conformer matching (apo -> holo, training) -------------
    if cfg.conformer_match_sidechains and computational_protein is not None:
        from .sidechain_conformer import conformer_match_sidechains

        rec_model, match_rmsd = conformer_match_sidechains(
            computational_protein, protein, selector, orig_coords, cfg, rng=rng
        )

    # --- receptor arrays ---------------------------------------------------
    rec = R.extract_receptor(
        rec_model, orig_coords,
        chain_cutoff=cfg.chain_cutoff,
        pocket_selector=selector if cfg.pocket_reduction else None,
        lm_embedding_chains=lm_embedding_chains,
        remove_hs=cfg.remove_hs,
    )
    nbr_idx, nbr_mask = R.calpha_knn_lists(
        rec.ca_pos, cfg.receptor_radius, cfg.c_alpha_max_neighbors
    )

    # CG + miscellaneous atoms: the het-group atoms occupy the atom node type
    # (the all-atom wiring then serves as the misc-atom conv machinery —
    # reference's CG include_miscellaneous_atoms variant,
    # models/score_model.py:181-185)
    if cfg.include_miscellaneous_atoms and not cfg.all_atoms:
        m_pos, m_feat, m_res = R.extract_misc_atoms(rec_model, rec.ca_pos,
                                                    remove_hs=cfg.remove_hs)
        rec.atom_pos = m_pos
        rec.atom_feat = m_feat
        rec.atom_res_index = m_res

    # --- flexible side chains ---------------------------------------------
    if cfg.flexible_sidechains:
        if predefined_flexible_sidechains:
            sc_idx, sc_mask, sc_res, flex_ids = _predefined_sidechains(
                rec, set(predefined_flexible_sidechains)
            )
        else:
            accept = R.make_flexdist_func(
                rec.ca_pos, orig_coords, cfg.flexdist,
                cfg.flexdist_distance_metric, cfg.pocket_cutoff,
            )
            sc_idx, sc_mask, sc_res, flex_ids = R.sidechain_rotation_masks(rec, accept)
    else:
        na = len(rec.atom_pos)
        sc_idx = np.zeros((0, 2), np.int32)
        sc_mask = np.zeros((0, na), bool)
        sc_res = np.zeros((0,), np.int32)
        flex_ids = []

    # --- center on the pocket ---------------------------------------------
    if cfg.pocket_reduction:
        center = pocket_center
    else:
        center = rec.ca_pos.mean(axis=0)
    raw = {
        "lig_pos": lig.coords - center,
        "lig_orig_pos": orig_coords - center,
        "lig_feat": lig_feat,
        "lig_bond_index": bond_index,
        "lig_bond_attr": bond_attr,
        "tor_bond_index": tor_index,
        "tor_rotate_mask": tor_mask,
        "rec_pos": rec.ca_pos - center,
        "rec_feat": rec.res_feat,
        "rec_esm": rec.lm_embeddings
        if rec.lm_embeddings is not None
        else np.zeros((len(rec.ca_pos), 0), np.float32),
        "rec_nbr_idx": nbr_idx,
        "rec_nbr_mask": nbr_mask,
        "atom_pos": rec.atom_pos - center,
        "atom_orig_pos": rec.atom_pos - center,
        "atom_feat": rec.atom_feat,
        "atom_res_index": rec.atom_res_index,
        "sc_bond_index": sc_idx,
        "sc_rotate_mask": sc_mask,
        "sc_res_index": sc_res,
        "original_center": center.astype(np.float32),
    }
    if cfg.compare_true_protein and computational_protein is not None:
        # experimental (holo) coordinates for the SAME extracted atoms, so
        # validation can measure sc-RMSD vs the true protein when training
        # on computational structures (reference true_sc_pos,
        # process_mols.py:860-866; non-flexible entries fall back to the
        # input positions — only flexible atoms are ever read)
        raw["atom_true_pos"] = (
            _true_atom_positions(rec, protein, cfg.remove_hs) - center
        ).astype(np.float32)
    if extra_conformers:
        # [num_conformers, NL, 3]; ignored by from_raw's schema — the trainer
        # substitutes one conformer into lig_pos per batch assembly
        raw["lig_conf_pos"] = np.stack(
            [raw["lig_pos"]] + [c - center for c in extra_conformers]
        ).astype(np.float32)
    return ComplexData(
        raw=raw,
        name=name,
        ligand=lig,
        receptor_arrays=rec,
        flex_residue_ids=flex_ids,
        pocket_center=pocket_center,
        rmsd_matching=rmsd_matching,
        match_rmsd=match_rmsd,
    )


def _true_atom_positions(rec: R.ReceptorArrays, true_model, remove_hs: bool):
    """[NA, 3] positions of the extracted receptor atoms taken from the
    experimental model, matched by (chain, residue seq, atom name); atoms
    with no counterpart keep their input position."""
    true_map = {}
    for chain in true_model.chains:
        for res in chain.residues:
            true_map[(res.chain_id, res.seq)] = res
    out = rec.atom_pos.copy()
    idx = 0
    n_missing = 0
    for res in rec.residues:
        tres = true_map.get((res.chain_id, res.seq))
        for atom in res.atoms:
            if remove_hs and atom.element == "H":
                continue
            ta = tres.get_atom(atom.name) if tres is not None else None
            if ta is not None:
                out[idx] = ta.coord
            else:
                n_missing += 1
            idx += 1
    if n_missing:
        logger.warning(
            "compare_true_protein: %d/%d atoms had no experimental "
            "counterpart; kept input positions", n_missing, idx,
        )
    return out


def _predefined_sidechains(rec: R.ReceptorArrays, allowed: set):
    """Flexible side chains from explicit 'chain:resid' identifiers
    (reference predefined_flexible_sidechains path, pdbbind.py:689-696)."""
    import numpy as np

    na = len(rec.atom_pos)
    offsets = {}
    for i, ri in enumerate(rec.atom_res_index):
        offsets.setdefault(int(ri), i)
    bonds, masks, res_ids, flex_res = [], [], [], []
    flex_idx = 0
    for ri, res in enumerate(rec.residues):
        if f"{res.chain_id}:{res.seq}" not in allowed:
            continue
        per_res = R.sidechain_rotation_mask(res, offsets[ri])
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
            np.zeros((0, 2), np.int32), np.zeros((0, na), bool),
            np.zeros((0,), np.int32), [],
        )
    return (
        np.asarray(bonds, np.int32), np.asarray(masks),
        np.asarray(res_ids, np.int32), flex_res,
    )
