"""Host data-layer tests on the shipped 3dpf example complex
(example_data/ — a real PDB + SDF pair, CPU-only)."""
import os

import numpy as np
import pytest

from diffdock_pocket_tpu.data import featurize, pdb, receptor, sdf
from diffdock_pocket_tpu.data.chem import ALLOWABLE_FEATURES

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
PROTEIN = os.path.join(EXAMPLE, "3dpf_protein.pdb")
LIGAND = os.path.join(EXAMPLE, "3dpf_ligand.sdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROTEIN), reason="3dpf example data not available"
)


def test_parse_sdf_3dpf():
    mol = sdf.parse_sdf(LIGAND)
    assert mol.n_atoms == 59
    assert len(mol.bonds) == 64
    # known formal charge: the quaternary N (atom 8 in the file is N+)
    assert sum(mol.charges) >= 1
    heavy = mol.remove_hydrogens()
    assert heavy.n_atoms < mol.n_atoms or all(s != "H" for s in mol.symbols)


def test_ligand_featurization_3dpf():
    mol = sdf.parse_sdf(LIGAND).remove_hydrogens()
    feats = mol.featurize()
    assert feats.shape == (mol.n_atoms, 16)
    # atomic numbers: index into possible_atomic_num_list is Z - 1
    zs = feats[:, 0] + 1
    assert set(np.unique(zs)).issubset({6, 7, 8, 16})
    bond_idx, bond_attr = mol.bond_arrays()
    assert bond_idx.shape[0] == 2 * len(mol.bonds)
    assert bond_attr.shape == (2 * len(mol.bonds), 4)


def test_rotatable_bonds_3dpf():
    mol = sdf.parse_sdf(LIGAND).remove_hydrogens()
    tor_idx, tor_mask = mol.rotatable_bonds()
    assert tor_idx.shape[0] > 3  # this ligand has several rotatable bonds
    for k in range(tor_idx.shape[0]):
        u, v = tor_idx[k]
        assert not tor_mask[k, u]
        assert tor_mask[k, v]
        assert 1 < tor_mask[k].sum() < mol.n_atoms - 1


def test_parse_pdb_3dpf():
    model = pdb.parse_pdb(PROTEIN)
    n_res = sum(1 for _ in model.get_residues())
    assert n_res > 100
    atoms = list(model.get_atoms())
    assert len(atoms) > 1000
    elements = {a.element for a in atoms}
    assert "C" in elements and "N" in elements and "O" in elements


def test_pdb_roundtrip():
    model = pdb.parse_pdb(PROTEIN)
    text = pdb.format_pdb_model(model)
    model2 = pdb.parse_pdb(text)
    c1 = model.atom_coords()
    c2 = model2.atom_coords()
    np.testing.assert_allclose(c1, c2, atol=2e-3)
    names1 = [a.name for a in model.get_atoms()]
    names2 = [a.name for a in model2.get_atoms()]
    assert names1 == names2


def test_build_complex_3dpf():
    cfg = featurize.DataConfig()
    data = featurize.build_complex(LIGAND, PROTEIN, cfg, name="3dpf")
    raw = data.raw
    nl = len(raw["lig_pos"])
    nr = len(raw["rec_pos"])
    na = len(raw["atom_pos"])
    assert nl == sdf.parse_sdf(LIGAND).remove_hydrogens().n_atoms
    assert 10 < nr < 400  # pocket-reduced
    assert na > nr  # several atoms per residue
    assert raw["atom_res_index"].max() == nr - 1
    # complex is centered on the pocket: ligand centroid near origin
    assert np.linalg.norm(raw["lig_pos"].mean(0)) < 15.0
    # receptor neighbor lists are valid
    assert raw["rec_nbr_idx"].shape[0] == nr
    assert raw["rec_nbr_mask"].any(axis=1).all()
    # flexible side chains were found near the pocket
    assert raw["sc_bond_index"].shape[0] > 0
    assert raw["sc_rotate_mask"].shape == (raw["sc_bond_index"].shape[0], na)
    for k in range(raw["sc_bond_index"].shape[0]):
        u, v = raw["sc_bond_index"][k]
        assert not raw["sc_rotate_mask"][k, u]
        assert raw["sc_rotate_mask"][k, v]


def test_sidechain_masks_are_residue_local():
    cfg = featurize.DataConfig()
    data = featurize.build_complex(LIGAND, PROTEIN, cfg, name="3dpf")
    raw = data.raw
    res_of = raw["atom_res_index"]
    for k in range(raw["sc_bond_index"].shape[0]):
        atoms = np.where(raw["sc_rotate_mask"][k])[0]
        assert len(set(res_of[atoms])) == 1  # chi rotations stay in-residue


def test_sdf_write_roundtrip():
    mol = sdf.parse_sdf(LIGAND).remove_hydrogens()
    text = sdf.format_sdf(mol)
    mol2 = sdf.parse_sdf(text)
    assert mol2.n_atoms == mol.n_atoms
    np.testing.assert_allclose(mol2.coords, mol.coords, atol=1e-3)
    assert [b.type for b in mol2.bonds] == [b.type for b in mol.bonds]


def test_num_conformers_stored_and_sampled():
    """num_conformers > 1: several independently matched conformers are
    stored (reference process_mols.py:478-501) and the trainer substitutes
    one per batch assembly (pdbbind.py:80-81)."""
    cfg = featurize.DataConfig(
        matching=True, keep_local_structures=False, num_conformers=3,
        popsize=4, maxiter=2,
    )
    data = featurize.build_complex(LIGAND, PROTEIN, cfg, name="3dpf")
    confs = data.raw["lig_conf_pos"]
    nl = len(data.raw["lig_pos"])
    assert confs.shape == (3, nl, 3)
    np.testing.assert_array_equal(confs[0], data.raw["lig_pos"])
    # independent matching randomness -> distinct conformers
    assert np.abs(confs[1] - confs[2]).max() > 1e-3
    # bond lengths consistent across conformers: the DG-embed tier rebuilds
    # both from the same idealized chemistry (within the refinement
    # tolerance); the torsion-randomize fallback preserves them exactly
    bi = data.raw["lig_bond_index"]
    l1 = np.linalg.norm(confs[1][bi[:, 0]] - confs[1][bi[:, 1]], axis=1)
    l2 = np.linalg.norm(confs[2][bi[:, 0]] - confs[2][bi[:, 1]], axis=1)
    np.testing.assert_allclose(l1, l2, atol=0.25)

    from diffdock_pocket_tpu.trainer import Trainer

    g = Trainer._graph(data, np.random.default_rng(5))
    picked = np.asarray(g.lig_pos)[:nl]
    assert any(np.allclose(picked, confs[i], atol=1e-5) for i in range(3))


def test_pdbqt_ligand_reading(tmp_path):
    """pdbqt ligands: pdbqt-specific charge/type columns are stripped before
    PDB parsing (reference process_mols.py:741-747), so elements come from
    the atom name rather than the AD-type column."""
    pdbqt = "\n".join([
        "ROOT",
        "ATOM      1  C1  LIG A   1       0.000   0.000   0.000  0.00  0.00    +0.123 C ",
        "ATOM      2  O1  LIG A   1       1.400   0.000   0.000  0.00  0.00    -0.456 OA",
        "ATOM      3  N1  LIG A   1       2.100   1.100   0.000  0.00  0.00    -0.300 NA",
        "ENDROOT",
        "TORSDOF 0",
    ]) + "\n"
    path = str(tmp_path / "lig.pdbqt")
    with open(path, "w") as fh:
        fh.write(pdbqt)
    mol = sdf.read_molecule(path)
    assert mol is not None and mol.n_atoms == 3
    assert mol.symbols == ["C", "O", "N"]
    import numpy as _np

    _np.testing.assert_allclose(mol.coords[1], [1.4, 0.0, 0.0], atol=1e-3)


def test_skip_no_pocket_atoms():
    """skip_no_pocket_atoms raises on complexes with no receptor point near
    the ligand (reference pdbbind.py:330-331); with a tiny cutoff the 3dpf
    pocket triggers it."""
    cfg = featurize.DataConfig(pocket_cutoff=0.1, skip_no_pocket_atoms=True)
    with pytest.raises(receptor.NoAtomCloseToLigandError):
        featurize.build_complex(LIGAND, PROTEIN, cfg, name="3dpf")
    # default (no skip): falls back to the closest point
    cfg = featurize.DataConfig(pocket_cutoff=0.1)
    data = featurize.build_complex(LIGAND, PROTEIN, cfg, name="3dpf")
    assert len(data.raw["rec_pos"]) > 0


def test_pocket_reduction_mode_ligand_dist():
    """ligand-dist pocket reduction keeps residues with any heavy atom
    within 12 A of the ligand (reference pdbbind.py:603-607); the selection
    differs from the default center-dist sphere."""
    base = featurize.build_complex(
        LIGAND, PROTEIN, featurize.DataConfig(), name="3dpf"
    )
    lig = featurize.build_complex(
        LIGAND, PROTEIN,
        featurize.DataConfig(pocket_reduction_mode="ligand-dist"), name="3dpf",
    )
    nr = len(lig.raw["rec_pos"])
    assert 10 < nr < 400
    assert nr != len(base.raw["rec_pos"])


def test_compare_true_protein_stores_holo_positions(tmp_path):
    """With compare_true_protein, featurization stores the experimental
    side-chain coordinates next to the computational input (reference
    true_sc_pos, process_mols.py:860-866)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts"))
    from apo_journey import make_apo

    apo_path = str(tmp_path / "apo.pdb")
    rng = np.random.default_rng(0)
    sc_rmsd_before, n_flex = make_apo(PROTEIN, LIGAND, apo_path, rng)
    assert sc_rmsd_before > 0.3 and n_flex > 0

    # crude matching budget (popsize/maxiter) so the chi perturbation is
    # NOT fully recovered and the holo truth stays distinct from the input
    cfg = featurize.DataConfig(
        conformer_match_sidechains=True, conformer_match_score="dist",
        match_max_rmsd=2.0, matching=True, keep_local_structures=False,
        compare_true_protein=True, popsize=4, maxiter=1,
    )
    data = featurize.build_complex(
        LIGAND, PROTEIN, cfg, name="3dpf", computational_protein=apo_path,
        rng=np.random.default_rng(1),
    )
    raw = data.raw
    assert "atom_true_pos" in raw
    assert raw["atom_true_pos"].shape == raw["atom_pos"].shape
    flex = raw["sc_rotate_mask"].any(axis=0)
    assert flex.any()
    # flexible atoms: close to but not exactly the holo truth
    d = np.linalg.norm(raw["atom_pos"][flex] - raw["atom_true_pos"][flex], axis=1)
    assert np.median(d) < 3.0
    # the vast majority of non-flexible atoms are identical between apo and
    # holo by construction of make_apo (a handful may differ where make_apo's
    # flexdist selection was wider than this featurization's)
    d_rigid = np.linalg.norm(
        raw["atom_pos"][~flex] - raw["atom_true_pos"][~flex], axis=1
    )
    assert np.median(d_rigid) < 1e-3
    assert (d_rigid < 1e-3).mean() > 0.8


def test_chiral_tags_from_3d():
    """Tetrahedral chirality from 3D coordinates (reference: RDKit
    AssignStereochemistryFrom3D feeding process_mols.py:117): distinct
    substituents get a CW/CCW tag, mirror images flip it, duplicate
    substituents (WL-equivalent) stay UNSPECIFIED."""
    import numpy as np

    from diffdock_pocket_tpu.data.mol import Bond, Molecule

    tet = np.asarray([
        [0.0, 0.0, 0.0],        # center C
        [1.0, 1.0, 1.0],        # F
        [1.0, -1.0, -1.0],      # Cl
        [-1.0, 1.0, -1.0],      # Br
        [-1.0, -1.0, 1.0],      # N
    ], np.float32)
    bonds = [Bond(0, i, 1) for i in range(1, 5)]

    m = Molecule(["C", "F", "Cl", "Br", "N"], tet, bonds)
    tags = m.chiral_tags()
    assert tags[0] in ("CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW")
    assert all(t == "CHI_UNSPECIFIED" for t in tags[1:])

    mirror = Molecule(["C", "F", "Cl", "Br", "N"], tet * [-1, 1, 1], bonds)
    assert mirror.chiral_tags()[0] != tags[0]
    assert mirror.chiral_tags()[0] != "CHI_UNSPECIFIED"

    # two WL-equivalent substituents -> not a stereocenter
    dup = Molecule(["C", "F", "Cl", "Cl", "N"], tet, bonds)
    assert dup.chiral_tags()[0] == "CHI_UNSPECIFIED"

    # 3 heavy neighbors + 1 implicit H is still a stereocenter
    m3 = Molecule(["C", "F", "Cl", "Br"], tet[:4], bonds[:3])
    t3 = m3.chiral_tags()
    assert t3[0] in ("CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW")
    m3m = Molecule(["C", "F", "Cl", "Br"], tet[:4] * [-1, 1, 1], bonds[:3])
    assert m3m.chiral_tags()[0] != t3[0]

    # featurize: column 1 is the chirality category (AF order); the opt-out
    # path keeps the historical all-UNSPECIFIED column
    f_on = m.featurize(chirality=True)
    f_off = m.featurize(chirality=False)
    assert f_on[0, 1] in (1, 2) and f_off[0, 1] == 0
    assert np.array_equal(f_on[:, [0] + list(range(2, 16))],
                          f_off[:, [0] + list(range(2, 16))])


def test_lig_chirality_yml_backcompat(tmp_path):
    """Run dirs whose yml predates the trained-embedding featurization
    fields (lig_chirality, hybridization_version) reconstruct with their
    era's behavior, while fresh DataConfig uses the new defaults."""
    from diffdock_pocket_tpu.data.featurize import DataConfig
    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.utils import checkpoint as ckpt

    assert DataConfig().lig_chirality is True
    assert DataConfig().hybridization_version == "v2"

    old_dc = {k: v for k, v in __import__("dataclasses").asdict(
        DataConfig()).items()
        if k not in ("lig_chirality", "hybridization_version")}
    import yaml

    cfg = ModelConfig(ns=4, nv=2)
    d = cfg.to_dict()
    d["data_config"] = old_dc
    with open(tmp_path / "model_parameters.yml", "w") as fh:
        yaml.safe_dump(d, fh)
    dc = ckpt.load_data_config(str(tmp_path))
    assert dc.lig_chirality is False
    assert dc.hybridization_version == "v1"

    # and a NEW run dir round-trips the new defaults
    ckpt.save_yaml_config(str(tmp_path), cfg, data_cfg=DataConfig())
    dc2 = ckpt.load_data_config(str(tmp_path))
    assert dc2.lig_chirality is True and dc2.hybridization_version == "v2"

    # v1 rules differ from v2 exactly where documented (3dpf: 3/37 atoms)
    from diffdock_pocket_tpu.data import sdf as sdflib

    mol = sdflib.parse_sdf(LIGAND).remove_hydrogens()
    h1, h2 = mol.hybridizations("v1"), mol.hybridizations("v2")
    assert h1 != h2
    f1 = mol.featurize(hybridization_version="v1")
    f2 = mol.featurize(hybridization_version="v2")
    assert (f1[:, 7] != f2[:, 7]).sum() > 0  # hybridization column drifts
    assert np.array_equal(np.delete(f1, 7, axis=1), np.delete(f2, 7, axis=1))


def test_dg_embed_conformer():
    """The first-party distance-geometry embedder (ETKDG role, reference
    process_mols.py:456-464): rebuilt local geometry within tolerance of
    ideal chemistry, global shape decorrelated from the input, tetrahedral
    chirality preserved, and the crystal conformer sits inside the smoothed
    bounds the embedder refines against."""
    import numpy as np

    from diffdock_pocket_tpu.data import chem
    from diffdock_pocket_tpu.data.conformer import (
        _distance_bounds, aligned_rmsd, dg_embed_conformer,
    )
    from diffdock_pocket_tpu.data.sdf import read_molecule

    mol = read_molecule("example_data/3dpf_ligand.sdf", remove_hs=True)

    # bounds validity: the crystal (a real conformer) is near-feasible
    L, U = _distance_bounds(mol)
    pos = mol.coords.astype(np.float64)
    iu, ju = np.triu_indices(mol.n_atoms, 1)
    d = np.linalg.norm(pos[iu] - pos[ju], axis=1)
    viol = np.maximum(0, d - U[iu, ju]) + np.maximum(0, L[iu, ju] - d)
    assert viol.max() < 0.5 and viol.sum() < 10.0

    emb = None
    for seed in range(6):  # stochastic embed: a failed try falls back
        emb = dg_embed_conformer(mol, np.random.default_rng(seed))
        if emb is not None:
            break
    assert emb is not None

    for b in mol.bonds:
        # the bounds apply aromatic/conjugation corrections on top of the
        # raw ideal_bond_length table -> compare to the bounds midpoint
        ideal = (L[b.a, b.b] + U[b.a, b.b]) / 2
        got = float(np.linalg.norm(emb.coords[b.a] - emb.coords[b.b]))
        assert abs(got - ideal) < 0.12, (b, got, ideal)

    # decorrelated from the crystal (ETKDG property the torsion-randomize
    # fallback only partially has)
    assert aligned_rmsd(emb.coords, mol.coords) > 1.5

    # chirality preserved (signed-volume hinge in the refinement)
    want, got = mol.chiral_tags(), emb.chiral_tags()
    tagged = [(a, b) for a, b in zip(want, got) if a != "CHI_UNSPECIFIED"]
    assert tagged and all(a == b for a, b in tagged)


def test_generate_conformer_tiers():
    """generate_conformer returns a decorrelated conformer of the same
    topology through whichever tier is available."""
    import numpy as np

    from diffdock_pocket_tpu.data.conformer import (
        aligned_rmsd, generate_conformer,
    )
    from diffdock_pocket_tpu.data.sdf import read_molecule

    mol = read_molecule("example_data/3dpf_ligand.sdf", remove_hs=True)
    conf = generate_conformer(mol, np.random.default_rng(0))
    assert conf.n_atoms == mol.n_atoms
    assert aligned_rmsd(conf.coords, mol.coords) > 1.0


def test_conformer_match_quality_floor(monkeypatch):
    """ROUND-4 REGRESSION GUARD: the matched training conformer must land
    well under 1 A of the crystal.  Round 4 measured 2.1-2.6 A matched
    conformers (pure-chemistry DG embeds as the tier-2 default) which put
    a hard ~2.3-2.9 A floor under held-out docking — training can never
    beat its own input-conformer error.  Reference bar: ETKDG + DE
    matching lands ~0.3-0.6 A (process_mols.py:467-512)."""
    import numpy as np

    from diffdock_pocket_tpu.data import conformer as C
    from diffdock_pocket_tpu.data.sdf import read_molecule

    mol = read_molecule("example_data/3dpf_ligand.sdf", remove_hs=True)
    matched, score = C.conformer_match_ligand(
        mol, rng=np.random.default_rng(0))
    assert score < 0.8, f"matched RMSD {score:.2f} A re-opens the round-4 floor"
    # the pre-match conformer must still be pose-decorrelated
    gen = C.generate_conformer(mol, np.random.default_rng(1))
    assert C.aligned_rmsd(gen.coords, mol.coords) > 1.0

    # gate fallback: an unmatchable generated conformer (angles smashed by
    # per-atom noise) must trigger the tier-4 fallback, not be used as-is
    def bad_gen(m, rng=None):
        noisy = m.coords + np.random.default_rng(2).normal(
            0, 0.6, m.coords.shape).astype(np.float32)
        return m.with_coords(noisy)

    monkeypatch.setattr(C, "generate_conformer", bad_gen)
    _, score2 = C.conformer_match_ligand(mol, rng=np.random.default_rng(0))
    assert score2 < C.MATCH_RMSD_GATE


def test_hybridization_rules():
    """Hybridization heuristic edge cases: carboxylate-like centers (two
    doubles, 3 neighbors) are SP2 not SP; cumulated doubles on a 2-neighbor
    center are SP; hypervalent penta/hexacoordination maps to SP3D/SP3D2."""
    import numpy as np

    from diffdock_pocket_tpu.data.mol import Bond, Molecule

    def hyb(symbols, bonds):
        n = len(symbols)
        coords = np.random.default_rng(0).standard_normal((n, 3)).astype(np.float32)
        return Molecule(symbols, coords, bonds).hybridizations()

    # carboxylate C: two C=O plus one C-C -> SP2
    h = hyb(["C", "O", "O", "C"], [Bond(0, 1, 2), Bond(0, 2, 2), Bond(0, 3, 1)])
    assert h[0] == "SP2"
    # allene-like center: two doubles, two neighbors -> SP
    h = hyb(["C", "C", "C"], [Bond(1, 0, 2), Bond(1, 2, 2)])
    assert h[1] == "SP"
    # nitrile C -> SP
    h = hyb(["C", "N", "C"], [Bond(0, 1, 3), Bond(0, 2, 1)])
    assert h[0] == "SP"
    # pentacoordinate P -> SP3D; hexacoordinate S -> SP3D2
    h = hyb(["P", "F", "F", "F", "F", "F"],
            [Bond(0, i, 1) for i in range(1, 6)])
    assert h[0] == "SP3D"
    h = hyb(["S", "F", "F", "F", "F", "F", "F"],
            [Bond(0, i, 1) for i in range(1, 7)])
    assert h[0] == "SP3D2"
    # plain sp3 carbon
    h = hyb(["C", "C"], [Bond(0, 1, 1)])
    assert h[0] == "SP3"


def test_conjugated_n_o_sp2():
    """Amide N / ester O adjacent to a carbonyl are SP2 (conjugation);
    amine N next to a saturated chain stays SP3."""
    import numpy as np

    from diffdock_pocket_tpu.data.mol import Bond, Molecule

    def hyb(symbols, bonds):
        coords = np.zeros((len(symbols), 3), np.float32)
        return Molecule(symbols, coords, bonds).hybridizations()

    # acetamide heavy atoms: C-C(=O)-N
    h = hyb(["C", "C", "O", "N"],
            [Bond(0, 1, 1), Bond(1, 2, 2), Bond(1, 3, 1)])
    assert h[1] == "SP2" and h[3] == "SP2"
    # methyl ester: the bridging O is conjugated
    h = hyb(["C", "C", "O", "O", "C"],
            [Bond(0, 1, 1), Bond(1, 2, 2), Bond(1, 3, 1), Bond(3, 4, 1)])
    assert h[3] == "SP2"
    # ethylamine N: saturated neighborhood -> SP3
    h = hyb(["C", "C", "N"], [Bond(0, 1, 1), Bond(1, 2, 1)])
    assert h[2] == "SP3"
