"""Tests for the evaluation metric suite (pure numpy, fast)."""
import numpy as np

from diffdock_pocket_tpu.data.mol import Bond, Molecule
from diffdock_pocket_tpu import evaluation as ev


def benzene_like():
    """A 6-ring of carbons with two identical substituents — has nontrivial
    automorphisms."""
    coords = []
    for i in range(6):
        a = np.pi / 3 * i
        coords.append([np.cos(a), np.sin(a), 0.0])
    bonds = [Bond(i, (i + 1) % 6, 4) for i in range(6)]
    return Molecule(["C"] * 6, np.asarray(coords, np.float32), bonds)


def test_symmetry_rmsd_ring_rotation():
    mol = benzene_like()
    true = mol.coords
    # rotate atom labels by one position: plain RMSD is large, symmetry RMSD 0
    perm = np.roll(np.arange(6), 1)
    pred = true[perm]
    assert ev.rmsd(pred, true) > 0.5
    assert ev.symmetry_rmsd(mol, pred, true) < 1e-5


def test_symmetry_rmsd_asymmetric_molecule():
    mol = Molecule(
        ["C", "N", "O"],
        np.asarray([[0, 0, 0], [1.5, 0, 0], [0, 1.5, 0]], np.float32),
        [Bond(0, 1, 1), Bond(0, 2, 1)],
    )
    pred = mol.coords + 1.0
    # no automorphism can help; symmetry rmsd == plain rmsd
    assert abs(ev.symmetry_rmsd(mol, pred, mol.coords) - ev.rmsd(pred, mol.coords)) < 1e-6


def test_steric_clash_pairs():
    pos_a = np.asarray([[0.0, 0, 0]])
    pos_b = np.asarray([[1.0, 0, 0], [4.0, 0, 0]])
    clashes = ev.steric_clash_pairs(pos_a, ["C"], pos_b, ["C", "C"])
    # r_C + r_C - 0.8 = 2.6: atom at 1.0 clashes, atom at 4.0 does not
    assert clashes[0, 0] and not clashes[0, 1]


def test_sidechain_rmsds():
    na = 10
    sc_mask = np.zeros((2, na), dtype=bool)
    sc_mask[0, 3:5] = True
    sc_mask[1, 7:9] = True
    res_idx = np.asarray([0, 1])
    true = np.random.default_rng(0).normal(size=(na, 3))
    pred = true.copy()
    pred[3:5] += 2.0
    per_res, overall = ev.sidechain_rmsds(pred, true, sc_mask, res_idx)
    assert len(per_res) == 2
    np.testing.assert_allclose(per_res[0], np.sqrt(12.0), atol=1e-5)
    np.testing.assert_allclose(per_res[1], 0.0, atol=1e-6)
    assert 0 < overall < per_res[0]


def test_topk_aggregates():
    per_complex = [
        np.asarray([1.0, 3.0, 0.5]),  # top1 hit
        np.asarray([4.0, 1.5, 9.0]),  # top1 miss, top5 hit
    ]
    s = ev.summarize_rmsds(per_complex)
    assert s["top1_rmsds_below_2"] == 0.5
    assert s["top5_rmsds_below_2"] == 1.0
    rate = ev.topk_rate(per_complex, 1, 2.0)
    assert rate == 0.5


def test_evaluate_files_sidechain_rmsd_not_diluted(tmp_path):
    """sc-RMSD of a frozen receptor with ONE moved side chain equals that
    side chain's own RMSD (the round-1 whole-receptor metric was diluted by
    the frozen atoms; reference evaluate_files.py:324-339 filters
    backbone/H and we additionally restrict to the flexible residues)."""
    import importlib.util
    import os as _os
    import sys as _sys

    import numpy as _np

    from diffdock_pocket_tpu.data.pdb import parse_pdb

    example = _os.path.join(_os.path.dirname(__file__), _os.pardir, "example_data")
    protein = _os.path.join(example, "3dpf_protein.pdb")
    if not _os.path.exists(protein):
        import pytest as _pytest

        _pytest.skip("3dpf example data not available")

    spec = importlib.util.spec_from_file_location(
        "evaluate_files_cli",
        _os.path.join(_os.path.dirname(__file__), _os.pardir, "evaluate_files.py"),
    )
    ef = importlib.util.module_from_spec(spec)
    _sys.modules["evaluate_files_cli"] = ef
    spec.loader.exec_module(ef)

    pred = parse_pdb(protein)
    pred.remove_hydrogens()
    # pick a residue with side-chain atoms and displace them by 2 A in x
    target = None
    for res in pred.get_residues():
        sc = [a for a in res.atoms if a.name not in ef.BACKBONE and a.element != "H"]
        if len(sc) >= 3:
            target = res
            break
    assert target is not None
    moved = 0
    for a in target.atoms:
        if a.name not in ef.BACKBONE and a.element != "H":
            a.coord = a.coord + _np.asarray([2.0, 0.0, 0.0], _np.float32)
            moved += 1

    flex_file = str(tmp_path / "flexible_residues.txt")
    with open(flex_file, "w") as fh:
        fh.write(f"{target.chain_id}:{target.seq}:{target.name}\n")

    r = ef.sidechain_rmsd(pred, protein, flex_file)
    # every selected atom moved exactly 2 A -> RMSD exactly 2
    assert abs(r - 2.0) < 1e-4

    # without the sidecar (all side-chain atoms) the metric IS diluted --
    # the regression this guards against
    r_all = ef.sidechain_rmsd(pred, protein, str(tmp_path / "missing.txt"))
    assert r_all < 0.5
