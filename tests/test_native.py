"""Parity tests: native data-plane (fastpdb.cpp via ctypes) vs pure Python.

Skipped when no toolchain can build the library (the Python fallback is
always exercised by the other data-layer tests).
"""
import os
import time

import numpy as np
import pytest

from diffdock_pocket_tpu.data import native, pdb, sdf

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
PROTEIN = os.path.join(EXAMPLE, "3dpf_protein.pdb")
LIGAND = os.path.join(EXAMPLE, "3dpf_ligand.sdf")

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@pytest.mark.skipif(not os.path.exists(PROTEIN), reason="example data missing")
def test_native_pdb_parity():
    with open(PROTEIN) as fh:
        text = fh.read()
    fast = pdb._parse_pdb_native(text)
    os.environ["DDP_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        slow = pdb.parse_pdb(text)
    finally:
        del os.environ["DDP_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None
    fa = list(fast.get_atoms())
    sa = list(slow.get_atoms())
    assert len(fa) == len(sa)
    for a, b in zip(fa, sa):
        assert a.name == b.name
        assert a.element == b.element
        np.testing.assert_allclose(a.coord, b.coord, atol=1e-4)
    fres = [(r.chain_id, r.seq, r.name) for r in fast.get_residues()]
    sres = [(r.chain_id, r.seq, r.name) for r in slow.get_residues()]
    assert fres == sres


@pytest.mark.skipif(not os.path.exists(LIGAND), reason="example data missing")
def test_native_sdf_parity():
    with open(LIGAND) as fh:
        text = fh.read()
    out = native.parse_sdf_arrays(text)
    assert out is not None
    coords, symbols, bonds, charges = out
    mol = sdf.parse_sdf(text)
    assert len(symbols) == mol.n_atoms
    assert symbols == mol.symbols
    np.testing.assert_allclose(coords, mol.coords, atol=1e-4)
    assert len(bonds) == len(mol.bonds)
    for (a, b, t), bond in zip(bonds, mol.bonds):
        assert (a, b, t) == (bond.a, bond.b, bond.type)
    assert list(charges) == mol.charges


def test_native_min_dist_and_clash():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((40, 3)).astype(np.float32) * 5
    b = rng.standard_normal((60, 3)).astype(np.float32) * 5
    got = native.min_dist(a, b)
    ref = np.linalg.norm(a[:, None] - b[None, :], axis=-1).min(axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-4)

    ra = np.full(40, 1.5, np.float32)
    rb = np.full(60, 1.5, np.float32)
    got_c = native.clash_count(a, ra, b, rb)
    ref_c = int(
        (np.linalg.norm(a[:, None] - b[None, :], axis=-1) < ra[:, None] + rb[None, :]).sum()
    )
    assert got_c == ref_c


@pytest.mark.skipif(not os.path.exists(PROTEIN), reason="example data missing")
def test_native_array_parse_speedup():
    """The array-level parse (the designed bulk-pipeline fast path) must be
    several times faster than the pure-Python parser; the object-assembly
    wrapper is only required to be not slower."""
    with open(PROTEIN) as fh:
        text = fh.read()
    t0 = time.time()
    for _ in range(10):
        native.parse_pdb_arrays(text)
    arr_t = (time.time() - t0) / 10
    os.environ["DDP_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        t0 = time.time()
        pdb.parse_pdb(text)
        slow_t = time.time() - t0
    finally:
        del os.environ["DDP_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None
    assert arr_t * 3 < slow_t, (arr_t, slow_t)
