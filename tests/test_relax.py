"""Tests for the TPU-native clash-relief relaxation."""
import jax.numpy as jnp
import numpy as np

from diffdock_pocket_tpu.relax import ClashRelaxConfig, clash_relax


def test_clash_relax_reduces_overlap_and_preserves_bonds():
    # a 3-atom rigid ligand shoved into a receptor atom
    lig = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    rec = jnp.asarray([[0.5, 0.0, 0.0], [8.0, 8.0, 8.0]])
    lig_mask = jnp.ones(3, bool)
    rec_mask = jnp.ones(2, bool)
    radii_l = jnp.full((3,), 1.7)
    radii_r = jnp.full((2,), 1.7)
    tor_idx = jnp.zeros((0, 2), jnp.int32)
    tor_mask = jnp.zeros((0, 3), bool)
    tor_bmask = jnp.zeros((0,), bool)

    relaxed, e0, e1 = clash_relax(
        lig, lig_mask, radii_l, rec, rec_mask, radii_r,
        tor_idx, tor_mask, tor_bmask,
        ClashRelaxConfig(steps=150, lr=0.05, restraint=0.01),
    )
    assert float(e1) < float(e0)  # overlap reduced
    # rigid motion: pairwise distances preserved
    def dists(p):
        return np.linalg.norm(np.asarray(p)[:, None] - np.asarray(p)[None, :], axis=-1)

    np.testing.assert_allclose(dists(relaxed), dists(lig), atol=1e-3)
    # and the pose moved away from the clashing receptor atom
    d_before = np.linalg.norm(np.asarray(lig)[0] - np.asarray(rec)[0])
    d_after = np.linalg.norm(np.asarray(relaxed)[0] - np.asarray(rec)[0])
    assert d_after > d_before


def test_clash_relax_no_clash_is_stable():
    lig = jnp.asarray([[10.0, 0, 0], [11.5, 0, 0]])
    rec = jnp.asarray([[0.0, 0.0, 0.0]])
    relaxed, e0, e1 = clash_relax(
        lig, jnp.ones(2, bool), jnp.full((2,), 1.7),
        rec, jnp.ones(1, bool), jnp.full((1,), 1.7),
        jnp.zeros((0, 2), jnp.int32), jnp.zeros((0, 2), bool), jnp.zeros((0,), bool),
        ClashRelaxConfig(steps=50),
    )
    assert float(e0) < 1e-6
    np.testing.assert_allclose(np.asarray(relaxed), np.asarray(lig), atol=1e-2)


def test_relax_rank1_cli_path_reduces_clashes(tmp_path):
    """The inference CLI's --relax hook on a deliberately clashed pose:
    rank1_relaxed.sdf is written and the receptor-ligand clash count drops
    (reference inference.py:248 + posebusters_em.py:147-213)."""
    import importlib.util
    import os
    import sys
    import types

    import jax

    from diffdock_pocket_tpu import evaluation, pipeline
    from diffdock_pocket_tpu.data import featurize

    example = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
    protein = os.path.join(example, "3dpf_protein.pdb")
    ligand = os.path.join(example, "3dpf_ligand.sdf")
    if not os.path.exists(protein):
        import pytest

        pytest.skip("3dpf example data not available")

    spec = importlib.util.spec_from_file_location(
        "inference_cli2",
        os.path.join(os.path.dirname(__file__), os.pardir, "inference.py"),
    )
    inf = importlib.util.module_from_spec(spec)
    sys.modules["inference_cli2"] = inf
    spec.loader.exec_module(inf)

    data = featurize.build_complex(ligand, protein, featurize.DataConfig(),
                                   name="3dpf")
    nl = len(data.raw["lig_pos"])
    na = len(data.raw["atom_pos"])
    # shove the crystal pose onto the nearest receptor atoms -> clashes
    lig = data.raw["lig_pos"].copy()
    target = data.raw["atom_pos"][0]
    lig = lig - lig.mean(0) + target
    elements = evaluation.elements_from_atom_feat(data.raw["atom_feat"])
    before = evaluation.rec_lig_clashes(
        data.raw["atom_pos"], elements, lig, list(data.ligand.symbols))
    assert before > 0

    result = pipeline.DockingResult(
        name="3dpf",
        lig_pos=lig[None], atom_pos=data.raw["atom_pos"][None],
        confidence=None, center=data.raw["original_center"],
        lig_mask=np.ones(nl, bool), atom_mask=np.ones(na, bool),
    )
    out = str(tmp_path)
    args = types.SimpleNamespace(relax=True)
    inf._relax_rank1(args, data, result, out, None)
    assert os.path.exists(os.path.join(out, "rank1_relaxed.sdf"))

    from diffdock_pocket_tpu.data import sdf as sdfio

    relaxed = sdfio.read_molecule(os.path.join(out, "rank1_relaxed.sdf"),
                                  remove_hs=True)
    after = evaluation.rec_lig_clashes(
        data.raw["atom_pos"], elements,
        relaxed.coords - data.raw["original_center"],
        list(data.ligand.symbols))
    assert after < before
