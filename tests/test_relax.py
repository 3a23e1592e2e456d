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
