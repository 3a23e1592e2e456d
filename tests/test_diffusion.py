"""Tests for schedules and the on-device conformer/torsion update machinery.

The torsion-apply oracle is an independent numpy re-implementation of the
sequential bond-rotation semantics (scipy rotations), mirroring the reference
behaviour (utils/torsion.py:68-94) without sharing code.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from diffdock_pocket_tpu import diffusion


def numpy_apply_torsions(pos, bond_index, rotate_mask, updates):
    pos = pos.copy()
    for i, (u, v) in enumerate(bond_index):
        if updates[i] == 0:
            continue
        axis = pos[u] - pos[v]
        rot_vec = axis * updates[i] / np.linalg.norm(axis)
        rot = R.from_rotvec(rot_vec).as_matrix()
        sel = rotate_mask[i]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def make_chain(n=8, seed=0):
    """A linear chain molecule: bonds (i, i+1), torsion bonds rotate the tail."""
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.standard_normal((n, 3)).astype(np.float32), axis=0)
    bonds = []
    masks = []
    for i in range(1, n - 2):
        bonds.append((i, i + 1))
        m = np.zeros(n, dtype=bool)
        m[i + 2 :] = True  # rotate everything beyond the bond, v-side
        masks.append(m)
    return pos, np.asarray(bonds, dtype=np.int32), np.asarray(masks)


def test_t_to_sigma_endpoints():
    cfg = diffusion.SigmaConfig()
    trs, rots, tors, scs = cfg.t_to_sigma(0.0, 0.0, 0.0, 0.0)
    assert np.isclose(trs, cfg.tr_sigma_min)
    trs, rots, tors, scs = cfg.t_to_sigma(1.0, 1.0, 1.0, 1.0)
    assert np.isclose(trs, cfg.tr_sigma_max)
    assert np.isclose(rots, cfg.rot_sigma_max)


def test_t_schedule_expbeta_uniform_case():
    sched = diffusion.get_t_schedule("expbeta", 20)
    # alpha=beta=1 => Beta is uniform => schedule is linear from 1 to 1/20
    assert sched.shape == (20,)
    np.testing.assert_allclose(sched, np.linspace(1, 0, 21)[:-1], atol=1e-6)


def test_sinusoidal_embedding_shape_and_range():
    emb = diffusion.sinusoidal_embedding(jnp.asarray([0.0, 0.5, 1.0]), 32, scale=10000)
    assert emb.shape == (3, 32)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)


def test_apply_torsion_matches_numpy_oracle():
    pos, bonds, masks = make_chain(10, seed=1)
    updates = np.asarray([0.3, -1.2, 0.7, 2.1, -0.4, 0.0, 1.0], dtype=np.float32)[
        : len(bonds)
    ]
    expected = numpy_apply_torsions(pos, bonds, masks, updates)
    got = diffusion.apply_torsion_updates(
        jnp.asarray(pos), jnp.asarray(bonds), jnp.asarray(masks), jnp.asarray(updates)
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_apply_torsion_sequential_semantics_any_order():
    """Each bond rotation is taken about the *current* bond axis (sequential
    in-place semantics).  Verify parity with the oracle under both bond
    orderings — torsions are internal coordinates, so the final conformer
    must agree with the oracle run in the same order."""
    pos, bonds, masks = make_chain(10, seed=2)
    updates = np.asarray([1.0] * len(bonds), dtype=np.float32)
    for b, m, u in [
        (bonds, masks, updates),
        (bonds[::-1].copy(), masks[::-1].copy(), updates),
    ]:
        expected = numpy_apply_torsions(pos, b, m, u)
        got = diffusion.apply_torsion_updates(
            jnp.asarray(pos), jnp.asarray(b), jnp.asarray(m), jnp.asarray(u)
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_apply_torsion_padded_bonds_are_identity():
    pos, bonds, masks = make_chain(8, seed=3)
    T_pad = len(bonds) + 4
    bonds_p = np.zeros((T_pad, 2), dtype=np.int32)
    bonds_p[: len(bonds)] = bonds
    masks_p = np.zeros((T_pad, len(pos)), dtype=bool)
    masks_p[: len(bonds)] = masks
    bond_mask = np.arange(T_pad) < len(bonds)
    updates = np.full((T_pad,), 0.5, dtype=np.float32)

    expected = numpy_apply_torsions(pos, bonds, masks, updates[: len(bonds)])
    got = diffusion.apply_torsion_updates(
        jnp.asarray(pos),
        jnp.asarray(bonds_p),
        jnp.asarray(masks_p),
        jnp.asarray(updates),
        jnp.asarray(bond_mask),
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_modify_conformer_rigid_only():
    pos, bonds, masks = make_chain(8, seed=4)
    lig_mask = np.ones(len(pos), dtype=bool)
    tr = np.asarray([1.0, 0.0, -1.0], dtype=np.float32)
    rotv = np.asarray([0.0, 0.5, 0.0], dtype=np.float32)
    out = diffusion.modify_conformer(
        jnp.asarray(pos),
        jnp.asarray(lig_mask),
        jnp.asarray(tr),
        jnp.asarray(rotv),
        jnp.asarray(bonds),
        jnp.asarray(masks),
        jnp.zeros(len(bonds)),
        jnp.zeros(len(bonds), dtype=bool),  # no real torsion bonds
        with_torsion=True,
    )
    center = pos.mean(0)
    rot = R.from_rotvec(rotv).as_matrix()
    expected = (pos - center) @ rot.T + tr + center
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_modify_conformer_torsion_is_realigned():
    """After a pure-torsion update the Kabsch realign means the result is as
    close as possible (in RMSD) to the rigid conformer — and the centroid
    matches (no net translation leaks from the torsion update)."""
    pos, bonds, masks = make_chain(10, seed=5)
    lig_mask = np.ones(len(pos), dtype=bool)
    updates = np.full(len(bonds), 0.8, dtype=np.float32)
    out = diffusion.modify_conformer(
        jnp.asarray(pos),
        jnp.asarray(lig_mask),
        jnp.zeros(3),
        jnp.zeros(3),
        jnp.asarray(bonds),
        jnp.asarray(masks),
        jnp.asarray(updates),
        jnp.ones(len(bonds), dtype=bool),
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out.mean(0), pos.mean(0), atol=1e-4)


def test_modify_conformer_jits_and_vmaps():
    pos, bonds, masks = make_chain(10, seed=6)
    S = 5
    poses = np.broadcast_to(pos, (S,) + pos.shape).copy()
    f = jax.jit(
        jax.vmap(
            lambda p, tr, rot, tor: diffusion.modify_conformer(
                p,
                jnp.ones(len(pos), dtype=bool),
                tr,
                rot,
                jnp.asarray(bonds),
                jnp.asarray(masks),
                tor,
                jnp.ones(len(bonds), dtype=bool),
            )
        )
    )
    key = jax.random.PRNGKey(0)
    trs = jax.random.normal(key, (S, 3))
    rots = jax.random.normal(key, (S, 3)) * 0.1
    tors = jax.random.normal(key, (S, len(bonds)))
    out = f(jnp.asarray(poses), trs, rots, tors)
    assert out.shape == (S, len(pos), 3)
    assert np.all(np.isfinite(np.asarray(out)))
