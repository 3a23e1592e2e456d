"""Unit parity tests for the rotation/Kabsch core against scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_pocket_tpu import geometry


def random_rotvecs(n, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def test_axis_angle_to_matrix_matches_scipy():
    vecs = random_rotvecs(50)
    ours = np.asarray(geometry.axis_angle_to_matrix(jnp.asarray(vecs)))
    theirs = R.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_axis_angle_roundtrip():
    # rotation vectors are only unique up to the 2*pi ambiguity, so round-trip
    # through the *rotation* (vec -> matrix -> vec -> matrix)
    vecs = random_rotvecs(50, seed=1, scale=1.5)
    mats = geometry.axis_angle_to_matrix(jnp.asarray(vecs))
    back = geometry.matrix_to_axis_angle(mats)
    mats2 = geometry.axis_angle_to_matrix(back)
    np.testing.assert_allclose(np.asarray(mats2), np.asarray(mats), atol=1e-4)
    # and small vectors (|v| < pi) round-trip exactly
    small = random_rotvecs(50, seed=7, scale=0.5)
    back_small = np.asarray(
        geometry.matrix_to_axis_angle(geometry.axis_angle_to_matrix(jnp.asarray(small)))
    )
    np.testing.assert_allclose(back_small, small, atol=1e-4)


def test_axis_angle_identity_smooth():
    # zero rotation must map exactly to identity (and be differentiable there)
    mat = geometry.axis_angle_to_matrix(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(mat), np.eye(3), atol=1e-6)
    g = jax.jacobian(lambda v: geometry.axis_angle_to_matrix(v))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_matrix_to_quaternion_matches_scipy():
    vecs = random_rotvecs(100, seed=2)
    mats = R.from_rotvec(vecs).as_matrix().astype(np.float32)
    q_ours = np.asarray(geometry.matrix_to_quaternion(jnp.asarray(mats)))
    q_scipy = R.from_matrix(mats).as_quat()  # (x, y, z, w)
    q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    # quaternions are defined up to sign
    sign = np.sign(np.sum(q_ours * q_scipy, axis=1, keepdims=True))
    np.testing.assert_allclose(q_ours, q_scipy * sign, atol=1e-4)


def test_kabsch_recovers_rigid_transform():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((20, 3)).astype(np.float32)
    rot = R.from_rotvec([0.3, -0.7, 1.1]).as_matrix().astype(np.float32)
    t_true = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    b = a @ rot.T + t_true
    r, t = geometry.kabsch(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(r), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    aligned = np.asarray(a @ np.asarray(r).T + np.asarray(t))
    np.testing.assert_allclose(aligned, b, atol=1e-4)


def test_kabsch_masked_ignores_padding():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((10, 3)).astype(np.float32)
    rot = R.from_rotvec([0.2, 0.4, -0.1]).as_matrix().astype(np.float32)
    b = a @ rot.T + np.array([0.5, 0.5, 0.5], dtype=np.float32)
    # pad with garbage rows, mask them out
    a_pad = np.concatenate([a, rng.standard_normal((5, 3)).astype(np.float32) * 100])
    b_pad = np.concatenate([b, rng.standard_normal((5, 3)).astype(np.float32) * 100])
    w = np.concatenate([np.ones(10), np.zeros(5)]).astype(np.float32)
    r, t = geometry.kabsch(jnp.asarray(a_pad), jnp.asarray(b_pad), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), rot, atol=1e-4)


def test_kabsch_reflection_corrected():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((8, 3)).astype(np.float32)
    b = a.copy()
    b[:, 0] = -b[:, 0]  # mirrored
    r, _ = geometry.kabsch(jnp.asarray(a), jnp.asarray(b))
    assert np.linalg.det(np.asarray(r)) > 0.99


def test_uniform_rotation_is_rotation():
    mats = geometry.uniform_rotation(jax.random.PRNGKey(0), (16,))
    m = np.asarray(mats)
    np.testing.assert_allclose(
        m @ np.swapaxes(m, -1, -2), np.broadcast_to(np.eye(3), m.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_kabsch_vmaps():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((4, 12, 3)).astype(np.float32)
    b = rng.standard_normal((4, 12, 3)).astype(np.float32)
    r, t = jax.vmap(geometry.kabsch)(jnp.asarray(a), jnp.asarray(b))
    assert r.shape == (4, 3, 3) and t.shape == (4, 3)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-4)
