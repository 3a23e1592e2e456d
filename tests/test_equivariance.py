"""Equivariance and consistency tests for the irreps/SH/tensor-product core.

Equivariance under rotation is the ground-truth oracle for this layer stack:
it validates the spherical harmonics, the derived Wigner matrices/3j tensors,
and both tensor-product implementations, independently of e3nn.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_pocket_tpu.ops import spherical, wigner
from diffdock_pocket_tpu.ops.irreps import Irrep, Irreps, sh_irreps, feature_ladder
from diffdock_pocket_tpu.ops.tensor_product import (
    FasterTensorProduct,
    FullTensorProduct,
    FullyConnectedTensorProduct,
)


def random_rot(seed=0):
    return R.random(random_state=seed).as_matrix().astype(np.float32)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_sh_component_normalization(l):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((64, 3)).astype(np.float32)
    y = np.asarray(spherical.sh_single(l, jnp.asarray(v)))
    np.testing.assert_allclose(np.sum(y * y, axis=-1), 2 * l + 1, rtol=1e-4)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_sh_equivariance(l):
    rot = random_rot(l)
    d = wigner.wigner_d(l, rot.astype(np.float64))
    rng = np.random.default_rng(1)
    v = rng.standard_normal((32, 3)).astype(np.float32)
    lhs = np.asarray(spherical.sh_single(l, jnp.asarray(v @ rot.T)))
    rhs = np.asarray(spherical.sh_single(l, jnp.asarray(v))) @ d.T
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_wigner_d_orthogonal(l):
    rot = random_rot(l + 10)
    d = wigner.wigner_d(l, rot.astype(np.float64))
    np.testing.assert_allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-6)


@pytest.mark.parametrize("lll", [(1, 1, 0), (1, 1, 1), (1, 2, 1), (1, 2, 3), (2, 2, 2), (0, 2, 2)])
def test_w3j_invariance(lll):
    l1, l2, l3 = lll
    w = wigner.real_wigner_3j(l1, l2, l3)
    rot = random_rot(7).astype(np.float64)
    d1, d2, d3 = (wigner.wigner_d(l, rot) for l in lll)
    rotated = np.einsum("abc,ia,jb,kc->ijk", w, d1, d2, d3)
    np.testing.assert_allclose(rotated, w, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(w), 1.0, atol=1e-6)


def test_w3j_110_and_111_closed_forms():
    w = wigner.real_wigner_3j(1, 1, 0)
    np.testing.assert_allclose(w[..., 0], np.eye(3) / math.sqrt(3), atol=1e-8)
    w = wigner.real_wigner_3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k] = 1
        eps[j, i, k] = -1
    np.testing.assert_allclose(w, eps / math.sqrt(6), atol=1e-8)


def _rotate_features(x, irreps: Irreps, rot):
    """Apply the block-diagonal rotation action to concatenated features."""
    out = np.zeros_like(x)
    for (mul, ir), sl in zip(irreps, irreps.slices()):
        d = wigner.wigner_d(ir.l, rot.astype(np.float64)).astype(np.float32)
        blk = x[..., sl].reshape(x.shape[:-1] + (mul, ir.dim))
        out[..., sl] = (blk @ d.T).reshape(x.shape[:-1] + (mul * ir.dim,))
    return out


@pytest.mark.parametrize("layer", [0, 1, 2, 3])
def test_faster_tp_equivariance(layer):
    ladder = feature_ladder(8, 3, use_second_order=False)
    in_ir = ladder[layer]
    out_ir = ladder[min(layer + 1, 3)]
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    rng = np.random.default_rng(layer)
    E = 10
    x = rng.standard_normal((E, in_ir.dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)

    rot = random_rot(layer + 20)
    out = np.asarray(tp(jnp.asarray(x), jnp.asarray(sh), jnp.asarray(w)))
    sh_rot = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec @ rot.T)))
    out_rot_inputs = np.asarray(
        tp(jnp.asarray(_rotate_features(x, in_ir, rot)), jnp.asarray(sh_rot), jnp.asarray(w))
    )
    np.testing.assert_allclose(
        out_rot_inputs, _rotate_features(out, out_ir, rot), atol=2e-4
    )


def test_faster_tp_matches_generic():
    """For the lmax=1 ladder the fast path and the CG path must agree with the
    same weight vector (the layouts are constructed to coincide)."""
    ladder = feature_ladder(6, 2, use_second_order=False)
    in_ir, out_ir = ladder[2], ladder[3]
    fast = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    generic = FullyConnectedTensorProduct(in_ir, sh_irreps(1), out_ir)
    assert fast.weight_numel == generic.weight_numel
    rng = np.random.default_rng(3)
    E = 7
    x = rng.standard_normal((E, in_ir.dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
    w = rng.standard_normal((E, fast.weight_numel)).astype(np.float32)
    a = np.asarray(fast(jnp.asarray(x), jnp.asarray(sh), jnp.asarray(w)))
    b = np.asarray(generic(jnp.asarray(x), jnp.asarray(sh), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_generic_tp_equivariance_lmax2():
    in_ir = Irreps.parse("4x0e + 2x1o + 2x2e")
    out_ir = Irreps.parse("4x0e + 2x1o + 2x2e + 2x1e")
    tp = FullyConnectedTensorProduct(in_ir, sh_irreps(2), out_ir)
    rng = np.random.default_rng(4)
    E = 6
    x = rng.standard_normal((E, in_ir.dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(2, jnp.asarray(vec)))
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)
    rot = random_rot(40)
    out = np.asarray(tp(jnp.asarray(x), jnp.asarray(sh), jnp.asarray(w)))
    sh_rot = np.asarray(spherical.sh_ladder(2, jnp.asarray(vec @ rot.T)))
    out2 = np.asarray(
        tp(jnp.asarray(_rotate_features(x, in_ir, rot)), jnp.asarray(sh_rot), jnp.asarray(w))
    )
    np.testing.assert_allclose(out2, _rotate_features(out, out_ir, rot), atol=3e-4)


def test_full_tensor_product_torsion_head_composition():
    """sh(lmax=1) (x) 2e — the torsion-head sh composition
    (reference: models/score_model.py:302, 457-458)."""
    ftp = FullTensorProduct(sh_irreps(1), "1x2e")
    # expected output content: 0e(x)2e -> 2e ; 1o(x)2e -> 1o+2o+3o
    out_strs = sorted(str(ir) for _, ir in ftp.irreps_out)
    assert out_strs == sorted(["2e", "1o", "2o", "3o"])

    rng = np.random.default_rng(5)
    E = 8
    v1 = rng.standard_normal((E, 3)).astype(np.float32)
    v2 = rng.standard_normal((E, 3)).astype(np.float32)
    sh1 = np.asarray(spherical.sh_ladder(1, jnp.asarray(v1)))
    sh2 = np.asarray(spherical.sh_single(2, jnp.asarray(v2)))
    out = np.asarray(ftp(jnp.asarray(sh1), jnp.asarray(sh2)))

    rot = random_rot(50)
    sh1r = np.asarray(spherical.sh_ladder(1, jnp.asarray(v1 @ rot.T)))
    sh2r = np.asarray(spherical.sh_single(2, jnp.asarray(v2 @ rot.T)))
    out_r = np.asarray(ftp(jnp.asarray(sh1r), jnp.asarray(sh2r)))
    np.testing.assert_allclose(
        out_r, _rotate_features(out, ftp.irreps_out, rot), atol=2e-4
    )


def test_scalar_output_tp_is_invariant():
    """The torsion bond conv maps ladder (x) (sh(1)(x)2e) -> scalars; scalar
    outputs must be rotation-invariant."""
    ladder = feature_ladder(6, 2, use_second_order=False)
    in_ir = ladder[3]
    ftp = FullTensorProduct(sh_irreps(1), "1x2e")
    tp = FullyConnectedTensorProduct(in_ir, ftp.irreps_out, "6x0o + 6x0e")
    assert tp.weight_numel > 0
    rng = np.random.default_rng(6)
    E = 5
    x = rng.standard_normal((E, in_ir.dim)).astype(np.float32)
    v1 = rng.standard_normal((E, 3)).astype(np.float32)
    v2 = rng.standard_normal((E, 3)).astype(np.float32)
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)

    def run(rot):
        sh1 = spherical.sh_ladder(1, jnp.asarray(v1 @ rot.T))
        sh2 = spherical.sh_single(2, jnp.asarray(v2 @ rot.T))
        shc = ftp(sh1, sh2)
        xr = _rotate_features(x, in_ir, rot)
        return np.asarray(tp(jnp.asarray(xr), shc, jnp.asarray(w)))

    out_id = run(np.eye(3, dtype=np.float32))
    out_rot = run(random_rot(60))
    np.testing.assert_allclose(out_rot, out_id, atol=2e-4)
