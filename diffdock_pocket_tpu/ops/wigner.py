"""Real-basis Wigner machinery derived *numerically from our own spherical
harmonics*, guaranteeing internal consistency of the equivariant algebra.

Why numeric: the tensor products need the invariant 3-tensor w3j(l1,l2,l3) in
the same real basis as ops/spherical.py.  Rather than porting tables, we
derive everything from first principles:

1. ``wigner_d(l, R)``: the (2l+1)x(2l+1) representation matrix defined by
   Y_l(R u) = D_l(R) Y_l(u), obtained by least squares over sampled unit
   vectors (exact up to fp64 rounding — Y_l spans the irrep).
2. so(3) generators J_a = d/dt D_l(exp(t e_a)) via central differences.
3. ``real_wigner_3j(l1, l2, l3)``: the (unique up to sign) unit-Frobenius
   tensor in the null space of the Kronecker-sum constraint
   (J1 (x) I (x) I + I (x) J2 (x) I + I (x) I (x) J3) w = 0,
   from the SVD of the stacked constraint matrix.

All of this is fp64 numpy at init time, cached in-process; l <= 4 tensors are
tiny.  Equivariance of every consumer is covered by tests.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from . import spherical


def _sh_np(l: int, u: np.ndarray) -> np.ndarray:
    """Evaluate our real SH in float64 numpy (mirrors ops/spherical.py)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        out = np.asarray(spherical.sh_single(l, u.astype(np.float32), normalize=False))
    return out.astype(np.float64)


def _sh_np64(l: int, u: np.ndarray) -> np.ndarray:
    """Float64 closed forms (duplicated minimal math for precision)."""
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    if l == 0:
        return np.ones(u.shape[:-1] + (1,))
    if l == 1:
        return np.sqrt(3.0) * u
    if l == 2:
        c15 = np.sqrt(15.0)
        return np.stack(
            [
                c15 * x * y,
                c15 * y * z,
                np.sqrt(5.0) / 2 * (3 * z * z - 1),
                c15 * x * z,
                c15 / 2 * (x * x - y * y),
            ],
            axis=-1,
        )
    if l == 3:
        x2, y2, z2 = x * x, y * y, z * z
        return np.stack(
            [
                np.sqrt(35.0 / 8) * y * (3 * x2 - y2),
                np.sqrt(105.0) * x * y * z,
                np.sqrt(21.0 / 8) * y * (5 * z2 - 1),
                np.sqrt(7.0) / 2 * z * (5 * z2 - 3),
                np.sqrt(21.0 / 8) * x * (5 * z2 - 1),
                np.sqrt(105.0) / 2 * z * (x2 - y2),
                np.sqrt(35.0 / 8) * x * (x2 - 3 * y2),
            ],
            axis=-1,
        )
    # l >= 4: generic numeric harmonic-polynomial basis (see _poly_basis)
    coeffs, monos = _poly_basis(l)
    vals = np.stack([u[..., 0] ** a * u[..., 1] ** b * u[..., 2] ** c
                     for a, b, c in monos], axis=-1)
    return vals @ coeffs.T


@lru_cache(maxsize=None)
def _poly_basis(l: int):
    """An orthonormal (component-normalized) real degree-l harmonic
    polynomial basis, derived numerically:

    - monomials x^a y^b z^c with a+b+c = l;
    - harmonic condition: null space of the Laplacian (exact integer matrix);
    - orthonormalized with the *exact* sphere-average monomial integrals
      <x^a y^b z^c> = (a-1)!! (b-1)!! (c-1)!! / (a+b+c+1)!! (even exponents),
      then scaled by sqrt(2l+1) for component normalization.

    Only used for l >= 4 (the dead-but-present high-l blocks of unweighted
    sh (x) 2e products in the sh_lmax=2 configuration); l <= 3 uses the fixed
    closed forms so the evaluation basis matches ops/spherical.py exactly.
    Returns (coeffs [2l+1, n_monomials], monomials [(a, b, c), ...]).
    """
    monos = [
        (a, b, l - a - b) for a in range(l + 1) for b in range(l - a + 1)
    ]
    n = len(monos)
    idx = {m: i for i, m in enumerate(monos)}
    # Laplacian: x^a y^b z^c -> a(a-1) x^(a-2).. + ...
    lower = [
        (a, b, l - 2 - a - b) for a in range(l - 1) for b in range(l - 1 - a + 1)
    ]
    lap = np.zeros((len(lower), n))
    lidx = {m: i for i, m in enumerate(lower)}
    for (a, b, c), j in idx.items():
        if a >= 2:
            lap[lidx[(a - 2, b, c)], j] += a * (a - 1)
        if b >= 2:
            lap[lidx[(a, b - 2, c)], j] += b * (b - 1)
        if c >= 2:
            lap[lidx[(a, b, c - 2)], j] += c * (c - 1)
    _, s, vt = np.linalg.svd(lap)
    null_dim = n - np.sum(s > 1e-9)
    assert null_dim == 2 * l + 1, (l, null_dim)
    basis = vt[int(np.sum(s > 1e-9)):]

    def dfact(k):
        out = 1
        while k > 1:
            out *= k
            k -= 2
        return out

    def sphere_avg(m1, m2):
        a = m1[0] + m2[0]
        b = m1[1] + m2[1]
        c = m1[2] + m2[2]
        if a % 2 or b % 2 or c % 2:
            return 0.0
        return dfact(a - 1) * dfact(b - 1) * dfact(c - 1) / dfact(a + b + c + 1)

    gram_mono = np.asarray(
        [[sphere_avg(m1, m2) for m2 in monos] for m1 in monos]
    )
    g = basis @ gram_mono @ basis.T
    # orthonormalize: basis' = L^-1 basis with g = L L^T
    L = np.linalg.cholesky(g)
    ortho = np.linalg.solve(L, basis)
    # orthonormal under the sphere-average inner product => by the addition
    # theorem sum_m Y_m^2 = 2l+1 pointwise (component normalization) already
    return ortho, monos


def _rot(axis: int, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(3)
    i, j = [(1, 2), (2, 0), (0, 1)][axis]
    m[i, i] = c
    m[j, j] = c
    m[i, j] = -s
    m[j, i] = s
    return m


def wigner_d(l: int, rot: np.ndarray) -> np.ndarray:
    """D_l(R) with Y_l(R u) = D_l(R) Y_l(u), via least squares (fp64)."""
    if l == 0:
        return np.ones((1, 1))
    rng = np.random.default_rng(12345)
    m = 4 * (2 * l + 1)
    u = rng.standard_normal((m, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    a = _sh_np64(l, u)  # [M, 2l+1]
    b = _sh_np64(l, u @ rot.T)  # [M, 2l+1]
    dt, *_ = np.linalg.lstsq(a, b, rcond=None)
    return dt.T


@lru_cache(maxsize=None)
def _generators(l: int) -> np.ndarray:
    """so(3) generators J_a (a = x, y, z) of the real irrep, [3, d, d]."""
    h = 1e-5
    gens = []
    for axis in range(3):
        dp = wigner_d(l, _rot(axis, h))
        dm = wigner_d(l, _rot(axis, -h))
        gens.append((dp - dm) / (2 * h))
    return np.stack(gens)


@lru_cache(maxsize=None)
def real_wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Unit-Frobenius invariant tensor [d1, d2, d3]; zero tensor if the
    triangle inequality fails."""
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((d1, d2, d3))
    if l1 == l2 == l3 == 0:
        return np.ones((1, 1, 1))
    j1, j2, j3 = _generators(l1), _generators(l2), _generators(l3)
    rows = []
    for a in range(3):
        k = (
            np.einsum("ij,kl,mn->ikmjln", j1[a], np.eye(d2), np.eye(d3))
            + np.einsum("ij,kl,mn->ikmjln", np.eye(d1), j2[a], np.eye(d3))
            + np.einsum("ij,kl,mn->ikmjln", np.eye(d1), np.eye(d2), j3[a])
        ).reshape(d1 * d2 * d3, d1 * d2 * d3)
        rows.append(k)
    constraint = np.concatenate(rows, axis=0)
    _, s, vt = np.linalg.svd(constraint)
    # null space must be exactly 1-dimensional for a valid triangle
    null = vt[-1]
    assert s[-1] < 1e-6, (l1, l2, l3, s[-5:])
    assert s[-2] > 1e-3, (l1, l2, l3, s[-5:])
    w = null.reshape(d1, d2, d3)
    # deterministic sign: first element with |.| > 10% of max is positive
    flat = w.reshape(-1)
    pivot = flat[np.argmax(np.abs(flat) > 0.1 * np.abs(flat).max())]
    # argmax over bool gives first True index
    first_idx = int(np.argmax(np.abs(flat) > 0.1 * np.abs(flat).max()))
    if flat[first_idx] < 0:
        w = -w
    return w / np.linalg.norm(w)
