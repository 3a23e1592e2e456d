"""Real spherical harmonics up to l=3, 'component' normalization, closed form.

Replaces e3nn's ``o3.spherical_harmonics`` calls in every edge builder of the
reference models (e.g. models/score_model.py:508, all_atom_score_model.py:481).

Conventions (documented, self-consistent):
- basis order within l: our own fixed order, listed below.  This differs from
  e3nn's (y, z, x)-style ordering by a fixed orthogonal permutation, which is
  irrelevant for a model trained from scratch — the function class is
  identical and all equivariance tests operate through these same functions.
- 'component' normalization: on unit vectors, sum_m Y_lm^2 = 2l + 1
  (i.e. sqrt(4*pi) times the orthonormal real harmonics).

Everything is branch-free jnp, safe inside jit/vmap, with a zero-vector guard
(normalize maps 0 to 0, so degenerate edges contribute nothing).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def _normalize(vec: Array) -> Array:
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.maximum(n, 1e-12)


def sh_l1(u: Array) -> Array:
    """l=1: sqrt(3) * (x, y, z)."""
    return math.sqrt(3.0) * u


def sh_l2(u: Array) -> Array:
    """l=2 components (component norm):
    [sqrt(15) xy, sqrt(15) yz, sqrt(5)/2 (3z^2 - 1), sqrt(15) xz,
     sqrt(15)/2 (x^2 - y^2)]."""
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    c15 = math.sqrt(15.0)
    return jnp.stack(
        [
            c15 * x * y,
            c15 * y * z,
            math.sqrt(5.0) / 2.0 * (3 * z * z - 1.0),
            c15 * x * z,
            c15 / 2.0 * (x * x - y * y),
        ],
        axis=-1,
    )


def sh_l3(u: Array) -> Array:
    """l=3 components (component norm), standard real harmonics * sqrt(4 pi):
    order m = -3..3 in the real convention."""
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    return jnp.stack(
        [
            math.sqrt(35.0 / 8.0) * y * (3 * x2 - y2),
            math.sqrt(105.0) * x * y * z,
            math.sqrt(21.0 / 8.0) * y * (5 * z2 - 1.0),
            math.sqrt(7.0) / 2.0 * z * (5 * z2 - 3.0),
            math.sqrt(21.0 / 8.0) * x * (5 * z2 - 1.0),
            math.sqrt(105.0) / 2.0 * z * (x2 - y2),
            math.sqrt(35.0 / 8.0) * x * (x2 - 3 * y2),
        ],
        axis=-1,
    )


_SH_FNS = {1: sh_l1, 2: sh_l2, 3: sh_l3}


def sh_single(l: int, vec: Array, normalize: bool = True) -> Array:
    """Single-l real spherical harmonics, (..., 3) -> (..., 2l+1)."""
    u = _normalize(vec) if normalize else vec
    if l == 0:
        return jnp.ones(vec.shape[:-1] + (1,), dtype=vec.dtype)
    return _SH_FNS[l](u)


def sh_ladder(lmax: int, vec: Array, normalize: bool = True) -> Array:
    """Concatenated harmonics l = 0..lmax, (..., 3) -> (..., (lmax+1)^2)."""
    u = _normalize(vec) if normalize else vec
    parts = [jnp.ones(vec.shape[:-1] + (1,), dtype=vec.dtype)]
    for l in range(1, lmax + 1):
        parts.append(_SH_FNS[l](u))
    return jnp.concatenate(parts, axis=-1)
