"""Precomputed diffusion lookup tables (IGSO(3) and wrapped-normal torus).

Capability parity with the reference table modules (reference: utils/so3.py
and utils/torus.py — truncated-series densities cached to .npy at import
time).  TPU-native redesign:

- table *generation* is vectorized numpy (one matmul over the Legendre-series
  axis instead of a 2000-iteration Python loop) and cached to an .npz file;
- table *lookup* is pure jnp on HBM-resident arrays, so ``sample``/``score``/
  ``score_norm`` can be called inside ``jit``/``vmap``/``lax.scan`` — this
  removes the per-forward CPU round trips of the reference
  (all_atom_score_model.py:384,407,433 call .cpu() every step).

Grids match the reference exactly (so3: 1000 eps x 2000 omega, L=2000 series;
torus: 5000 x 5000 log grids, +-100 image sum) so numerical behaviour is
comparable.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ---------------------------------------------------------------------------
# Cache location
# ---------------------------------------------------------------------------

def _cache_dir() -> str:
    d = os.environ.get(
        "DDP_TPU_CACHE", os.path.join(os.path.dirname(__file__), os.pardir, ".cache")
    )
    d = os.path.abspath(os.path.join(d, "tables"))
    os.makedirs(d, exist_ok=True)
    return d


# ---------------------------------------------------------------------------
# SO(3) — IGSO(3) density / score / sampling tables
# ---------------------------------------------------------------------------

SO3_MIN_EPS, SO3_MAX_EPS, SO3_N_EPS = 0.01, 2.0, 1000
SO3_X_N = 2000
_SO3_L = 2000


def _so3_build_tables() -> dict[str, np.ndarray]:
    """Truncated IGSO(3) series on the (eps, omega) grid, vectorized.

    f(omega; eps) = sum_l (2l+1) exp(-l(l+1) eps^2) sin((l+1/2) omega)/sin(omega/2)
    computed as one [N_EPS, L] @ [L, X_N] matmul; its omega-derivative series
    likewise.  Equivalent math to reference utils/so3.py:16-38 (_expansion,
    _density, _score) but O(seconds) instead of O(minutes).
    """
    eps = 10 ** np.linspace(np.log10(SO3_MIN_EPS), np.log10(SO3_MAX_EPS), SO3_N_EPS)
    omega = np.linspace(0, np.pi, SO3_X_N + 1)[1:]

    ls = np.arange(_SO3_L, dtype=np.float64)
    # coefficient matrix over (eps, l); underflows to 0 for large l — fine.
    with np.errstate(under="ignore"):
        coeff = (2 * ls + 1) * np.exp(-ls * (ls + 1) * (eps[:, None] ** 2))

    lo = np.sin(omega / 2)
    hi = np.sin(np.outer(ls + 0.5, omega))  # [L, X]
    dhi = (ls[:, None] + 0.5) * np.cos(np.outer(ls + 0.5, omega))
    dlo = 0.5 * np.cos(omega / 2)

    exp_vals = coeff @ (hi / lo)  # [N_EPS, X]
    dexp_vals = coeff @ ((lo * dhi - hi * dlo) / lo**2)

    pdf = exp_vals * (1 - np.cos(omega)) / np.pi
    cdf = np.cumsum(pdf, axis=1) / SO3_X_N * np.pi
    score = dexp_vals / exp_vals
    exp_score_norms = np.sqrt(
        np.sum(score**2 * pdf, axis=1) / np.sum(pdf, axis=1) / np.pi
    )
    return {
        "omegas": omega.astype(np.float32),
        "cdf": cdf.astype(np.float32),
        "score": score.astype(np.float32),
        "exp_score_norms": exp_score_norms.astype(np.float32),
    }


@dataclass(frozen=True)
class SO3Tables:
    """IGSO(3) tables as device arrays (HBM-resident, indexed inside jit)."""

    omegas: Array  # [X_N]
    cdf: Array  # [N_EPS, X_N] inverse-sampling CDF per eps row
    score: Array  # [N_EPS, X_N] d/domega log p
    exp_score_norms: Array  # [N_EPS] E[|score|^2]^(1/2)

    @staticmethod
    def load() -> "SO3Tables":
        path = os.path.join(_cache_dir(), "so3_tables_v1.npz")
        if os.path.exists(path):
            raw = np.load(path)
            raw = {k: raw[k] for k in raw.files}
        else:
            raw = _so3_build_tables()
            np.savez(path, **raw)
        return SO3Tables(**{k: jnp.asarray(v) for k, v in raw.items()})

    # -- lookups (all jit/vmap-safe) ------------------------------------

    def eps_index(self, eps: Array) -> Array:
        idx = (
            (jnp.log10(eps) - np.log10(SO3_MIN_EPS))
            / (np.log10(SO3_MAX_EPS) - np.log10(SO3_MIN_EPS))
            * SO3_N_EPS
        )
        return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, SO3_N_EPS - 1)

    def _omega_lerp(self, row: Array, om: Array) -> Array:
        """Linear interp of a per-eps table row at angle(s) om (uniform grid)."""
        delta = np.pi / SO3_X_N
        x = (om - delta) / delta  # omegas[0] == delta
        x = jnp.clip(x, 0.0, SO3_X_N - 1.000001)
        i0 = jnp.floor(x).astype(jnp.int32)
        frac = x - i0
        return row[i0] * (1 - frac) + row[i0 + 1] * frac

    def sample(self, key: jax.Array, eps: Array) -> Array:
        """Sample rotation angle omega ~ IGSO3(eps) by inverse-CDF (per element)."""
        eps = jnp.asarray(eps)
        idx = self.eps_index(eps)
        u = jax.random.uniform(key, eps.shape)
        cdf_rows = self.cdf[idx]  # (..., X_N)

        def _interp(u_i, cdf_row):
            return jnp.interp(u_i, cdf_row, self.omegas)

        flat_u = u.reshape(-1)
        flat_rows = cdf_rows.reshape(-1, SO3_X_N)
        out = jax.vmap(_interp)(flat_u, flat_rows)
        return out.reshape(eps.shape)

    def sample_vec(self, key: jax.Array, eps: Array) -> Array:
        """Sample rotation vector(s): uniform axis scaled by IGSO3 angle.

        eps shape (...) -> output shape (..., 3).
        """
        k1, k2 = jax.random.split(key)
        eps = jnp.asarray(eps)
        axis = jax.random.normal(k1, eps.shape + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        omega = self.sample(k2, eps)
        return axis * omega[..., None]

    def score_vec(self, eps: Array, vec: Array) -> Array:
        """Score of IGSO3 density at rotation vector(s) (..., 3).

        ``eps`` broadcasts against the batch shape of ``vec``."""
        om = jnp.linalg.norm(vec, axis=-1)
        eps_b = jnp.broadcast_to(jnp.asarray(eps), om.shape)
        idx = self.eps_index(eps_b)
        rows = self.score[idx]  # (..., X_N)

        def _one(row, om_i):
            return self._omega_lerp(row, om_i)

        flat = jax.vmap(_one)(rows.reshape(-1, SO3_X_N), om.reshape(-1))
        mag = flat.reshape(om.shape)
        return mag[..., None] * vec / jnp.maximum(om[..., None], 1e-12)

    def score_norm(self, eps: Array) -> Array:
        """Expected score magnitude, used for loss normalization and the
        rot-head output scaling (reference: utils/so3.py:84-89)."""
        return self.exp_score_norms[self.eps_index(jnp.asarray(eps))]


# ---------------------------------------------------------------------------
# Torus — wrapped normal density / score tables
# ---------------------------------------------------------------------------

TORUS_X_MIN, TORUS_X_N = 1e-5, 5000  # relative to pi
TORUS_SIGMA_MIN, TORUS_SIGMA_MAX, TORUS_SIGMA_N = 3e-3, 2.0, 5000  # relative to pi
_TORUS_IMAGE_N = 100


def _torus_build_tables() -> dict[str, np.ndarray]:
    """Wrapped-normal p(x; sigma) and d/dx log p on log-log grids.

    Math parity with reference utils/torus.py:11-38 (image sum over +-100
    periodic copies), vectorized over the image index, chunked over sigma so
    the intermediate stays ~[chunk, X, images].  score_norm is a fixed-seed
    Monte-Carlo estimate of E[score^2] (reference uses 10k samples per sigma).
    """
    x = 10 ** np.linspace(np.log10(TORUS_X_MIN), 0, TORUS_X_N + 1) * np.pi
    sigma = (
        10
        ** np.linspace(
            np.log10(TORUS_SIGMA_MIN), np.log10(TORUS_SIGMA_MAX), TORUS_SIGMA_N + 1
        )
        * np.pi
    )

    p = np.empty((TORUS_SIGMA_N + 1, TORUS_X_N + 1), dtype=np.float64)
    grad = np.empty_like(p)
    chunk = 256
    for s0 in range(0, len(sigma), chunk):
        sg_chunk = sigma[s0 : s0 + chunk]
        sg = sg_chunk[:, None, None]  # [C,1,1]
        # Adaptive image truncation: the k-th periodic copy contributes at
        # most exp(-(2*pi*k - pi)^2 / 2 sigma^2); beyond |xx| > 20 sigma the
        # term is < e^-200 ~ 1e-87, negligible against every representable
        # p (stored as float32).  sigma is ascending, so the chunk max bounds
        # the needed copies — 1 image for small sigma vs the fixed +-100 of
        # the dense reference sum, cutting cold-start table generation from
        # ~20 min to seconds on a 1-core host at identical (f32) values.
        k_max = int(np.ceil((20.0 * sg_chunk[-1] + np.pi) / (2 * np.pi)))
        k_max = min(k_max, _TORUS_IMAGE_N)
        images = 2 * np.pi * np.arange(-k_max, k_max + 1)
        xx = x[None, :, None] + images[None, None, :]  # [1,X,I]
        with np.errstate(under="ignore"):
            e = np.exp(-(xx**2) / 2 / sg**2)
        p[s0 : s0 + chunk] = e.sum(-1)
        grad[s0 : s0 + chunk] = (xx / sg**2 * e).sum(-1)
    score = grad / p

    # deterministic MC estimate of E[score(sample)^2] per sigma
    rng = np.random.default_rng(0)
    n_mc = 10000
    z = rng.standard_normal((n_mc, len(sigma)))
    samp = (sigma[None, :] * z + np.pi) % (2 * np.pi) - np.pi
    # score lookup (nearest-index, same as runtime lookup)
    sgn = np.sign(samp)
    xi = np.log(np.abs(samp) / np.pi)
    xi = (xi - np.log(TORUS_X_MIN)) / (0 - np.log(TORUS_X_MIN)) * TORUS_X_N
    xi = np.round(np.clip(xi, 0, TORUS_X_N)).astype(int)
    si = np.broadcast_to(np.arange(len(sigma))[None, :], xi.shape)
    mc_scores = -sgn * score[si, xi]
    score_norm = (mc_scores**2).mean(0)

    return {
        "p": p.astype(np.float32),
        "score": score.astype(np.float32),
        "score_norm": score_norm.astype(np.float32),
    }


@dataclass(frozen=True)
class TorusTables:
    """Wrapped-normal tables as device arrays."""

    p: Array  # [SIGMA_N+1, X_N+1]
    score: Array  # [SIGMA_N+1, X_N+1]
    score_norm_table: Array  # [SIGMA_N+1]

    @staticmethod
    def load() -> "TorusTables":
        path = os.path.join(_cache_dir(), "torus_tables_v1.npz")
        if os.path.exists(path):
            raw = np.load(path)
            raw = {k: raw[k] for k in raw.files}
        else:
            raw = _torus_build_tables()
            np.savez(path, **raw)
        return TorusTables(
            p=jnp.asarray(raw["p"]),
            score=jnp.asarray(raw["score"]),
            score_norm_table=jnp.asarray(raw["score_norm"]),
        )

    # -- index helpers ---------------------------------------------------

    @staticmethod
    def _x_index(x: Array) -> tuple[Array, Array]:
        x = (x + jnp.pi) % (2 * jnp.pi) - jnp.pi
        sign = jnp.sign(x)
        xi = jnp.log(jnp.maximum(jnp.abs(x), 1e-30) / jnp.pi)
        xi = (xi - np.log(TORUS_X_MIN)) / (0 - np.log(TORUS_X_MIN)) * TORUS_X_N
        xi = jnp.round(jnp.clip(xi, 0, TORUS_X_N)).astype(jnp.int32)
        return sign, xi

    @staticmethod
    def _sigma_index(sigma: Array) -> Array:
        si = jnp.log(sigma / jnp.pi)
        si = (
            (si - np.log(TORUS_SIGMA_MIN))
            / (np.log(TORUS_SIGMA_MAX) - np.log(TORUS_SIGMA_MIN))
            * TORUS_SIGMA_N
        )
        return jnp.round(jnp.clip(si, 0, TORUS_SIGMA_N)).astype(jnp.int32)

    def score_fn(self, x: Array, sigma: Array) -> Array:
        """d/dx log p_wrapped(x; sigma) — element-wise, jit-safe."""
        sign, xi = self._x_index(x)
        si = self._sigma_index(jnp.broadcast_to(sigma, x.shape))
        return -sign * self.score[si, xi]

    def p_fn(self, x: Array, sigma: Array) -> Array:
        _, xi = self._x_index(x)
        si = self._sigma_index(jnp.broadcast_to(sigma, x.shape))
        return self.p[si, xi]

    @staticmethod
    def sample(key: jax.Array, sigma: Array, shape=None) -> Array:
        """Wrapped-normal sample(s) in (-pi, pi]."""
        if shape is None:
            shape = jnp.shape(sigma)
        out = sigma * jax.random.normal(key, shape)
        return (out + jnp.pi) % (2 * jnp.pi) - jnp.pi

    def score_norm(self, sigma: Array) -> Array:
        return self.score_norm_table[self._sigma_index(jnp.asarray(sigma))]


# pytree registration ----------------------------------------------------------
#
# The tables are ARGUMENTS of the jitted train/eval steps, never closures.
# A closed-over jax.Array is inlined into the lowered HLO as a literal; with
# the 5001x5001 torus grids that produced ~430 MB of literals in EVERY
# train-step executable (measured: 470 MB persistent-cache entries, one per
# bucket shape) — catastrophic for compile time, HBM (one table copy per
# executable), and the TPU tunnel (each remote compile shipped the tables).
# As pytree arguments the tables live on device ONCE and cross the jit
# boundary by reference.
jax.tree_util.register_dataclass(
    SO3Tables,
    data_fields=["omegas", "cdf", "score", "exp_score_norms"],
    meta_fields=[],
)
jax.tree_util.register_dataclass(
    TorusTables,
    data_fields=["p", "score", "score_norm_table"],
    meta_fields=[],
)


class Tables(NamedTuple):
    """The (so3, torus) bundle passed through jit boundaries."""

    so3: SO3Tables
    torus: TorusTables


def all_tables() -> "Tables":
    return Tables(so3_tables(), torus_tables())


# module-level lazy singletons -------------------------------------------------

_so3_tables: SO3Tables | None = None
_torus_tables: TorusTables | None = None


def so3_tables() -> SO3Tables:
    global _so3_tables
    if _so3_tables is None:
        _so3_tables = SO3Tables.load()
    return _so3_tables


def torus_tables() -> TorusTables:
    global _torus_tables
    if _torus_tables is None:
        _torus_tables = TorusTables.load()
    return _torus_tables
