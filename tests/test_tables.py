"""Tests for the IGSO(3) and torus diffusion tables.

The SO(3) expansion is checked against a direct (slow) evaluation of the
truncated series at a few grid points — an independent oracle for the
vectorized table builder.  Sampling statistics are checked against the
analytic small-sigma limits.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_pocket_tpu import tables


@pytest.fixture(scope="module")
def so3():
    return tables.so3_tables()


@pytest.fixture(scope="module")
def torus():
    return tables.torus_tables()


def _igso3_expansion_direct(omega, eps, L=2000):
    p = 0.0
    for l in range(L):
        p += (
            (2 * l + 1)
            * np.exp(-l * (l + 1) * eps**2)
            * np.sin(omega * (l + 0.5))
            / np.sin(omega / 2)
        )
    return p


def test_so3_cdf_monotone_and_normalized(so3):
    cdf = np.asarray(so3.cdf)
    assert np.all(np.diff(cdf, axis=1) >= -1e-4)
    # total mass ~1 for every eps row
    np.testing.assert_allclose(cdf[:, -1], 1.0, atol=0.02)


def test_so3_score_matches_direct_series(so3):
    # compare table score against a finite difference of the directly-
    # evaluated log density, at a bulk point where the truncated series is
    # numerically well conditioned (in the far tail the alternating series
    # cancels catastrophically for any implementation, reference included)
    eps_grid = 10 ** np.linspace(np.log10(0.01), np.log10(2.0), 1000)
    omegas = np.asarray(so3.omegas)
    for eps_idx, om_idx in [(800, 1000), (900, 1400), (700, 600)]:
        eps = eps_grid[eps_idx]
        om = omegas[om_idx]
        h = 1e-4
        f = lambda o: np.log(_igso3_expansion_direct(o, eps))
        fd = (f(om + h) - f(om - h)) / (2 * h)
        table_val = np.asarray(so3.score)[eps_idx, om_idx]
        np.testing.assert_allclose(table_val, fd, rtol=1e-2, atol=1e-3)


def test_so3_sample_small_eps_statistics(so3):
    # for small eps the IGSO3 angle is ~ |N(0, eps^2 * I_3)| i.e. chi_3 * eps
    # IGSO3(eps) is the SO(3) heat kernel exp(-l(l+1) eps^2), i.e. Brownian
    # motion at time t = 2 eps^2; for small eps the rotation vector is
    # ~ N(0, 2 eps^2 I), so the angle is chi_3-distributed with scale
    # sqrt(2) eps and mean 2 sqrt(2/pi) * sqrt(2) eps = 4 eps / sqrt(pi).
    eps = 0.05
    key = jax.random.PRNGKey(0)
    samples = so3.sample(key, jnp.full((4000,), eps))
    mean = float(jnp.mean(samples))
    expected = 4 * eps / np.sqrt(np.pi)
    np.testing.assert_allclose(mean, expected, rtol=0.1)


def test_so3_score_vec_direction(so3):
    vec = jnp.asarray([0.5, 0.0, 0.0])
    s = so3.score_vec(jnp.asarray(0.3), vec)
    # score is parallel (or anti-parallel) to the rotation vector
    cross = jnp.linalg.norm(jnp.cross(s, vec))
    assert float(cross) < 1e-5


def test_so3_score_norm_consistency(so3):
    # the stored norm follows the reference convention
    # score_norm = sqrt(E[score^2] / pi) (utils/so3.py:57), so the MC estimate
    # of sqrt(E[|score_vec|^2]) should equal table * sqrt(pi)
    eps = 0.3
    key = jax.random.PRNGKey(1)
    vecs = so3.sample_vec(key, jnp.full((2000,), eps))
    scores = so3.score_vec(jnp.asarray(eps), vecs)
    mc = float(jnp.sqrt(jnp.mean(jnp.sum(scores**2, axis=-1))))
    table = float(so3.score_norm(jnp.asarray(eps)))
    np.testing.assert_allclose(mc, table * np.sqrt(np.pi), rtol=0.1)


def test_so3_sample_inside_jit(so3):
    @jax.jit
    def f(key):
        return so3.sample_vec(key, jnp.full((8,), 0.5))

    out = f(jax.random.PRNGKey(2))
    assert out.shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------


def test_torus_score_matches_small_sigma_gaussian(torus):
    # for small sigma the wrapped normal is a plain normal: score = -x/sigma^2
    sigma = 0.1
    xs = jnp.asarray([-0.2, -0.05, 0.05, 0.2])
    s = np.asarray(torus.score_fn(xs, jnp.asarray(sigma)))
    np.testing.assert_allclose(s, -np.asarray(xs) / sigma**2, rtol=0.02)


def test_torus_score_large_sigma_small(torus):
    # near-uniform density => tiny score
    s = np.asarray(torus.score_fn(jnp.asarray([1.0]), jnp.asarray(6.0)))
    assert abs(s[0]) < 0.5


def test_torus_sample_wrapped(torus):
    out = tables.TorusTables.sample(jax.random.PRNGKey(0), jnp.asarray(2.0), (1000,))
    arr = np.asarray(out)
    assert np.all(arr > -np.pi - 1e-6) and np.all(arr <= np.pi + 1e-6)


def test_torus_score_norm_monotone_then_flat(torus):
    # score_norm ~ 1/sigma^2 at small sigma, decreasing in sigma
    sigmas = jnp.asarray([0.05, 0.1, 0.5, 1.0])
    norms = np.asarray(torus.score_norm(sigmas))
    assert norms[0] > norms[1] > norms[2] > norms[3]
    np.testing.assert_allclose(norms[0], 1 / 0.05**2, rtol=0.1)


def test_torus_score_odd(torus):
    xs = jnp.asarray([0.3, 0.9])
    s_pos = np.asarray(torus.score_fn(xs, jnp.asarray(0.5)))
    s_neg = np.asarray(torus.score_fn(-xs, jnp.asarray(0.5)))
    np.testing.assert_allclose(s_pos, -s_neg, atol=1e-5)
