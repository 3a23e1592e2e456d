"""Asynchronous / per-manifold noise schedules (reference
utils/sampling.py:70-96, diffusion_utils.py:120-165, pdbbind.py:62-84)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_pocket_tpu import graph as graphlib, sampling, tables, training
from diffdock_pocket_tpu.diffusion import SigmaConfig, get_inverse_schedule
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import get_model
from diffdock_pocket_tpu.pipeline import init_random_variables

from synthetic import make_graph

TINY_ASYNC = ModelConfig(
    ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    asyncronous_noise_schedule=True, low_precision_weights=False,
)


def test_make_schedules_async_inverse_beta():
    alphas = {"tr": (1.0, 1.0), "rot": (2.0, 1.0), "tor": (1.0, 2.0),
              "sc_tor": (1.0, 1.0)}
    sched = sampling.make_schedules("expbeta", 8, asyncronous=True,
                                    manifold_alphas=alphas)
    assert set(sched) == {"t", "tr", "rot", "tor", "sc_tor"}
    base = np.asarray(sched["t"])
    # identity warp for (1, 1)
    np.testing.assert_allclose(np.asarray(sched["tr"]), base, atol=1e-6)
    # Beta(2,1) ppf = sqrt(u)
    np.testing.assert_allclose(
        np.asarray(sched["rot"]), np.sqrt(base), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched["tor"]),
        get_inverse_schedule(base, 1.0, 2.0).astype(np.float32), atol=1e-5,
    )
    # all schedules decrease towards 0
    for k in ("t", "tr", "rot", "tor", "sc_tor"):
        assert np.all(np.diff(np.asarray(sched[k])) < 0)


def test_sample_times_async_matches_scipy():
    from scipy.stats import beta as beta_dist

    cfg = training.NoiseConfig(
        asyncronous_noise_schedule=True,
        rot_alpha=2.0, rot_beta=1.5, tor_alpha=0.8, tor_beta=1.2,
    )
    grids = training.beta_ppf_grids(cfg)
    t = training.sample_times(jax.random.PRNGKey(0), 512, cfg, grids)
    base = np.asarray(t["t"])
    np.testing.assert_allclose(np.asarray(t["tr"]), base, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(t["rot"]), beta_dist.ppf(base, 2.0, 1.5), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(t["tor"]), beta_dist.ppf(base, 0.8, 1.2), atol=2e-3
    )


def test_reverse_diffusion_per_manifold_schedules():
    """Dict schedules drive the sampler; identical dicts reproduce the
    shared-schedule result bit-for-bit."""
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    cfg = TINY_ASYNC
    variables = init_random_variables(
        ModelConfig(**{**cfg.to_dict(), "asyncronous_noise_schedule": False,
                       "sigma": cfg.sigma}), g)
    model = get_model(ModelConfig(**{
        **cfg.to_dict(), "asyncronous_noise_schedule": False,
        "sigma": cfg.sigma}))
    from diffdock_pocket_tpu import tables

    so3, torus = tables.so3_tables(), tables.torus_tables()
    sig = cfg.sigma

    def score_fn(gr, t):
        _, s_rot, s_tor, s_sc = sig.t_to_sigma(
            t["tr"], t["rot"], t["tor"], t["sc_tor"])
        sn = {"rot": so3.score_norm(s_rot), "tor": torus.score_norm(s_tor),
              "sc_tor": torus.score_norm(s_sc)}
        return model.apply(variables, gr, t, sn)

    scfg = sampling.SamplerConfig(inference_steps=3)
    shared = sampling.make_schedules("expbeta", 3)["tr"]
    key = jax.random.PRNGKey(7)
    g1, _ = jax.jit(
        lambda k, gg: sampling.reverse_diffusion(k, gg, score_fn, shared, sig, scfg)
    )(key, g)
    sched_dict = {m: shared for m in sampling.MANIFOLDS}
    g2, _ = jax.jit(
        lambda k, gg: sampling.reverse_diffusion(k, gg, score_fn, sched_dict, sig, scfg)
    )(key, g)
    np.testing.assert_allclose(
        np.asarray(g1.lig_pos), np.asarray(g2.lig_pos), atol=1e-6
    )

    # genuinely different per-manifold schedules still run and differ
    warped = {
        "tr": shared, "rot": jnp.sqrt(shared), "tor": shared**2,
        "sc_tor": shared,
    }
    g3, _ = jax.jit(
        lambda k, gg: sampling.reverse_diffusion(k, gg, score_fn, warped, sig, scfg)
    )(key, g)
    assert np.isfinite(np.asarray(g3.lig_pos)).all()
    assert not np.allclose(np.asarray(g3.lig_pos), np.asarray(g2.lig_pos))


def test_async_model_train_step():
    """Training with asyncronous_noise_schedule: the model embeds the base t
    and a train step produces finite grads/loss."""
    import optax

    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    model = get_model(TINY_ASYNC)
    variables = init_random_variables(TINY_ASYNC, g)
    noise_cfg = training.NoiseConfig(
        asyncronous_noise_schedule=True, rot_alpha=2.0, rot_beta=1.0,
    )
    opt = optax.adam(1e-3)
    step = jax.jit(training.make_train_step(
        model, opt, TINY_ASYNC.sigma, noise_cfg, training.LossWeights()
    ))
    state = training.create_train_state(variables, opt)
    state, aux = step(state, jax.random.PRNGKey(0), g, tables.all_tables())
    assert np.isfinite(float(aux["loss"]))
