"""Training-engine tests: noise transform targets, loss, train-step descent."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffdock_pocket_tpu import graph as graphlib
from diffdock_pocket_tpu import tables, training
from diffdock_pocket_tpu.diffusion import SigmaConfig
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import get_model
from diffdock_pocket_tpu.pipeline import init_random_variables

from synthetic import make_graph

TINY = ModelConfig(
    ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    low_precision_weights=False,
)


@pytest.fixture(scope="module")
def batch():
    return graphlib.stack([make_graph(seed=i) for i in range(2)])


def test_apply_noise_targets(batch):
    sigma = SigmaConfig()
    so3 = tables.so3_tables()
    torus = tables.torus_tables()
    cfg = training.NoiseConfig()
    key = jax.random.PRNGKey(0)
    t = training.sample_times(key, 2, cfg)
    g_noised, targets = jax.jit(
        lambda k, g, t: training.apply_noise(k, g, t, sigma, so3, torus, cfg)
    )(key, batch, t)
    # positions actually moved
    assert float(jnp.abs(g_noised.lig_pos - batch.lig_pos).max()) > 1e-3
    # masks/feats untouched
    np.testing.assert_array_equal(
        np.asarray(g_noised.lig_mask), np.asarray(batch.lig_mask)
    )
    for x in targets:
        assert np.all(np.isfinite(np.asarray(x)))
    # bond lengths preserved under the forward diffusion too
    bidx = np.asarray(batch.lig_bond_index[0])
    bmask = np.asarray(batch.lig_bond_mask[0])
    p0 = np.asarray(batch.lig_pos[0])
    p1 = np.asarray(g_noised.lig_pos[0])
    l0 = np.linalg.norm(p0[bidx[:, 0]] - p0[bidx[:, 1]], axis=1)[bmask]
    l1 = np.linalg.norm(p1[bidx[:, 0]] - p1[bidx[:, 1]], axis=1)[bmask]
    np.testing.assert_allclose(l1, l0, atol=1e-3)


def test_train_step_decreases_loss(batch):
    model = get_model(TINY)
    variables = init_random_variables(TINY, batch, seed=1)
    optimizer = optax.adam(2e-3)
    state = training.create_train_state(variables, optimizer)
    noise_cfg = training.NoiseConfig()
    step = jax.jit(
        training.make_train_step(model, optimizer, TINY.sigma, noise_cfg)
    )
    # fixed key => same noise every step; loss on that fixed task must drop
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        state, aux = step(state, key, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    # EMA warmup decay: after n steps decay = min(0.999, (1+n)/(10+n))
    assert int(state.ema.num_updates) == 8


def test_eval_step_runs(batch):
    model = get_model(TINY)
    variables = init_random_variables(TINY, batch, seed=1)
    noise_cfg = training.NoiseConfig()
    eval_step = jax.jit(
        training.make_eval_step(model, TINY.sigma, noise_cfg)
    )
    aux = eval_step(
        variables["params"], variables.get("batch_stats", {}),
        jax.random.PRNGKey(0), batch,
    )
    assert aux["loss"].shape == (2,)  # unpooled per-graph losses
    assert np.all(np.isfinite(np.asarray(aux["loss"])))


def test_ema_update_math():
    params = {"w": jnp.ones((3,))}
    st = training.ema_init(params)
    st = training.ema_update(st, {"w": jnp.zeros((3,))}, decay=0.999)
    # first update: decay = min(0.999, 2/11)
    expected = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(st.params["w"]), expected, rtol=1e-6)
