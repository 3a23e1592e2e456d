"""Smoke + equivariance tests for the all-atom score model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_pocket_tpu import graph as graphlib
from diffdock_pocket_tpu import tables
from diffdock_pocket_tpu.models.all_atom_score_model import AllAtomScoreModel
from diffdock_pocket_tpu.models.config import ModelConfig

from synthetic import make_graph

TINY = ModelConfig(
    ns=8, nv=2, num_conv_layers=3, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    low_precision_weights=False,
)


def _times(B, val=0.5):
    t = jnp.full((B,), val)
    return {"tr": t, "rot": t, "tor": t, "sc_tor": t}


def _score_norms(cfg, t):
    so3 = tables.so3_tables()
    torus = tables.torus_tables()
    _, s_rot, s_tor, s_sc = cfg.sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
    return {
        "rot": so3.score_norm(s_rot),
        "tor": torus.score_norm(s_tor),
        "sc_tor": torus.score_norm(s_sc),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    g1 = make_graph(seed=0)
    g = graphlib.stack([g1, make_graph(seed=1)])
    model = AllAtomScoreModel(TINY)
    t = _times(2)
    sn = _score_norms(TINY, t)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), g, t, sn)
    return model, jax.jit(model.apply), variables, g, t, sn


def test_forward_shapes(model_and_vars):
    model, apply_fn, variables, g, t, sn = model_and_vars
    tr, rot, tor, sc = apply_fn(variables, g, t, sn)
    B = g.lig_pos.shape[0]
    assert tr.shape == (B, 3)
    assert rot.shape == (B, 3)
    assert tor.shape == (B, g.tor_bond_index.shape[1])
    assert sc.shape == (B, g.sc_bond_index.shape[1])
    for x in (tr, rot, tor, sc):
        assert np.all(np.isfinite(np.asarray(x)))


def _rotate_graph(g, rot):
    rot = jnp.asarray(rot)
    return g.replace(
        lig_pos=g.lig_pos @ rot.T,
        rec_pos=g.rec_pos @ rot.T,
        atom_pos=g.atom_pos @ rot.T,
        lig_orig_pos=g.lig_orig_pos @ rot.T,
        atom_orig_pos=g.atom_orig_pos @ rot.T,
    )


def test_model_equivariance(model_and_vars):
    """Rotating the whole complex must rotate tr/rot predictions and leave
    torsion scores invariant — the core correctness property of the
    architecture."""
    model, apply_fn, variables, g, t, sn = model_and_vars
    # full fp32 matmuls here: the equivariance property is exact in real
    # arithmetic; the production default (bf16-class) trades ~0.3% noise for
    # MXU speed, which would swamp the tolerance.
    with jax.default_matmul_precision("float32"):
        f = jax.jit(model.apply)
        tr, rot_v, tor, sc = f(variables, g, t, sn)
        rot = R.random(random_state=7).as_matrix().astype(np.float32)
        g_rot = _rotate_graph(g, rot)
        tr2, rot2, tor2, sc2 = f(variables, g_rot, t, sn)
    np.testing.assert_allclose(np.asarray(tr2), np.asarray(tr) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(rot2), np.asarray(rot_v) @ rot.T, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tor2), np.asarray(tor), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc), atol=2e-3)


def test_padding_invariance(model_and_vars):
    """Predictions must be identical when the same complex is padded into a
    larger bucket — masks must fully isolate padding."""
    model, apply_fn, variables, g, t, sn = model_and_vars
    # build same complex in a bigger bucket
    from synthetic import make_raw_complex

    big_buckets = {"lig": (24,), "rec": (16,), "atom": (64,), "tor": (6,), "sc": (8,), "bond": (48,)}
    raw = make_raw_complex(seed=0)
    g_big1 = graphlib.from_raw(raw, buckets=big_buckets)
    raw1 = make_raw_complex(seed=1)
    g_big = graphlib.stack([g_big1, graphlib.from_raw(raw1, buckets=big_buckets)])

    tr, rot_v, tor, sc = apply_fn(variables, g, t, sn)
    tr2, rot2, tor2, sc2 = jax.jit(model.apply)(variables, g_big, t, sn)
    np.testing.assert_allclose(np.asarray(tr2), np.asarray(tr), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rot2), np.asarray(rot_v), atol=2e-3)
    n_t = min(tor.shape[1], tor2.shape[1])
    np.testing.assert_allclose(np.asarray(tor2[:, :n_t]), np.asarray(tor[:, :n_t]), atol=2e-3)


def test_confidence_mode_forward():
    cfg = TINY.replace(confidence_mode=True) if hasattr(TINY, "replace") else None
    import dataclasses

    cfg = dataclasses.replace(TINY, confidence_mode=True)
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    model = AllAtomScoreModel(cfg)
    t = _times(2, 0.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), g, t, None)
    conf = jax.jit(model.apply)(variables, g, t, None)
    assert conf.shape == (2,)
    assert np.all(np.isfinite(np.asarray(conf)))


def test_train_mode_updates_batch_stats(model_and_vars):
    model, apply_fn, variables, g, t, sn = model_and_vars
    out, mutated = jax.jit(
        lambda v, g_, t_, sn_, rng: model.apply(
            v, g_, t_, sn_, train=True, rngs={"dropout": rng}, mutable=["batch_stats"]
        )
    )(variables, g, t, sn, jax.random.PRNGKey(1))
    _unused = lambda: model.apply(
        variables, g, t, sn, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    # some running stat must have moved
    leaves_before = jax.tree.leaves(variables["batch_stats"])
    leaves_after = jax.tree.leaves(mutated["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert moved


def test_second_order_sh_lmax2_forward():
    """The lmax=2 second-order-representation configuration (reference
    --use_second_order_repr) runs through the generic CG tensor products,
    including the l=4 blocks of the torsion-head sh composition."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, ns=4, nv=2, num_conv_layers=2, sh_lmax=2, use_second_order_repr=True
    )
    g = graphlib.stack([make_graph(seed=3)])
    from diffdock_pocket_tpu import pipeline
    from diffdock_pocket_tpu.models.score_model import get_model

    variables = pipeline.init_random_variables(cfg, g)
    model = get_model(cfg)
    t = _times(1)
    sn = _score_norms(cfg, t)
    out = jax.jit(model.apply)(variables, g, t, sn)
    for x in out:
        assert np.all(np.isfinite(np.asarray(x)))
