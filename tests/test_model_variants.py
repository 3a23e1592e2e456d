"""Tests for the model variants: CG misc-atom routing, parallel confidence/
affinity head, CG (non-all-atom) forward."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_pocket_tpu import graph as graphlib, pipeline, tables
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.models.score_model import CGScoreModel, get_model

from synthetic import make_graph

BASE = ModelConfig(
    ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=False, flexible_sidechains=False, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    low_precision_weights=False,
)


def _times(B, v=0.5):
    t = jnp.full((B,), v)
    return {k: t for k in ("tr", "rot", "tor", "sc_tor")}


def _sn(cfg, t):
    so3 = tables.so3_tables()
    torus = tables.torus_tables()
    _, sr, st, ss = cfg.sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
    return {"rot": so3.score_norm(sr), "tor": torus.score_norm(st),
            "sc_tor": torus.score_norm(ss)}


def test_cg_model_forward():
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    model = get_model(BASE)
    assert isinstance(model, CGScoreModel)
    t = _times(2)
    v = pipeline.init_random_variables(BASE, g)
    tr, rot, tor, sc = jax.jit(model.apply)(v, g, t, _sn(BASE, t))
    assert tr.shape == (2, 3) and rot.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(tr)))
    # CG model has no side-chain head
    np.testing.assert_allclose(np.asarray(sc), 0.0)


def test_misc_atom_routing():
    cfg = dataclasses.replace(BASE, include_miscellaneous_atoms=True)
    from diffdock_pocket_tpu.models.all_atom_score_model import AllAtomScoreModel

    model = get_model(cfg)
    assert isinstance(model, AllAtomScoreModel)
    g = graphlib.stack([make_graph(seed=2)])
    t = _times(1)
    v = pipeline.init_random_variables(cfg, g)
    out = jax.jit(model.apply)(v, g, t, _sn(cfg, t))
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


def test_parallel_confidence_affinity():
    cfg = dataclasses.replace(
        BASE, all_atoms=True, flexible_sidechains=True, confidence_mode=True,
        affinity_prediction=True, parallel=2,
    )
    model = get_model(cfg)
    B, P = 3, 2
    g = graphlib.stack([make_graph(seed=i % 3) for i in range(B * P)])
    t = _times(B * P, 0.0)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), g, t, None)
    filtering, affinity = jax.jit(model.apply)(v, g, t, None)
    assert filtering.shape == (B, P)
    assert affinity.shape == (B,)
    assert np.all(np.isfinite(np.asarray(filtering)))
    assert np.all(np.isfinite(np.asarray(affinity)))


def test_capped_cross_families_match_dense_at_full_k():
    """With top-K caps >= the real neighbor counts, the capped lig<->rec
    cross families must reproduce the dense [NL, NR] pair block exactly
    (mean aggregation is permutation-invariant), sharing the same params."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffdock_pocket_tpu import graph as graphlib, tables
    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.models.score_model import get_model
    from diffdock_pocket_tpu.pipeline import init_random_variables
    from synthetic import make_graph

    base = ModelConfig(
        ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
        distance_embed_dim=8, cross_distance_embed_dim=8,
        dynamic_max_cross=True, all_atoms=True, flexible_sidechains=True,
        atom_max_neighbors=4, lig_max_neighbors=6,
        cross_lig_atom_max_neighbors=6, low_precision_weights=False,
    )
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    NL, NR = g.lig_pos.shape[1], g.rec_pos.shape[1]
    variables = init_random_variables(base, g)

    so3, torus = tables.so3_tables(), tables.torus_tables()
    t = {k: jnp.full((2,), 0.4) for k in ("tr", "rot", "tor", "sc_tor")}
    _, s_rot, s_tor, s_sc = base.sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
    sn = {"rot": so3.score_norm(s_rot), "tor": torus.score_norm(s_tor),
          "sc_tor": torus.score_norm(s_sc)}

    dense = get_model(base).apply(variables, g, t, sn)
    capped_cfg = dataclasses.replace(
        base, cross_lig_rec_max_neighbors=NR, cross_rec_lig_max_neighbors=NL,
    )
    capped = get_model(capped_cfg).apply(variables, g, t, sn)
    for a, b in zip(dense, capped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # a tight cap still runs and gives finite outputs
    tight = dataclasses.replace(
        base, cross_lig_rec_max_neighbors=4, cross_rec_lig_max_neighbors=4,
    )
    out = get_model(tight).apply(variables, g, t, sn)
    for a in out:
        assert np.isfinite(np.asarray(a)).all()


def test_bf16_edge_attr_close_to_fp32():
    """bf16_edge_attr (bf16 raw edge-attr + bf16 fc1 MXU matmul) must stay
    numerically close to the fp32 path — same params, same graph."""
    cfg32 = dataclasses.replace(
        BASE, all_atoms=True, flexible_sidechains=True,
    )
    cfg16 = dataclasses.replace(cfg32, bf16_edge_attr=True)
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    t = _times(2)
    sn = _sn(cfg32, t)
    m32, m16 = get_model(cfg32), get_model(cfg16)
    variables = m32.init(jax.random.PRNGKey(0), g, t, sn)
    out32 = m32.apply(variables, g, t, sn)
    out16 = m16.apply(variables, g, t, sn)  # identical param tree
    for a, b in zip(jax.tree_util.tree_leaves(out32),
                    jax.tree_util.tree_leaves(out16)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.05, (a - b)


def test_skip_heavy_intra_weight_compatible():
    """The reduced model (skip_heavy_intra: no rec/atom intra families) must
    apply cleanly with the FULL model's variables — submodule creation order
    is preserved so flax auto-names line up — and give finite outputs that
    differ from the full forward (the families really are dropped)."""
    full_cfg = dataclasses.replace(BASE, all_atoms=True, flexible_sidechains=True)
    skip_cfg = dataclasses.replace(full_cfg, skip_heavy_intra=True)
    g = graphlib.stack([make_graph(seed=0), make_graph(seed=1)])
    t = _times(2)
    sn = _sn(full_cfg, t)
    m_full, m_skip = get_model(full_cfg), get_model(skip_cfg)
    variables = m_full.init(jax.random.PRNGKey(0), g, t, sn)
    out_full = m_full.apply(variables, g, t, sn)
    out_skip = m_skip.apply(variables, g, t, sn)
    for a in out_skip:
        assert np.isfinite(np.asarray(a)).all()
    # the rec/atom intra contributions are real: outputs must differ
    assert not np.allclose(np.asarray(out_full[0]), np.asarray(out_skip[0]))

    # lig-MLP weights must map to the same modules in both variants: zeroing
    # the FIRST auto-named MLP (the ligand edge MLP) changes both outputs
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    z = {k: (jnp.zeros_like(v) if k[0] == "MLP_0" else v) for k, v in flat.items()}
    vz = dict(variables)
    vz["params"] = flax.traverse_util.unflatten_dict(z)
    outz_full = m_full.apply(vz, g, t, sn)
    outz_skip = m_skip.apply(vz, g, t, sn)
    assert not np.allclose(np.asarray(outz_full[0]), np.asarray(out_full[0]))
    assert not np.allclose(np.asarray(outz_skip[0]), np.asarray(out_skip[0]))


def test_skip_intra_steps_split_scan_identity():
    """reverse_diffusion with skip_intra_steps=k and score_fn_early ==
    score_fn must be bit-identical to the single-scan path (the split only
    re-chunks the scan; key threading is unchanged)."""
    from diffdock_pocket_tpu import sampling

    cfg = dataclasses.replace(BASE, all_atoms=True, flexible_sidechains=True)
    g = graphlib.stack([make_graph(seed=3)] * 2)
    variables = pipeline.init_random_variables(cfg, g)
    model = get_model(cfg)
    so3, torus = tables.so3_tables(), tables.torus_tables()

    def score_fn(gr, t):
        _, sr, st, ss = cfg.sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
        sn = {"rot": so3.score_norm(sr), "tor": torus.score_norm(st),
              "sc_tor": torus.score_norm(ss)}
        return model.apply(variables, gr, t, sn)

    sched = sampling.make_schedules("expbeta", 4)
    key = jax.random.PRNGKey(7)
    base_s = sampling.SamplerConfig(inference_steps=4)
    g0, _ = sampling.reverse_diffusion(key, g, score_fn, sched, cfg.sigma, base_s)
    split_s = dataclasses.replace(base_s, skip_intra_steps=2)
    g1, _ = sampling.reverse_diffusion(
        key, g, score_fn, sched, cfg.sigma, split_s, score_fn_early=score_fn
    )
    np.testing.assert_array_equal(np.asarray(g0.lig_pos), np.asarray(g1.lig_pos))
    np.testing.assert_array_equal(np.asarray(g0.atom_pos), np.asarray(g1.atom_pos))

    # and with the real reduced model: still runs, finite, different
    skip_model = get_model(dataclasses.replace(cfg, skip_heavy_intra=True))

    def score_fn_early(gr, t):
        _, sr, st, ss = cfg.sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
        sn = {"rot": so3.score_norm(sr), "tor": torus.score_norm(st),
              "sc_tor": torus.score_norm(ss)}
        return skip_model.apply(variables, gr, t, sn)

    g2, _ = sampling.reverse_diffusion(
        key, g, score_fn, sched, cfg.sigma, split_s, score_fn_early=score_fn_early
    )
    assert np.isfinite(np.asarray(g2.lig_pos)).all()
    assert not np.array_equal(np.asarray(g2.lig_pos), np.asarray(g0.lig_pos))


def test_fused_model_wiring_interpret(monkeypatch):
    """DDP_TPU_FUSED_INTERPRET routes the model's fused-kernel dispatches
    through Pallas interpret mode on CPU: the full model-level wiring
    (reshapes, irreps strings, multi-family batching) of BOTH kernel
    families must reproduce the unfused forward within bf16-matmul
    tolerance."""
    for cfg in (
        # lmax=1 fast path, multi-family batched
        dataclasses.replace(
            BASE, all_atoms=True, flexible_sidechains=True,
            batch_conv_families=True,
        ),
        # second-order path through the general-CG kernel
        dataclasses.replace(
            BASE, all_atoms=True, flexible_sidechains=True,
            sh_lmax=2, use_second_order_repr=True, batch_conv_families=True,
        ),
    ):
        g = graphlib.stack([make_graph(seed=4), make_graph(seed=5)])
        t = _times(2)
        v = pipeline.init_random_variables(cfg, g)
        model = get_model(cfg)
        ref = jax.jit(model.apply)(v, g, t, _sn(cfg, t))

        monkeypatch.setenv("DDP_TPU_FUSED_INTERPRET", "1")
        got = jax.jit(model.apply)(v, g, t, _sn(cfg, t))
        monkeypatch.delenv("DDP_TPU_FUSED_INTERPRET")

        for a, b in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


def test_affinity_head_eval_stable_with_degenerate_pose_batches():
    """Round-4 regression: with `parallel` near-identical pose replicas and
    tiny complex batches (B/parallel = 2), the affinity head must not
    develop a train/eval statistics gap (the BatchNorm design inherited
    from the reference collapsed its running variance here — val affinity
    MSE ~1e9 while train z-loss ~0.9; the head now uses LayerNorm) and the
    std aggregator must have finite gradients even for IDENTICAL replicas."""
    import optax

    cfg = dataclasses.replace(
        BASE, all_atoms=True, flexible_sidechains=True, confidence_mode=True,
        affinity_prediction=True, parallel=2,
    )
    model = get_model(cfg)
    P, nC = 2, 2
    base = [make_graph(seed=i) for i in range(nC)]
    # IDENTICAL replicas: the worst case for the std aggregator
    g = graphlib.stack([b for b in base for _ in range(P)])
    t = _times(nC * P, 0.0)
    v = model.init(jax.random.PRNGKey(0), g, t, None)
    params, batch_stats = v["params"], v.get("batch_stats", {})
    aff_true = jnp.asarray([0.5, -0.5])

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        def loss_fn(p):
            (filt, ap), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, g, t, None,
                train=True, rngs={"dropout": key}, mutable=["batch_stats"])
            return jnp.mean((ap - aff_true) ** 2), mut["batch_stats"]
        (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), bs, opt_state, l, grads

    key = jax.random.PRNGKey(1)
    for _ in range(25):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, l, grads = step(
            params, batch_stats, opt_state, sub)
    assert np.isfinite(float(l)), "train loss NaN'd on identical replicas"
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

    filt_eval, ap_eval = model.apply(
        {"params": params, "batch_stats": batch_stats}, g, t, None, train=False)
    ap_eval, filt_eval = np.asarray(ap_eval), np.asarray(filt_eval)
    assert np.all(np.isfinite(ap_eval))
    # z-space labels are O(1); a statistics-gap blowup lands at 1e3-1e5
    assert np.max(np.abs(ap_eval)) < 50.0, ap_eval
    # the per-pose filtering logits go through the trunk MLP, whose batch
    # is the same degenerate B/parallel-complex axis in parallel mode
    # (measured: val BCE ~300 with train BCE ~1 before the LayerNorm fix)
    assert np.all(np.isfinite(filt_eval))
    assert np.max(np.abs(filt_eval)) < 50.0, filt_eval
