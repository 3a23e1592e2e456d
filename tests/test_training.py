"""Training-engine tests: noise transform targets, loss, train-step descent."""
import os
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
    tbl = tables.all_tables()
    losses = []
    for i in range(8):
        state, aux = step(state, key, batch, tbl)
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
        jax.random.PRNGKey(0), batch, tables.all_tables(),
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


def test_loss_apply_mean_weights_by_bond_count(batch):
    """apply_mean=True torsion/sc losses are means over ALL real bonds in the
    batch (reference utils/training.py:48 tor_loss.mean()), so complexes with
    more rotatable bonds carry proportionally more weight."""
    from diffdock_pocket_tpu import tables
    from diffdock_pocket_tpu.training import NoiseTargets, loss_function

    sigma = SigmaConfig()
    so3, torus = tables.so3_tables(), tables.torus_tables()
    B, T = batch.tor_bond_mask.shape
    SC = batch.sc_bond_mask.shape[1]
    rng = np.random.default_rng(0)

    # unequal real-bond counts: complex 0 keeps 1 bond, complex 1 keeps all
    tor_mask = np.zeros((B, T), dtype=bool)
    tor_mask[0, 0] = True
    tor_mask[1, :] = np.asarray(batch.tor_bond_mask[1])
    g = batch.replace(tor_bond_mask=jnp.asarray(tor_mask))

    t = {k: jnp.asarray([0.3, 0.7]) for k in ("tr", "rot", "tor", "sc_tor")}
    preds = (
        jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, SC)), jnp.float32),
    )
    targets = NoiseTargets(
        tr_score=jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        rot_score=jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        tor_score=jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
        sc_tor_score=jnp.asarray(rng.normal(size=(B, SC)), jnp.float32),
    )
    _, aux = loss_function(preds, targets, g, t, sigma, so3, torus,
                           apply_mean=True)

    _, _, s_tor, _ = sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
    norm2 = np.asarray(tables.torus_tables().score_norm(s_tor))[:, None]
    per_bond = (np.asarray(preds[2]) - np.asarray(targets.tor_score)) ** 2 / norm2
    expected = per_bond[tor_mask].sum() / tor_mask.sum()
    np.testing.assert_allclose(float(aux["tor_loss"]), expected, rtol=1e-5)

    # per-complex (apply_mean=False) path keeps the masked per-complex means
    _, aux_u = loss_function(preds, targets, g, t, sigma, so3, torus,
                             apply_mean=False)
    exp0 = per_bond[0][tor_mask[0]].mean()
    np.testing.assert_allclose(float(np.asarray(aux_u["tor_loss"])[0]), exp0, rtol=1e-5)


def test_scheduler_untouched_on_non_inference_epochs():
    """Plateau scheduler steps only when the main metric exists (reference
    train.py:131-134); val_loss epochs must not pollute the best tracker."""
    from diffdock_pocket_tpu.trainer import PlateauScheduler, step_scheduler

    sched = PlateauScheduler(mode="max", patience=2)
    lr = 1e-3
    # inference epoch: metric present -> stepped
    lr, stepped = step_scheduler(sched, {"valinf_rmsds_lt2": 0.5}, "valinf_rmsds_lt2", 1e-3, lr)
    assert stepped and sched.best == 0.5
    state = (sched.best, sched.bad_epochs, sched.scale)
    # non-inference epochs: only val_loss present -> untouched
    for _ in range(10):
        lr2, stepped = step_scheduler(sched, {"val_loss": 0.01}, "valinf_rmsds_lt2", 1e-3, lr)
        assert not stepped and lr2 == lr
    assert (sched.best, sched.bad_epochs, sched.scale) == state
    # worse metric on later inference epochs -> patience then decay
    for _ in range(3):
        lr, _ = step_scheduler(sched, {"valinf_rmsds_lt2": 0.4}, "valinf_rmsds_lt2", 1e-3, lr)
    assert sched.scale < 1.0 and lr < 1e-3


def test_clash_and_sc_metric_suite():
    """The validation clash/sc-RMSD families mirror the reference's 4 clash
    families + deltas and the compare-true-protein metrics
    (utils/training.py:273-280, 316, 390-400, 443-457)."""
    from collections import defaultdict
    from types import SimpleNamespace

    from synthetic import make_raw_complex
    from diffdock_pocket_tpu.data.mol import Bond, Molecule
    from diffdock_pocket_tpu.trainer import Trainer

    raw = make_raw_complex(seed=0)
    nl, na = len(raw["lig_pos"]), len(raw["atom_pos"])
    raw = dict(raw, atom_true_pos=raw["atom_orig_pos"]
               + np.float32(0.5) * np.ones(3, np.float32))
    mol = Molecule(
        ["C"] * nl, raw["lig_pos"],
        [Bond(a, b, 1) for a, b in raw["lig_bond_index"][::2]],
    )
    data = SimpleNamespace(raw=raw, ligand=mol, name="synthetic")
    result = SimpleNamespace(
        lig_pos=raw["lig_orig_pos"][None] + 0.1,
        atom_pos=raw["atom_orig_pos"][None] + 0.1,
    )
    self = SimpleNamespace(
        model_cfg=SimpleNamespace(all_atoms=True, flexible_sidechains=True)
    )
    acc, sc_rmsds = defaultdict(list), []
    Trainer._clash_and_sc_metrics(self, data, result, acc, sc_rmsds)
    for fam in (
        "rec_lig_steric_clashes", "rec_sc_lig_steric_clashes",
        "rec_sc_rec_rest_steric_clashes", "rec_sc_rec_sc_steric_clashes",
    ):
        assert fam in acc and f"{fam}_delta" in acc, fam
    # prediction == original + 0.1 -> deltas ~0
    assert abs(acc["rec_lig_steric_clashes_delta"][0]) <= 2
    assert len(sc_rmsds) == 1 and 0 < sc_rmsds[0] < 1.0
    # compare-true-protein: pred is ~0.5 A different from atom_true_pos
    assert 0.3 < acc["sc_rmsds_from_holo"][0] < 1.5
    assert "sc_rmsds_from_holo_ratio" in acc


def test_sc_rmsds_alignment_without_flexible_sidechains():
    """A complex with no flexible side chains contributes NaN to sc_rmsds so
    the list stays aligned 1:1 with rmsds (the combined
    rmsds_lt2_and_sc_rmsds_lt1 metric pairs per-complex values)."""
    from collections import defaultdict
    from types import SimpleNamespace

    import numpy as np

    from synthetic import make_raw_complex
    from diffdock_pocket_tpu.data.mol import Bond, Molecule
    from diffdock_pocket_tpu.trainer import Trainer

    raw = dict(make_raw_complex(seed=1))
    raw["sc_bond_index"] = np.zeros((0, 2), np.int32)
    nl = len(raw["lig_pos"])
    mol = Molecule(
        ["C"] * nl, raw["lig_pos"],
        [Bond(a, b, 1) for a, b in raw["lig_bond_index"][::2]],
    )
    data = SimpleNamespace(raw=raw, ligand=mol, name="rigid")
    result = SimpleNamespace(
        lig_pos=raw["lig_orig_pos"][None] + 0.1,
        atom_pos=raw["atom_orig_pos"][None] + 0.1,
    )
    self = SimpleNamespace(
        model_cfg=SimpleNamespace(all_atoms=True, flexible_sidechains=True)
    )
    acc, sc_rmsds = defaultdict(list), []
    Trainer._clash_and_sc_metrics(self, data, result, acc, sc_rmsds)
    assert len(sc_rmsds) == 1 and np.isnan(sc_rmsds[0])


def test_device_data_cache_matches_host_batches():
    """The device-resident dataset path (trainer._device_batches + on-device
    row gather) must produce byte-identical batches to the host-stacked
    path (_batches) under the same rng — including the per-assembly random
    conformer substitution and tail-batch repetition padding."""
    from types import SimpleNamespace

    from diffdock_pocket_tpu import graph as graphlib
    from diffdock_pocket_tpu.trainer import Trainer
    from synthetic import make_raw_complex

    complexes = []
    for seed in range(5):
        raw = dict(make_raw_complex(seed=seed, n_lig=12))
        if seed % 2:  # some complexes carry multiple matched conformers
            raw["lig_conf_pos"] = [
                raw["lig_pos"],
                raw["lig_pos"] + np.float32(0.25),
                raw["lig_pos"] - np.float32(0.1),
            ]
        complexes.append(SimpleNamespace(raw=raw, name=f"c{seed}"))

    dataset = object()
    args = SimpleNamespace(batch_size=2, multiplicity=1, device_data_cache=True)

    class BareTrainer(Trainer):
        def __init__(self):  # skip model/optimizer setup — data paths only
            self.args = args
            self._complex_cache = {id(dataset): complexes}

    def fresh_self():
        return BareTrainer()

    host = fresh_self()
    dev = fresh_self()
    host_batches = list(Trainer._batches(host, dataset, rng=np.random.default_rng(7)))
    groups = Trainer._device_groups_for(dev, dataset)
    assert groups, "device staging should fit the default budget"
    dev_batches = list(Trainer._device_batches(dev, dataset, rng=np.random.default_rng(7)))
    assert len(host_batches) == len(dev_batches)
    for (g_host, _), (stacked, rows) in zip(host_batches, dev_batches):
        g_dev = jax.tree.map(lambda a: a[rows], stacked)
        for lh, ld in zip(jax.tree.leaves(g_host), jax.tree.leaves(g_dev)):
            np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))

    # budget fallback: a zero budget disables staging
    import os as _os

    _os.environ["DDP_TPU_DEVICE_DATA_MB"] = "0"
    try:
        assert Trainer._device_groups_for(fresh_self(), dataset) is False
    finally:
        del _os.environ["DDP_TPU_DEVICE_DATA_MB"]


def test_checkpoint_tiebreak_on_saturated_lt2(tmp_path, monkeypatch):
    """valinf_rmsds_lt2 saturates at 1.0 on small val sets; among ties the
    inference checkpoint must follow the better side-chain RMSD (round-3
    corpus journey docked with a frozen early checkpoint otherwise)."""
    from types import SimpleNamespace

    from diffdock_pocket_tpu import trainer as trainer_mod
    from diffdock_pocket_tpu.trainer import Trainer

    saved = []
    monkeypatch.setattr(
        trainer_mod.ckpt, "save_checkpoint",
        lambda path, state: saved.append(os.path.basename(path)))

    t = SimpleNamespace(
        run_dir=str(tmp_path), best={},
        args=SimpleNamespace(use_ema=False, checkpoint_freq=1000, n_epochs=1000),
    )
    state = SimpleNamespace(params={}, batch_stats={})

    # epoch 1: lt2 saturates with mediocre sc
    Trainer._checkpoint(t, state, {"valinf_rmsds_lt2": 1.0,
                                   "valinf_mean_sc_rmsd": 1.4}, 0)
    assert "best_inference_epoch_model" in saved
    saved.clear()
    # epoch 2: same lt2, worse sc -> no update
    Trainer._checkpoint(t, state, {"valinf_rmsds_lt2": 1.0,
                                   "valinf_mean_sc_rmsd": 1.6}, 1)
    assert "best_inference_epoch_model" not in saved
    # epoch 3: same lt2, better sc -> tie-break updates the checkpoint
    Trainer._checkpoint(t, state, {"valinf_rmsds_lt2": 1.0,
                                   "valinf_mean_sc_rmsd": 0.9}, 2)
    assert "best_inference_epoch_model" in saved
    saved.clear()
    # epoch 4: lt2 regression is never accepted, whatever the sc
    Trainer._checkpoint(t, state, {"valinf_rmsds_lt2": 0.9,
                                   "valinf_mean_sc_rmsd": 0.1}, 3)
    assert "best_inference_epoch_model" not in saved
    # rigid runs tie-break on mean ligand RMSD instead
    t2 = SimpleNamespace(run_dir=str(tmp_path), best={}, args=t.args)
    Trainer._checkpoint(t2, state, {"valinf_rmsds_lt2": 1.0,
                                    "valinf_mean_rmsd": 1.0}, 0)
    saved.clear()
    Trainer._checkpoint(t2, state, {"valinf_rmsds_lt2": 1.0,
                                    "valinf_mean_rmsd": 0.5}, 1)
    assert "best_inference_epoch_model" in saved


def test_stats_step_updates_running_stats(batch):
    """make_stats_step returns a batch_stats tree folded toward the batch
    statistics with weight 0.1 (IrrepsBatchNorm momentum), leaving params
    untouched by construction."""
    model = get_model(TINY)
    variables = init_random_variables(TINY, batch, seed=1)
    noise_cfg = training.NoiseConfig()
    stats_step = jax.jit(
        training.make_stats_step(model, TINY.sigma, noise_cfg)
    )
    bs0 = variables["batch_stats"]
    bs1 = stats_step(variables["params"], bs0, jax.random.PRNGKey(0),
                     batch, tables.all_tables())
    # same tree structure, at least one leaf moved, all finite
    assert jax.tree_util.tree_structure(bs0) == jax.tree_util.tree_structure(bs1)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), bs0, bs1)
    assert max(jax.tree.leaves(moved)) > 0.0
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(jax.device_get(bs1)))


def test_refresh_stats_sequential_momentum(tmp_path):
    """Trainer._refresh_stats = `passes` momentum sweeps of stats updates
    over the train batches starting from the current running stats — i.e.
    exactly what chaining stats_step produces with the same keys."""
    from types import SimpleNamespace

    from diffdock_pocket_tpu.trainer import Trainer

    class FakeSet:
        cfg = None
        def __init__(self, graphs):
            self._graphs = graphs
        def preprocess_all(self):
            return self._graphs

    class FakeComplex:
        def __init__(self, g, raw):
            self.raw = raw
            self._g = g

    # two single-graph batches of the same bucket signature
    raws = []
    for i in range(2):
        g = make_graph(seed=10 + i)
        raws.append(g)

    import diffdock_pocket_tpu.data.dataset as ds_mod
    # bypass the dataset layer: monkeypatch _batches-level plumbing by
    # driving _refresh_stats directly with a stub trainer
    model = get_model(TINY)
    g_all = graphlib.stack([make_graph(seed=10), make_graph(seed=11)])
    variables = init_random_variables(TINY, g_all, seed=3)
    noise_cfg = training.NoiseConfig()
    tbl = tables.all_tables()

    t = Trainer.__new__(Trainer)  # no __init__: wire only what we use
    t.args = SimpleNamespace(batch_size=2, multiplicity=1,
                             device_data_cache=False)
    t.tbl = tbl
    t.model = model
    t.stats_step = jax.jit(
        training.make_stats_step(model, TINY.sigma, noise_cfg))
    t.train_set = None

    bs0 = variables["batch_stats"]
    batches = [graphlib.stack([make_graph(seed=10)] * 2),
               graphlib.stack([make_graph(seed=11)] * 2)]
    t._batches = lambda dataset, rng=None: ((g, None) for g in batches)
    t._device_groups_for = lambda dataset: False

    refreshed = t._refresh_stats(variables["params"], bs0,
                                 jax.random.PRNGKey(7), passes=2)

    # manual reference: chain stats_step with the identical key schedule
    key = jax.random.PRNGKey(7)
    want = bs0
    for _ in range(2):
        for g in batches:
            key, sub = jax.random.split(key)
            want = t.stats_step(variables["params"], want, sub, g, tbl)
    assert jax.tree_util.tree_structure(refreshed) == jax.tree_util.tree_structure(bs0)
    for got, exp in zip(jax.tree.leaves(jax.device_get(refreshed)),
                        jax.tree.leaves(jax.device_get(want))):
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)
    # moved off the init stats, stayed finite
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), bs0, refreshed)))
    assert moved > 0.0
    for leaf in jax.tree.leaves(jax.device_get(refreshed)):
        assert np.isfinite(leaf).all()
