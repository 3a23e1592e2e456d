"""Integration test of the confidence (filtering) stack on synthetic data:
pose generation with a frozen tiny score model -> cache combination ->
FilteringDataset labeling -> one confidence-training epoch."""
import dataclasses
import os

import jax
import numpy as np
import pandas as pd
import pytest

from diffdock_pocket_tpu import graph as graphlib, pipeline, sampling
from diffdock_pocket_tpu.confidence.dataset import (
    FilteringDataset, PoseSample, combine_pose_caches, generate_poses,
)
from diffdock_pocket_tpu.confidence.train import ConfidenceTrainer, roc_auc
from diffdock_pocket_tpu.models.config import ModelConfig

from synthetic import make_raw_complex, SMALL_BUCKETS

TINY = ModelConfig(
    ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    low_precision_weights=False,
)


class FakeDataset:
    """DockingDataset-compatible wrapper over synthetic complexes."""

    def __init__(self, n=3):
        from diffdock_pocket_tpu.data.featurize import ComplexData
        from diffdock_pocket_tpu.data.mol import Bond, Molecule

        self.items = []
        names = []
        for i in range(n):
            raw = make_raw_complex(seed=i)
            mol = Molecule(
                ["C"] * len(raw["lig_pos"]), raw["lig_pos"],
                [Bond(a, b, 1) for a, b in raw["lig_bond_index"][::2]],
            )
            self.items.append(
                ComplexData(
                    raw=raw, name=f"cplx{i}", ligand=mol, receptor_arrays=None,
                    flex_residue_ids=[], pocket_center=np.zeros(3),
                )
            )
            names.append(f"cplx{i}")
        self.df = pd.DataFrame({"complex_name": names})

    def __len__(self):
        return len(self.items)

    def get(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def pose_caches(tmp_path_factory):
    ds = FakeDataset(3)
    g_ex = graphlib.replicate(graphlib.from_raw(ds.items[0].raw, SMALL_BUCKETS), 2)
    variables = pipeline.init_random_variables(TINY, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY, variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2),
        samples_per_complex=2, batch_size=2, buckets=SMALL_BUCKETS,
    )
    out = str(tmp_path_factory.mktemp("poses"))
    p1 = generate_poses(pipe, ds, out, cache_creation_id=1, seed=0)
    p2 = generate_poses(pipe, ds, out, cache_creation_id=2, seed=1)
    return ds, [p1, p2]


def test_pose_generation_and_combination(pose_caches):
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    assert len(merged) == 3
    for name, sample in merged.items():
        assert sample.lig_pos.shape[0] == 4  # 2 rounds x 2 samples
        assert sample.rmsds.shape == (4,)
        assert np.all(np.isfinite(sample.rmsds))
        assert sample.sc_rmsds is not None


def test_filtering_dataset_labels(pose_caches):
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged, rmsd_classification_cutoff=2.0)
    assert len(fd) == 3
    rng = np.random.default_rng(0)
    ex = fd.get(0, rng)
    assert ex is not None
    data, y, aff, t = ex
    assert y in (0.0, 1.0)
    assert np.isnan(aff) and t == 0.0  # no affinity table, no trajectories
    # the pose positions were written into the graph
    assert data.raw["lig_pos"].shape == ds.items[0].raw["lig_pos"].shape


def test_confidence_training_epoch(pose_caches, tmp_path):
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged)
    cfg = dataclasses.replace(TINY, confidence_mode=True)
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf"), batch_size=2,
    )
    # patch buckets for synthetic sizes
    import diffdock_pocket_tpu.data.dataset as dsmod

    params, batch_stats = trainer.fit(n_epochs=1)
    assert params is not None
    assert os.path.exists(str(tmp_path / "conf" / "model_parameters.yml"))


def test_val_multiplicity_repeats_val_pass(pose_caches, tmp_path):
    """val_multiplicity=k runs the per-epoch val loop k times with fresh
    pose draws, stabilising val_roc_auc on small val sets."""
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged)
    cfg = dataclasses.replace(TINY, confidence_mode=True)
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf_vm"), batch_size=2,
        val_multiplicity=3,
    )
    calls = {"n": 0}
    orig = trainer._step_eval

    def counting_eval(*a):
        calls["n"] += 1
        return orig(*a)

    # count the per-batch dispatcher (_step_eval) — the jitted kernels
    # underneath only re-enter Python at trace time
    trainer._step_eval = counting_eval
    trainer.fit(n_epochs=1)
    single = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf_vm1"), batch_size=2,
    )
    calls1 = {"n": 0}
    orig1 = single._step_eval

    def counting_eval1(*a):
        calls1["n"] += 1
        return orig1(*a)

    single._step_eval = counting_eval1
    single.fit(n_epochs=1)
    assert calls["n"] == 3 * calls1["n"] > 0


def test_roc_auc():
    labels = np.asarray([1, 1, 0, 0])
    assert roc_auc(labels, np.asarray([0.9, 0.8, 0.2, 0.1])) == 1.0
    assert roc_auc(labels, np.asarray([0.1, 0.2, 0.8, 0.9])) == 0.0
    assert abs(roc_auc(labels, np.asarray([0.5, 0.5, 0.5, 0.5])) - 0.5) < 1e-9


def test_balance_sampling(pose_caches):
    """balance=True picks the label first, then a pose of that class
    (reference filtering/dataset.py:372-388)."""
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged, rmsd_classification_cutoff=2.0,
                          sc_rmsd_classification_cutoff=1.0, balance=True)
    rng = np.random.default_rng(0)
    labels = [fd.get(i % 3, rng)[1] for i in range(40)]
    # labels are coin flips, not pose-success rates
    assert 0.2 < np.mean(labels) < 0.8
    with pytest.raises(ValueError):
        FilteringDataset(ds, merged, rmsd_classification_cutoff=[1.0, 2.0],
                         balance=True)


def test_affinity_labels_and_training(pose_caches, tmp_path):
    """Affinity index parsing + joint confidence/affinity training epoch
    (reference filtering_train.py:184-206 affinity MSE path)."""
    from diffdock_pocket_tpu.confidence.dataset import load_affinity_index

    idx_path = tmp_path / "INDEX_test.2020"
    idx_path.write_text(
        "# comment line\n"
        "cplx0  2.10  2008  5.52  Kd=3uM // cplx0.pdf (ligand)\n"
        "cplx1  1.90  2010  7.10  Ki=80nM // cplx1.pdf (ligand)\n"
    )
    aff = load_affinity_index(str(idx_path))
    assert aff == {"cplx0": 5.52, "cplx1": 7.10}

    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged, affinities=aff)
    ex = fd.get(0, np.random.default_rng(0))
    assert len(ex) == 4 and ex[2] == 5.52
    # cplx2 missing from the index -> NaN marker
    assert np.isnan(fd.get(2, np.random.default_rng(0))[2])

    cfg = dataclasses.replace(TINY, confidence_mode=True, affinity_prediction=True)
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf_aff"), batch_size=2,
    )
    params, _ = trainer.fit(n_epochs=1)
    assert params is not None


def test_affinity_standardization(pose_caches, tmp_path):
    """With affinity_norm set to the train-label stats the head trains on
    z-scores but val_affinity_mse is reported in LABEL units: a fresh head
    (output ~0 = predict-the-mean) must report ~label-variance MSE, not the
    ~mean^2 it would if the un-standardization were missing."""
    import json

    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    aff = {"cplx0": 5.52, "cplx1": 7.10, "cplx2": 6.2}
    labels = np.asarray(list(aff.values()))
    fd = FilteringDataset(ds, merged, affinities=aff)
    cfg = dataclasses.replace(
        TINY, confidence_mode=True, affinity_prediction=True,
        affinity_norm=(float(labels.mean()), float(labels.std())),
    )
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf_aff_std"), batch_size=2,
    )
    trainer.fit(n_epochs=1)
    with open(tmp_path / "conf_aff_std" / "metrics.jsonl") as fh:
        m = json.loads(fh.readlines()[-1])
    # label variance ~0.43, mean^2 ~39: anything < 10 proves label units
    assert 0.0 <= m["val_affinity_mse"] < 10.0

    # the persisted yml round-trips the norm (inference relies on it)
    from diffdock_pocket_tpu.utils import checkpoint as ckptlib

    cfg2 = ckptlib.load_yaml_config(str(tmp_path / "conf_aff_std"))
    assert tuple(cfg2.affinity_norm) == cfg.affinity_norm


def test_split_confidence_output_unstandardizes():
    """pipeline.split_confidence_output maps z-score affinity outputs back
    to label units via cfg.affinity_norm."""
    from types import SimpleNamespace

    from diffdock_pocket_tpu.pipeline import split_confidence_output

    cfg = SimpleNamespace(affinity_prediction=True, affinity_norm=(6.0, 2.0))
    out = np.asarray([[0.3, 1.0], [-0.1, -0.5]])
    c, a = split_confidence_output(out, cfg)
    assert np.allclose(c, [0.3, -0.1]) and np.allclose(a, [8.0, 5.0])


def test_metrics_history_fresh_per_fit(pose_caches, tmp_path):
    """Relaunching fit() into the same run_dir must not append to the
    previous run's metrics.jsonl (reports read first/last/count from it)."""
    import json

    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged)
    cfg = dataclasses.replace(TINY, confidence_mode=True)
    run_dir = str(tmp_path / "conf_refit")
    for _ in range(2):
        trainer = ConfidenceTrainer(cfg, fd, fd, run_dir=run_dir, batch_size=2)
        trainer.fit(n_epochs=1)
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        lines = [json.loads(l) for l in fh]
    assert len(lines) == 1 and lines[0]["epoch"] == 0


def test_trajectory_sampling(tmp_path):
    """Trajectory-step confidence training: pose cache stores trajectories,
    get() serves an intermediate step with t = step/(steps-1) while the
    label remains final-pose success; one training epoch runs with the
    per-example t stamped (reference dataset.py:368-371)."""
    ds = FakeDataset(2)
    g_ex = graphlib.replicate(graphlib.from_raw(ds.items[0].raw, SMALL_BUCKETS), 2)
    variables = pipeline.init_random_variables(TINY, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY, variables=variables,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=3, flexible_sidechains=True, return_trajectory=True
        ),
        samples_per_complex=2, batch_size=2, buckets=SMALL_BUCKETS,
    )
    from diffdock_pocket_tpu.confidence.dataset import generate_poses as gen

    out = str(tmp_path / "traj_poses")
    path = gen(pipe, ds, out, cache_creation_id=1, seed=0)
    merged = combine_pose_caches([path])
    sample = next(iter(merged.values()))
    assert sample.trajectory is not None
    n_steps = sample.trajectory.shape[0]
    assert sample.trajectory.shape[1] == 2  # S

    # without trajectories in the cache the flag must be rejected
    fd_plain = FilteringDataset(ds, {
        k: PoseSample(v.name, v.lig_pos, v.rmsds, v.sc_pos, v.sc_rmsds)
        for k, v in merged.items()
    })
    with pytest.raises(ValueError):
        FilteringDataset(ds, fd_plain.poses, trajectory_sampling=True)

    fd = FilteringDataset(ds, merged, trajectory_sampling=True)
    rng = np.random.default_rng(0)
    ts = {fd.get(i % 2, rng)[3] for i in range(20)}
    assert len(ts) > 1 and all(0.0 <= t <= 1.0 for t in ts)
    # fixed_step=0 serves the FINAL pose at t=0
    fd0 = FilteringDataset(ds, merged, trajectory_sampling=True, fixed_step=0)
    data, y, _, t = fd0.get(0, rng)
    assert t == 0.0
    name = data.name
    final = merged[name].trajectory[-1]
    assert any(np.allclose(data.raw["lig_pos"], final[s], atol=1e-5)
               for s in range(final.shape[0]))

    # the sweep length comes from the cache, and out-of-range fixed_step
    # raises instead of silently wrapping to trajectory[-1] with t > 1
    assert fd.trajectory_steps == n_steps
    fd_bad = FilteringDataset(ds, merged, trajectory_sampling=True,
                              fixed_step=n_steps)
    with pytest.raises(ValueError, match="out of range"):
        fd_bad.get(0, rng)

    cfg = dataclasses.replace(TINY, confidence_mode=True)
    trainer = ConfidenceTrainer(cfg, fd, fd0, run_dir=str(tmp_path / "conf_traj"),
                                batch_size=2)
    params, batch_stats = trainer.fit(n_epochs=1)
    assert params is not None

    # .test() sweeps exactly the cache's trajectory steps (n_steps files)
    out_dir = str(tmp_path / "traj_test_out")
    trainer.test(fd, params, batch_stats, out_dir=out_dir)
    import glob

    step_files = sorted(glob.glob(os.path.join(out_dir, "val_eval_step*.npz")))
    assert len(step_files) == n_steps


def test_parallel_confidence_training(tmp_path):
    """`parallel` pose groups end to end: dataset serves P poses per complex
    with per-pose labels, the model's affinity head aggregates over the
    group (reference filtering/dataset.py:348-366 +
    all_atom_score_model.py:346-352)."""
    rigid = dataclasses.replace(TINY, flexible_sidechains=False)

    class RigidDataset(FakeDataset):
        def __init__(self, n=2):
            from diffdock_pocket_tpu.data.featurize import ComplexData
            from diffdock_pocket_tpu.data.mol import Bond, Molecule

            self.items = []
            names = []
            for i in range(n):
                raw = make_raw_complex(seed=i, n_sc=0)
                mol = Molecule(
                    ["C"] * len(raw["lig_pos"]), raw["lig_pos"],
                    [Bond(a, b, 1) for a, b in raw["lig_bond_index"][::2]],
                )
                self.items.append(ComplexData(
                    raw=raw, name=f"cplx{i}", ligand=mol, receptor_arrays=None,
                    flex_residue_ids=[], pocket_center=np.zeros(3),
                ))
                names.append(f"cplx{i}")
            self.df = pd.DataFrame({"complex_name": names})

    ds = RigidDataset(2)
    g_ex = graphlib.replicate(graphlib.from_raw(ds.items[0].raw, SMALL_BUCKETS), 3)
    variables = pipeline.init_random_variables(rigid, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=rigid, variables=variables,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=2, flexible_sidechains=False),
        samples_per_complex=3, batch_size=3, buckets=SMALL_BUCKETS,
    )
    out = str(tmp_path / "poses")
    path = generate_poses(pipe, ds, out, cache_creation_id=1, seed=0)
    merged = combine_pose_caches([path])

    affinities = {"cplx0": 5.0, "cplx1": 7.0}
    fd = FilteringDataset(ds, merged, parallel=2, affinities=affinities)
    rng = np.random.default_rng(0)
    datas, ys, aff, t = fd.get(0, rng)
    assert len(datas) == 2 and ys.shape == (2,)
    # the two poses differ
    assert not np.allclose(datas[0].raw["lig_pos"], datas[1].raw["lig_pos"])

    cfg = dataclasses.replace(
        rigid, confidence_mode=True, parallel=2, affinity_prediction=True,
    )
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf"), batch_size=2,
        parallel=2,
    )
    params, batch_stats = trainer.fit(n_epochs=1)
    assert params is not None


def test_split_confidence_output_variants():
    """Ranking-score extraction from raw confidence outputs: plain [S],
    affinity-head [S, 2] (last col = affinity), binned [S, K] (rank by the
    first logit, reference inference.py:212-213)."""
    from types import SimpleNamespace

    from diffdock_pocket_tpu.pipeline import split_confidence_output

    plain = np.asarray([0.3, -0.1, 0.5])
    c, a = split_confidence_output(plain, None)
    assert a is None and np.array_equal(c, plain)

    aff_cfg = SimpleNamespace(affinity_prediction=True)
    two = np.asarray([[0.3, 5.0], [-0.1, 6.0]])
    c, a = split_confidence_output(two, aff_cfg)
    assert np.allclose(c, [0.3, -0.1]) and np.allclose(a, [5.0, 6.0])

    binned_cfg = SimpleNamespace(affinity_prediction=False)
    binned = np.asarray([[0.9, 0.1, 0.0], [0.2, 0.5, 0.3]])
    c, a = split_confidence_output(binned, binned_cfg)
    assert np.allclose(c, [0.9, 0.2]) and a is None

    c, a = split_confidence_output(None, None)
    assert c is None and a is None


def test_parallel_without_affinity_rejected(tmp_path):
    """parallel > 1 without affinity_prediction must fail fast with a clear
    error (the parallel aggregators only feed the affinity head; without
    this check the loss broadcast fails at jit trace time)."""
    rigid = dataclasses.replace(
        TINY, confidence_mode=True, parallel=2, affinity_prediction=False,
    )
    with pytest.raises(ValueError, match="affinity_prediction"):
        ConfidenceTrainer(
            rigid, train_data=None, val_data=None,
            run_dir=str(tmp_path / "run"), parallel=2,
        )


def test_evaluate_and_test_eval_only(pose_caches, tmp_path):
    """ConfidenceTrainer.evaluate / .test back the --no_train/--test
    eval-only CLI mode (reference filtering_train.py:160-162, 384-419):
    metrics come back finite and the npz artifacts are written."""
    ds, paths = pose_caches
    merged = combine_pose_caches(paths)
    fd = FilteringDataset(ds, merged)
    cfg = dataclasses.replace(TINY, confidence_mode=True)
    trainer = ConfidenceTrainer(
        cfg, fd, fd, run_dir=str(tmp_path / "conf"), batch_size=2,
    )
    params, batch_stats = trainer.fit(n_epochs=1)
    metrics, scores, labels = trainer.evaluate(
        fd, params, batch_stats, multiplicity=2
    )
    assert np.isfinite(metrics["loss"])
    assert len(scores) == len(labels) > 0
    out = trainer.test(fd, params, batch_stats,
                       out_dir=str(tmp_path / "test_out"), multiplicity=1)
    assert np.isfinite(out["loss"])
    assert os.path.exists(str(tmp_path / "test_out" / "val_eval.npz"))
