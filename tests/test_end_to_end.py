"""Minimum end-to-end slice: 3dpf re-docking with a tiny random-init model.

Mirrors the reference smoke path (example_inference.sh): featurize the real
3dpf complex, run the full jitted reverse diffusion (randomize -> N steps ->
final poses), write ranked SDF + receptor PDB outputs, and check structural
invariants (bond lengths preserved — the manifold moves are rigid+torsional,
so the ligand's internal bond lengths must survive sampling exactly).
"""
import os

import jax
import numpy as np
import pytest

from diffdock_pocket_tpu import graph as graphlib
from diffdock_pocket_tpu import pipeline, sampling, visualise
from diffdock_pocket_tpu.data import featurize, sdf
from diffdock_pocket_tpu.models.config import ModelConfig

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
PROTEIN = os.path.join(EXAMPLE, "3dpf_protein.pdb")
LIGAND = os.path.join(EXAMPLE, "3dpf_ligand.sdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROTEIN), reason="3dpf example data not available"
)

TINY = ModelConfig(
    ns=8, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=8, cross_lig_atom_max_neighbors=8,
    low_precision_weights=False,
)


@pytest.fixture(scope="module")
def docked(tmp_path_factory):
    data = featurize.build_complex(LIGAND, PROTEIN, featurize.DataConfig(), name="3dpf")
    g1 = graphlib.from_raw(data.raw)
    g_ex = graphlib.replicate(g1, 2)
    variables = pipeline.init_random_variables(TINY, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=3, flexible_sidechains=True, return_trajectory=True
        ),
        samples_per_complex=2,
        batch_size=2,
    )
    result = pipe.dock(data, jax.random.PRNGKey(0))
    return data, result


def test_end_to_end_shapes_and_finiteness(docked):
    data, result = docked
    S = 2
    assert result.lig_pos.shape[0] == S
    assert np.all(np.isfinite(result.lig_pos))
    assert np.all(np.isfinite(result.atom_pos))
    assert result.trajectory is not None
    assert result.trajectory[0].shape[0] == 3  # steps


def test_bond_lengths_preserved(docked):
    """Rigid + torsional moves preserve ligand bond lengths exactly."""
    data, result = docked
    bond_idx = data.raw["lig_bond_index"]
    orig = data.raw["lig_pos"]
    ref_lengths = np.linalg.norm(orig[bond_idx[:, 0]] - orig[bond_idx[:, 1]], axis=1)
    for s in range(result.lig_pos.shape[0]):
        pos = result.lig_pos[s][: len(orig)]
        lengths = np.linalg.norm(pos[bond_idx[:, 0]] - pos[bond_idx[:, 1]], axis=1)
        np.testing.assert_allclose(lengths, ref_lengths, atol=1e-2)


def test_sidechain_moves_stay_in_residue(docked):
    """Side-chain sampling may only move atoms belonging to flexible chi
    subcomponents; all other receptor atoms must be untouched."""
    data, result = docked
    raw = data.raw
    na = len(raw["atom_pos"])
    movable = raw["sc_rotate_mask"].any(axis=0)
    frozen = ~movable
    for s in range(result.atom_pos.shape[0]):
        got = result.atom_pos[s][:na]
        np.testing.assert_allclose(
            got[frozen], raw["atom_pos"][frozen], atol=1e-4
        )
        # and at least one side-chain atom actually moved
        assert np.abs(got[movable] - raw["atom_pos"][movable]).max() > 1e-3


def test_pose_outputs_written(docked, tmp_path):
    data, result = docked
    nl = len(data.raw["lig_pos"])
    for rank in range(result.lig_pos.shape[0]):
        p = tmp_path / f"rank{rank + 1}.sdf"
        visualise.write_ligand_sdf(
            str(p), data.ligand, result.lig_pos[rank][:nl], result.center
        )
        mol = sdf.parse_sdf(str(p))
        assert mol.n_atoms == nl
    na = len(data.raw["atom_pos"])
    prot = tmp_path / "rank1_protein.pdb"
    visualise.write_receptor_with_sidechains(
        str(prot), data.receptor_arrays, result.atom_pos[0][:na], result.center
    )
    assert prot.exists() and prot.stat().st_size > 1000


def test_dock_many_batches_across_complexes():
    """dock_many: two same-bucket complexes share device batches; per-complex
    results keep shapes, sample counts, and confidence-descending ranking —
    and it runs sharded over the 8-device CPU test mesh."""
    from diffdock_pocket_tpu.models.config import CONFIDENCE_CONFIG
    import dataclasses

    data = featurize.build_complex(LIGAND, PROTEIN, featurize.DataConfig(), name="a")
    data_b = dataclasses.replace(data, name="b")
    g_ex = graphlib.replicate(graphlib.from_raw(data.raw), 4)
    variables = pipeline.init_random_variables(TINY, g_ex)
    conf_cfg = dataclasses.replace(
        TINY, confidence_mode=True, num_confidence_outputs=1, scale_by_sigma=False
    )
    conf_vars = pipeline.init_random_variables(conf_cfg, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2, flexible_sidechains=True),
        confidence_cfg=conf_cfg,
        confidence_variables=conf_vars,
        samples_per_complex=3,
        batch_size=4,  # 6 work rows -> chunks of 4 + 2 (mixed a/b rows)
    )
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("dp",))
    results = pipe.dock_many([data, data_b], jax.random.PRNGKey(1), mesh=mesh)
    assert [r.name for r in results] == ["a", "b"]
    for r in results:
        assert r.lig_pos.shape[0] == 3
        assert np.all(np.isfinite(r.lig_pos))
        assert r.confidence is not None and len(r.confidence) == 3
        assert np.all(np.diff(r.confidence) <= 1e-6)  # ranked descending


def test_dock_many_filtering_capacity_guard():
    """dock_many must reject filtering featurizations whose ligand capacity
    differs from the score graph (ADVICE r2: the lig_pos transfer in
    run_confidence is only coherent at matched capacities)."""
    import dataclasses

    data = featurize.build_complex(LIGAND, PROTEIN, featurize.DataConfig(), name="a")
    g_ex = graphlib.replicate(graphlib.from_raw(data.raw), 2)
    variables = pipeline.init_random_variables(TINY, g_ex)
    conf_cfg = dataclasses.replace(
        TINY, confidence_mode=True, num_confidence_outputs=1, scale_by_sigma=False
    )
    conf_vars = pipeline.init_random_variables(conf_cfg, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2, flexible_sidechains=True),
        confidence_cfg=conf_cfg,
        confidence_variables=conf_vars,
        samples_per_complex=2,
        batch_size=2,
    )
    # a filtering complex with a different (larger) ligand -> different
    # padded capacity after bucketing
    n = len(data.raw["lig_pos"])
    big = dict(data.raw)
    big["lig_pos"] = np.concatenate([big["lig_pos"]] * 3)
    big["lig_orig_pos"] = np.concatenate([big["lig_orig_pos"]] * 3)
    big["lig_feat"] = np.concatenate([big["lig_feat"]] * 3)
    filt = dataclasses.replace(data, raw=big)
    with pytest.raises(ValueError, match="capacity"):
        pipe.dock_many([data], jax.random.PRNGKey(0), filtering_datas=[filt])


def test_dock_many_tail_bucketing():
    """tail_rungs: the tail chunk of a shape group runs at a halved batch
    rung instead of being padded to full batch_size; results keep counts
    and finiteness."""
    import dataclasses

    data = featurize.build_complex(LIGAND, PROTEIN, featurize.DataConfig(), name="a")
    data_b = dataclasses.replace(data, name="b")
    g_ex = graphlib.replicate(graphlib.from_raw(data.raw), 4)
    variables = pipeline.init_random_variables(TINY, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=TINY,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2, flexible_sidechains=True),
        samples_per_complex=3,
        batch_size=4,  # 6 work rows -> chunk of 4 + tail of 2
    )
    seen = []
    orig = pipe._run

    def spy(key, g, variables):
        seen.append(g.lig_pos.shape[0])
        return orig(key, g, variables)

    pipe._run = spy
    results = pipe.dock_many([data, data_b], jax.random.PRNGKey(0), tail_rungs=2)
    assert seen == [4, 2]  # tail ran at the halved rung, not padded to 4
    for r in results:
        assert r.lig_pos.shape[0] == 3
        assert np.all(np.isfinite(r.lig_pos))

    # without tail_rungs the same job pads the tail to the full batch
    seen.clear()
    pipe.dock_many([data, data_b], jax.random.PRNGKey(0))
    assert seen == [4, 4]


def test_step_loop_matches_scan(docked):
    """Step-loop mode (one jitted step dispatched from the host) must
    reproduce the scanned sampler bit-for-bit in math terms: same key,
    same step function, same schedule — only the executable granularity
    differs (the whole-scan TPU compile is a schedule lottery,
    BASELINE.md; the step body alone compiles consistently)."""
    import dataclasses as dc

    data, result = docked
    g1 = graphlib.from_raw(data.raw)
    g_ex = graphlib.replicate(g1, 2)
    variables = pipeline.init_random_variables(TINY, g_ex)

    def make_pipe(step_loop, skip=0):
        return pipeline.DockingPipeline(
            model_cfg=TINY,
            variables=variables,
            sampler_cfg=sampling.SamplerConfig(
                inference_steps=3, flexible_sidechains=True,
                return_trajectory=True, step_loop=step_loop,
                skip_intra_steps=skip,
            ),
            samples_per_complex=2,
            batch_size=2,
        )

    r_scan = make_pipe(False).dock(data, jax.random.PRNGKey(7))
    r_loop = make_pipe(True).dock(data, jax.random.PRNGKey(7))
    np.testing.assert_allclose(r_loop.lig_pos, r_scan.lig_pos, atol=2e-4)
    np.testing.assert_allclose(r_loop.atom_pos, r_scan.atom_pos, atol=2e-4)
    assert r_loop.trajectory[0].shape == r_scan.trajectory[0].shape
    np.testing.assert_allclose(
        r_loop.trajectory[0], r_scan.trajectory[0], atol=2e-4)

    # skip_intra wiring (k0 split, schedule indexing, key threading): the
    # full-pipeline scan-vs-loop comparison is NOT run here because the
    # reverse SDE at random weights is a chaotic map — the monolithic
    # jit(_run_batch) fuses randomize+both scans into one executable whose
    # ~1e-7 rounding differences amplify to ~0.1 A over 3 steps (verified:
    # eager, jit-scan and step-loop each give a third answer).  Instead the
    # loop path is checked against a hand-rolled reference using the SAME
    # jitted step executables, which must match exactly.
    pl = make_pipe(True, skip=1)
    g1 = graphlib.from_raw(data.raw)
    g = graphlib.replicate(g1, 2)
    key = jax.random.PRNGKey(3)
    g_run, _ = pl._run(key, g, pl.variables)

    k1, k2 = jax.random.split(key)
    carry = (pl._rand_jit(k1, g), k2)
    for i in range(3):
        fn = pl._step_early_jit if i < 1 else pl._step_jit
        carry, _ = fn(
            carry, (pl._t_all[i], pl._dt_all[i], pl._is_last[i]),
            pl.variables)
    np.testing.assert_array_equal(
        np.asarray(g_run.lig_pos), np.asarray(carry[0].lig_pos))
    np.testing.assert_array_equal(
        np.asarray(g_run.atom_pos), np.asarray(carry[0].atom_pos))
