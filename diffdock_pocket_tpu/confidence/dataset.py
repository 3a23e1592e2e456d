"""Confidence-model dataset: generate poses with a frozen score model,
label them by RMSD, and serve (pose, label) training examples.

Parity targets (reference filtering/dataset.py):
- preprocessing: run `samples_per_complex` reverse diffusions per training
  complex with the frozen score model, store ligand (+ flexible side-chain)
  positions and their RMSD labels, cached per cache_creation_id
  (dataset.py:450-622);
- multiple generation rounds are combined by complex-name intersection
  (cache_ids_to_combine, dataset.py:210-318);
- get(): pick one sample, overwrite the graph's ligand/side-chain positions,
  label y = (rmsd < 2) & (sc_rmsd < 1), stamp t = 0 (dataset.py:341-448).

TPU note: this generation phase is the framework's flagship throughput win —
the jitted sampler makes the GPU-days-scale reference generation
(SURVEY.md §7.4) a batched on-device pipeline.
"""
from __future__ import annotations

import logging
import os
import pickle
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from .. import evaluation, graph as graphlib, sampling
from ..data.dataset import DockingDataset
from ..data.featurize import ComplexData
from ..pipeline import DockingPipeline

logger = logging.getLogger(__name__)


def load_affinity_index(path: str) -> dict[str, float]:
    """PDBBind ``INDEX_general_PL_data.2020`` -> {pdb code: -logKd/Ki}
    (reference filtering/dataset.py:332-337).  Lines look like
    ``3dpf  2.10  2008  5.52  Kd=3uM // 3dpf.pdf (...)``."""
    table: dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            if len(parts) >= 4:
                try:
                    table[parts[0]] = float(parts[3])
                except ValueError:
                    continue
    return table


@dataclass
class PoseSample:
    name: str
    lig_pos: np.ndarray  # [S, NL, 3]
    rmsds: np.ndarray  # [S]
    sc_pos: Optional[np.ndarray]  # [S, NA, 3] flexible-atom coords (full array)
    sc_rmsds: Optional[np.ndarray]  # [S]
    # reverse-diffusion trajectories for per-step confidence training
    # (reference trajectory_sampling, dataset.py:368-371): [steps, S, NL, 3]
    trajectory: Optional[np.ndarray] = None
    sc_trajectory: Optional[np.ndarray] = None  # [steps, S, NA, 3]


def generate_poses(
    pipe: DockingPipeline,
    dataset: DockingDataset,
    out_dir: str,
    cache_creation_id: int = 1,
    seed: int = 0,
    limit: int = 0,
) -> str:
    """Run the frozen score model over the dataset and store labeled poses.
    Returns the cache file path."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"poses_id{cache_creation_id}.pkl")
    if os.path.exists(path):
        logger.info("pose cache %s exists; skipping generation", path)
        return path

    key = jax.random.PRNGKey(seed + cache_creation_id)
    samples: dict[str, PoseSample] = {}
    n = 0
    for i in range(len(dataset)):
        if limit and n >= limit:
            break
        data = dataset.get(i)
        if data is None:
            continue
        key, sub = jax.random.split(key)
        try:
            result = pipe.dock(data, sub)
        except Exception as e:
            logger.warning("pose generation failed for %s: %s", data.name, e)
            continue
        n += 1
        nl = len(data.raw["lig_pos"])
        na = len(data.raw["atom_pos"])
        true = data.raw["lig_orig_pos"]
        S = result.lig_pos.shape[0]
        rmsds = np.asarray(
            [evaluation.rmsd(result.lig_pos[s][:nl], true) for s in range(S)]
        )
        sc_pos = sc_rmsds = None
        if data.raw["sc_bond_index"].size:
            sc_pos = result.atom_pos[:, :na]
            sc_rmsds = np.asarray(
                [
                    evaluation.sidechain_rmsds(
                        sc_pos[s], data.raw["atom_orig_pos"],
                        data.raw["sc_rotate_mask"], data.raw["sc_res_index"],
                    )[1]
                    for s in range(S)
                ]
            )
        traj = sc_traj = None
        if result.trajectory is not None:  # sampler ran with return_trajectory
            traj = np.asarray(result.trajectory[0])[:, :, :nl]
            if sc_pos is not None:
                sc_traj = np.asarray(result.trajectory[1])[:, :, :na]
        samples[data.name] = PoseSample(
            name=data.name,
            lig_pos=result.lig_pos[:, :nl],
            rmsds=rmsds,
            sc_pos=sc_pos,
            sc_rmsds=sc_rmsds,
            trajectory=traj,
            sc_trajectory=sc_traj,
        )
        logger.info(
            "poses %d/%d %s: rmsd best %.2f / median %.2f A",
            n, len(dataset), data.name, float(rmsds.min()),
            float(np.median(rmsds)),
        )
    with open(path, "wb") as fh:
        pickle.dump(samples, fh)
    logger.info("generated poses for %d complexes -> %s", len(samples), path)
    return path


def combine_pose_caches(paths: list[str]) -> dict[str, PoseSample]:
    """Merge several generation rounds; complexes present in every round
    (name intersection, reference dataset.py:210-318) get their samples
    concatenated."""
    caches = []
    for p in paths:
        with open(p, "rb") as fh:
            caches.append(pickle.load(fh))
    names = set(caches[0])
    for c in caches[1:]:
        names &= set(c)
    merged = {}
    # sorted: set iteration order is hash-seed dependent, which would make
    # the merged dataset order (and thus training batches) vary run-to-run
    for name in sorted(names):
        entries = [c[name] for c in caches]
        merged[name] = PoseSample(
            name=name,
            lig_pos=np.concatenate([e.lig_pos for e in entries]),
            rmsds=np.concatenate([e.rmsds for e in entries]),
            sc_pos=(
                np.concatenate([e.sc_pos for e in entries])
                if entries[0].sc_pos is not None
                else None
            ),
            sc_rmsds=(
                np.concatenate([e.sc_rmsds for e in entries])
                if entries[0].sc_rmsds is not None
                else None
            ),
            trajectory=(
                np.concatenate([e.trajectory for e in entries], axis=1)
                if getattr(entries[0], "trajectory", None) is not None
                else None
            ),
            sc_trajectory=(
                np.concatenate([e.sc_trajectory for e in entries], axis=1)
                if getattr(entries[0], "sc_trajectory", None) is not None
                else None
            ),
        )
    return merged


class FilteringDataset:
    """(pose, label) example source for confidence training.

    Labels: binary y = (rmsd < rmsd_cutoff) & (sc_rmsd < sc_rmsd_cutoff)
    (multi-cutoff binning supported via ``rmsd_classification_cutoff`` being
    a list, reference dataset.py:415-434)."""

    def __init__(
        self,
        dataset: DockingDataset,
        poses: dict[str, PoseSample],
        rmsd_classification_cutoff=2.0,
        sc_rmsd_classification_cutoff=1.0,
        balance: bool = False,
        affinities: Optional[dict[str, float]] = None,
        trajectory_sampling: bool = False,
        fixed_step: Optional[int] = None,
        parallel: int = 1,
    ):
        if balance and isinstance(rmsd_classification_cutoff, (list, tuple)):
            raise ValueError(
                "a list rmsd_classification_cutoff cannot be used with balance"
            )
        if parallel > 1 and (balance or trajectory_sampling):
            raise ValueError("parallel poses cannot be combined with "
                             "balance/trajectory_sampling")
        if trajectory_sampling:
            any_pose = next(iter(poses.values()))
            if any_pose.trajectory is None:
                raise ValueError(
                    "trajectory_sampling needs a pose cache generated with "
                    "store_trajectories (sampler return_trajectory)"
                )
        self.dataset = dataset
        self.poses = poses
        # number of distinct fixed_step values a trajectory sweep may use
        # (steps index trajectory[n_steps - step - 1], so valid steps are
        # 0..len(trajectory)-1); None without trajectories
        self.trajectory_steps = (
            len(next(iter(poses.values())).trajectory)
            if trajectory_sampling else None
        )
        self.rmsd_cutoff = rmsd_classification_cutoff
        self.sc_cutoff = sc_rmsd_classification_cutoff
        self.balance = balance
        self.affinities = affinities
        self.trajectory_sampling = trajectory_sampling
        self.fixed_step = fixed_step
        self.parallel = parallel
        self.index = [
            i
            for i in range(len(dataset))
            if str(dataset.df.iloc[i].get("complex_name", i)) in poses
        ]

    def __len__(self):
        return len(self.index)

    def label(self, rmsd: float, sc_rmsd: Optional[float]) -> float:
        if isinstance(self.rmsd_cutoff, (list, tuple)):
            # multi-cutoff class index
            return float(
                sum(rmsd >= c for c in sorted(self.rmsd_cutoff))
            )
        ok = rmsd < self.rmsd_cutoff
        if sc_rmsd is not None:
            ok = ok and (sc_rmsd < self.sc_cutoff)
        return float(ok)

    def get(self, idx: int, rng: np.random.Generator):
        """One training example: the complex graph with a sampled pose's
        positions written in, plus its label (and affinity when an index
        table was attached — NaN marks unknown).

        With ``trajectory_sampling`` the positions come from a random (or
        ``fixed_step``) reverse-diffusion step counted from the end —
        t = step/(steps-1), step 0 = final pose — while the label stays the
        FINAL pose's success (reference dataset.py:368-371): the model
        learns to predict from an intermediate pose whether the run will
        succeed."""
        data = self.dataset.get(self.index[idx])
        if data is None:
            return None
        pose = self.poses[data.name]
        raw = dict(data.raw)
        t = 0.0
        lig_src, sc_src = pose.lig_pos, pose.sc_pos
        if self.parallel > 1:
            # `parallel` pose replicas of the SAME complex: one graph per
            # pose, per-pose labels, the affinity head aggregates over the
            # group (reference filtering/dataset.py:348-366; like the
            # reference, flexible side chains are not supported here)
            if sc_src is not None and data.raw["sc_bond_index"].size:
                raise NotImplementedError(
                    "parallel poses are not implemented for flexible "
                    "sidechains (matches the reference)"
                )
            n = len(pose.rmsds)
            if self.parallel == n:
                idxs = np.arange(n)
            elif self.parallel < n:
                idxs = rng.choice(n, size=self.parallel, replace=False)
            else:
                raise ValueError("parallel size larger than sample count")
            datas, ys = [], []
            for s in idxs:
                r = dict(raw, lig_pos=lig_src[int(s)])
                datas.append(ComplexData(
                    raw=r, name=data.name, ligand=data.ligand,
                    receptor_arrays=data.receptor_arrays,
                    flex_residue_ids=data.flex_residue_ids,
                    pocket_center=data.pocket_center,
                ))
                ys.append(self.label(float(pose.rmsds[int(s)]), None))
            aff = (
                float(self.affinities.get(data.name, np.nan))
                if self.affinities is not None
                else float("nan")
            )
            return datas, np.asarray(ys, np.float32), aff, t
        if self.trajectory_sampling:
            n_steps = len(pose.trajectory)
            if self.fixed_step is not None and not (
                0 <= self.fixed_step < n_steps
            ):
                raise ValueError(
                    f"fixed_step={self.fixed_step} out of range for a "
                    f"{n_steps}-step trajectory cache (valid: 0..{n_steps - 1})"
                )
            step = (
                self.fixed_step
                if self.fixed_step is not None
                else int(rng.integers(n_steps))
            )
            t = step / max(n_steps - 1, 1)
            lig_src = pose.trajectory[n_steps - step - 1]
            if pose.sc_trajectory is not None:
                sc_src = pose.sc_trajectory[n_steps - step - 1]
        if self.balance:
            # pick the class first, then a sample of that class (reference
            # dataset.py:372-388); no successful pose -> keep the matched
            # (original) positions as the positive example
            y = float(rng.integers(2))
            success = np.asarray(pose.rmsds) < self.rmsd_cutoff
            if pose.sc_rmsds is not None:
                success &= np.asarray(pose.sc_rmsds) < self.sc_cutoff
            want = success if y > 0.5 else ~success
            cand = np.flatnonzero(want)
            if len(cand):
                s = int(cand[rng.integers(len(cand))])
                raw["lig_pos"] = lig_src[s]
                if sc_src is not None:
                    raw["atom_pos"] = sc_src[s]
            elif y <= 0.5:
                # every pose succeeded; any pose is wrong for label 0 — use
                # one anyway (reference keeps the complex, mislabel is rare)
                s = int(rng.integers(len(pose.rmsds)))
                raw["lig_pos"] = lig_src[s]
                if sc_src is not None:
                    raw["atom_pos"] = sc_src[s]
            # else: label 1 with no successful pose -> matched positions
        else:
            s = int(rng.integers(len(pose.rmsds)))
            raw["lig_pos"] = lig_src[s]
            if sc_src is not None:
                raw["atom_pos"] = sc_src[s]
            y = self.label(
                float(pose.rmsds[s]),
                float(pose.sc_rmsds[s]) if pose.sc_rmsds is not None else None,
            )
        aff = (
            float(self.affinities.get(data.name, np.nan))
            if self.affinities is not None
            else float("nan")
        )
        return ComplexData(
            raw=raw, name=data.name, ligand=data.ligand,
            receptor_arrays=data.receptor_arrays,
            flex_residue_ids=data.flex_residue_ids,
            pocket_center=data.pocket_center,
        ), y, aff, t
