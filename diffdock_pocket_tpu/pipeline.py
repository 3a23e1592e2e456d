"""End-to-end docking pipeline: featurized complex -> ranked poses.

Orchestration parity with the reference inference flow
(inference.py:106-291 infer_single_complex): replicate the complex
``samples_per_complex`` times, randomize at t=1, run the reverse diffusion,
score with the confidence model at t=0, rank.

TPU-native structure: one jit per bucket covers the *entire* reverse loop
(20 steps x model forward x conformer updates); samples are processed in
micro-batches sized to HBM.  The host only featurizes once and writes files.
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import graph as graphlib
from . import sampling, tables
from .data.featurize import ComplexData
from .diffusion import SigmaConfig
from .models.config import ModelConfig
from .models.score_model import get_model
from .sampling import SamplerConfig

logger = logging.getLogger(__name__)


@dataclass
class DockingResult:
    name: str
    lig_pos: np.ndarray  # [S, NL, 3] pocket frame, ranked by confidence
    atom_pos: np.ndarray  # [S, NA, 3] ranked
    confidence: Optional[np.ndarray]  # [S] ranked (None without a confidence model)
    center: np.ndarray  # [3] pocket center (add to get original frame)
    lig_mask: np.ndarray
    atom_mask: np.ndarray
    trajectory: Optional[tuple] = None  # (lig [steps,S,NL,3], atom [steps,S,NA,3])
    affinity: Optional[np.ndarray] = None  # [S] ranked (affinity-head models)


def split_confidence_output(conf: Optional[np.ndarray], conf_cfg) -> tuple:
    """Raw confidence-model output -> (ranking score [S], affinity [S]|None).

    Affinity-head models append a last column (confidence/train.py
    _split_affinity); multi-cutoff (binned) models rank by the first logit
    (reference inference.py:212-213 confidence[:, 0])."""
    if conf is None:
        return None, None
    aff = None
    if conf.ndim == 2 and getattr(conf_cfg, "affinity_prediction", False):
        aff = conf[:, -1]
        # the head predicts z-scores of the train labels
        # (ModelConfig.affinity_norm); emit label units
        mean, std = getattr(conf_cfg, "affinity_norm", (0.0, 1.0)) or (0.0, 1.0)
        aff = aff * std + mean
        conf = conf[:, :-1]
        if conf.shape[-1] == 1:
            conf = conf[:, 0]
    if conf.ndim == 2:
        conf = conf[:, 0]
    return conf, aff


class DockingPipeline:
    """Holds the score (and optional confidence) model with their weights and
    exposes ``dock(complex_data, key)``."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        variables,
        sampler_cfg: SamplerConfig,
        confidence_cfg: Optional[ModelConfig] = None,
        confidence_variables=None,
        samples_per_complex: int = 10,
        batch_size: int = 10,
        sigma_schedule: str = "expbeta",
        inf_sched_alpha: float = 1,
        inf_sched_beta: float = 1,
        buckets: Optional[dict] = None,
        schedule_steps: Optional[int] = None,  # full schedule length when
        # running only the first inference_steps of it (--actual_steps)
        schedules: Optional[dict] = None,  # explicit full per-manifold
        # schedules {manifold: [schedule_steps]}; overrides sigma_schedule
        manifold_alphas: Optional[dict] = None,  # {"tr": (a, b), ...} for
        # asynchronous inverse-Beta schedules (reference training.py:263-267)
    ):
        self.model_cfg = model_cfg
        self.variables = variables
        self.sampler_cfg = sampler_cfg
        self.confidence_cfg = confidence_cfg
        self.confidence_variables = confidence_variables
        self.samples_per_complex = samples_per_complex
        self.batch_size = batch_size
        self.buckets = buckets
        self.model = get_model(model_cfg)
        # reduced (no rec/atom-intra) variant for the high-sigma steps;
        # weight-compatible with the full model (see ModelConfig.skip_heavy_intra)
        self.skip_model = (
            get_model(dataclasses.replace(model_cfg, skip_heavy_intra=True))
            if sampler_cfg.skip_intra_steps > 0 and model_cfg.all_atoms
            else None
        )
        self.confidence_model = (
            get_model(confidence_cfg) if confidence_cfg is not None else None
        )
        self._so3 = tables.so3_tables()
        self._torus = tables.torus_tables()
        if schedules is None:
            schedules = sampling.make_schedules(
                sigma_schedule, schedule_steps or sampler_cfg.inference_steps,
                inf_sched_alpha, inf_sched_beta,
                asyncronous=getattr(model_cfg, "asyncronous_noise_schedule", False),
                manifold_alphas=manifold_alphas,
            )
        n = sampler_cfg.inference_steps
        self.schedule = {k: v[:n] for k, v in schedules.items()}
        self.schedule_next = {
            k: jnp.concatenate([v[1:], jnp.zeros((1,))])[:n]
            for k, v in schedules.items()
        }
        self._run_jit = jax.jit(self._run_batch)
        self._conf_jit = jax.jit(self._run_confidence) if self.confidence_model else None
        # step-loop mode: jit ONE reverse step and dispatch it
        # inference_steps times from the host instead of compiling the
        # whole lax.scan.  XLA's TPU compile of the 20-step scan is a
        # schedule lottery (~146-410 ms/step for the same program,
        # BASELINE.md) while the step body alone compiles consistently;
        # dispatch is async, so the host loop adds only queueing time.
        # Opt-in via SamplerConfig.step_loop or DDP_TPU_SAMPLER_LOOP=1.
        import os as _os

        env_loop = _os.environ.get("DDP_TPU_SAMPLER_LOOP")
        self._step_loop = (
            env_loop == "1" if env_loop in ("0", "1")
            else bool(getattr(sampler_cfg, "step_loop", True)))
        self._sched_keys, self._t_all, self._dt_all, self._is_last = (
            sampling.reverse_schedule_arrays(
                self.schedule, self.schedule_next, sampler_cfg.inference_steps))
        # host-resident schedule rows for the step loop: eager jnp indexing
        # (t_all[i]) compiles one tiny executable PER INDEX CONSTANT, which
        # costs seconds each over the axon remote-compile tunnel (measured:
        # 386 s warmup, ~530 extra cache entries); numpy rows dispatch with
        # zero device compiles
        self._t_np = np.asarray(self._t_all)
        self._dt_np = np.asarray(self._dt_all)
        self._is_last_np = np.asarray(self._is_last)
        self._sched_rows = None  # device-staged on first _run_loop call
        self._rand_jit = jax.jit(self._randomize)
        # device-side chunk assembly for dock_many: gather batch rows out of
        # a group's device-resident graph stack instead of re-stacking (and
        # re-uploading) host graphs per chunk — on the 1-core host the eager
        # per-chunk jnp.stack was ~40 ms/pose of serial overhead
        self._gather_jit = jax.jit(graphlib.index)
        self._step_jit = jax.jit(self._step_call)
        self._step_early_jit = (
            jax.jit(self._step_call_early) if self.skip_model is not None else None)
        self._run = self._run_loop if self._step_loop else (
            lambda key, g, variables: self._run_jit(key, g, variables))

    # ------------------------------------------------------------------
    def _score_norms(self, t):
        sig = self.model_cfg.sigma
        _, s_rot, s_tor, s_sc = sig.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
        return {
            "rot": self._so3.score_norm(s_rot),
            "tor": self._torus.score_norm(s_tor),
            "sc_tor": self._torus.score_norm(s_sc),
        }

    def _run_batch(self, key, g, variables):
        # variables are an explicit jit argument (donated weights would
        # otherwise be baked into the executable as constants)
        def score_fn(gr, t):
            return self.model.apply(variables, gr, t, self._score_norms(t))

        score_fn_early = None
        if self.skip_model is not None:
            def score_fn_early(gr, t):
                return self.skip_model.apply(variables, gr, t, self._score_norms(t))

        k1, k2 = jax.random.split(key)
        g = sampling.randomize_position(
            k1, g, self.model_cfg.sigma,
            no_torsion=self.sampler_cfg.no_torsion,
            no_random=self.sampler_cfg.no_random,
            flexible_sidechains=self.sampler_cfg.flexible_sidechains,
        )
        return sampling.reverse_diffusion(
            k2, g, score_fn, self.schedule, self.model_cfg.sigma,
            self.sampler_cfg, self.schedule_next,
            score_fn_early=score_fn_early,
        )

    def _randomize(self, key, g):
        return sampling.randomize_position(
            key, g, self.model_cfg.sigma,
            no_torsion=self.sampler_cfg.no_torsion,
            no_random=self.sampler_cfg.no_random,
            flexible_sidechains=self.sampler_cfg.flexible_sidechains,
        )

    def _step_call(self, carry, inp, variables):
        def score_fn(gr, t):
            return self.model.apply(variables, gr, t, self._score_norms(t))

        step = sampling.make_reverse_step(
            score_fn, self.model_cfg.sigma, self.sampler_cfg, self._sched_keys)
        return step(carry, inp)

    def _step_call_early(self, carry, inp, variables):
        def score_fn(gr, t):
            return self.skip_model.apply(variables, gr, t, self._score_norms(t))

        step = sampling.make_reverse_step(
            score_fn, self.model_cfg.sigma, self.sampler_cfg, self._sched_keys)
        return step(carry, inp)

    def _run_loop(self, key, g, variables):
        """Step-loop equivalent of _run_batch: same math, one executable
        per step body instead of one whole-scan executable."""
        k1, k2 = jax.random.split(key)
        g = self._rand_jit(k1, g)
        carry = (g, k2)
        steps = self.sampler_cfg.inference_steps
        k0 = (self.sampler_cfg.skip_intra_steps
              if self._step_early_jit is not None else 0)
        k0 = max(0, min(int(k0), steps))
        if self._sched_rows is None:
            # one-time device staging (device_put compiles nothing)
            self._sched_rows = [
                (jax.device_put(self._t_np[i]), jax.device_put(self._dt_np[i]),
                 jax.device_put(self._is_last_np[i]))
                for i in range(steps)
            ]
        traj = [] if self.sampler_cfg.return_trajectory else None
        for i in range(steps):
            fn = self._step_early_jit if i < k0 else self._step_jit
            carry, ys = fn(carry, self._sched_rows[i], variables)
            if traj is not None:
                traj.append(ys)
        g_final = carry[0]
        traj_out = None
        if traj is not None:
            traj_out = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *traj)
        return g_final, traj_out

    def _run_confidence(self, g, conf_variables, filtering_graph=None):
        def conf_fn(gr, t):
            return self.confidence_model.apply(conf_variables, gr, t)

        return sampling.run_confidence(g, conf_fn, filtering_graph=filtering_graph)

    # ------------------------------------------------------------------
    def dock(self, data: ComplexData, key: jax.Array,
             filtering_data: Optional[ComplexData] = None) -> DockingResult:
        """``filtering_data`` carries the same complex featurized with the
        confidence model's graph parameters when they differ from the score
        model's (reference inference.py:396-429 second PDBBind +
        sampling.py:268-274 ligand-position transfer)."""
        g1 = graphlib.from_raw(data.raw, buckets=self.buckets)
        gf1 = None
        if filtering_data is not None and self._conf_jit is not None:
            gf1 = graphlib.from_raw(filtering_data.raw, buckets=self.buckets)
            if gf1.lig_pos.shape != g1.lig_pos.shape:
                raise ValueError(
                    "filtering graph ligand capacity differs from the score "
                    f"graph ({gf1.lig_pos.shape} vs {g1.lig_pos.shape})"
                )
        S = self.samples_per_complex
        bs = min(self.batch_size, S)
        n_chunks = math.ceil(S / bs)

        lig_out, atom_out, confs, trajs = [], [], [], []
        keys = jax.random.split(key, n_chunks)
        for c in range(n_chunks):
            g = graphlib.replicate(g1, bs)
            g_final, traj = self._run(keys[c], g, self.variables)
            if self._conf_jit is not None:
                gf = graphlib.replicate(gf1, bs) if gf1 is not None else None
                confs.append(np.asarray(
                    self._conf_jit(g_final, self.confidence_variables, gf)
                ))
            lig_out.append(np.asarray(g_final.lig_pos))
            atom_out.append(np.asarray(g_final.atom_pos))
            if traj is not None:
                trajs.append(jax.device_get(traj))

        lig_pos = np.concatenate(lig_out)[:S]
        atom_pos = np.concatenate(atom_out)[:S]
        conf = np.concatenate(confs)[:S] if confs else None
        conf, aff = split_confidence_output(conf, self.confidence_cfg)
        trajectory = None
        if trajs:
            trajectory = tuple(np.concatenate([t[i] for t in trajs], axis=1)[:, :S] for i in range(2))

        if conf is not None:
            order = np.argsort(-conf)
        else:
            order = np.arange(S)
        # fetch ONLY the two masks (a few hundred bytes) — device_get of the
        # whole graph pytree pulls the ESM features (~1 MB) back through the
        # tunnel per complex for no reason
        return DockingResult(
            name=data.name,
            lig_pos=lig_pos[order],
            atom_pos=atom_pos[order],
            confidence=conf[order] if conf is not None else None,
            center=np.asarray(data.raw["original_center"]),
            lig_mask=np.asarray(g1.lig_mask),
            atom_mask=np.asarray(g1.atom_mask),
            trajectory=tuple(t[:, order] for t in trajectory) if trajectory else None,
            affinity=aff[order] if aff is not None else None,
        )


    # ------------------------------------------------------------------
    def dock_many(
        self,
        datas: list[ComplexData],
        key: jax.Array,
        mesh: Optional[jax.sharding.Mesh] = None,
        filtering_datas: Optional[list[ComplexData]] = None,
        tail_rungs: int = 0,
    ) -> list[DockingResult]:
        """Dock several complexes, batching SAMPLES ACROSS COMPLEXES.

        The reference fans complexes out over processes/GPUs
        (torch.multiprocessing); here every (complex, sample) pair is one
        row of the device batch, so complexes that land in the same shape
        bucket share compiled executables AND device batches — partial
        chunks at the tail of one complex are filled with the next
        complex's samples instead of padding.  With ``mesh`` (a 1-D 'dp'
        mesh) the batch is sharded across devices and GSPMD runs the whole
        reverse diffusion SPMD with zero collectives.

        Trajectories are not collected in this path (use ``dock`` for
        --save_visualisation).  Returns one DockingResult per input, in
        order; failed featurizations must be filtered by the caller.

        ``tail_rungs`` > 0 enables batch-axis bucketing for the tail chunk
        of each shape group: instead of padding a small tail up to
        ``batch_size`` (wasted rows), the tail is run at the smallest
        halving rung (bs/2, bs/4, ... down to ``tail_rungs`` halvings)
        that still fits it.  Each rung used costs one extra compile of the
        sampler executable, so this pays off for long-running services and
        large corpora, not one-shot small jobs.

        Scheduling: complexes are featurized (``graph.from_raw``, pure host
        work) one at a time, and every FULL chunk of a complex is dispatched
        to the device the moment its graph exists — so featurizing complex
        i+1 overlaps the reverse diffusion of complex i (all dispatch is
        async; results materialize only at the end).  Only the per-complex
        tail samples (S mod bs) wait: they are pooled across complexes by
        shape signature so partial chunks of one complex are filled with the
        next complex's samples instead of padding.  The round-4 layout
        (featurize everything, then dispatch) serialized ~0.5 s/complex of
        host featurization in front of all device work, which is exactly the
        dock_many-slower-than-dock() gap measured in BENCH_r04.
        """
        import time as _time
        from collections import defaultdict

        S = self.samples_per_complex
        use_conf = self._conf_jit is not None
        if filtering_datas is not None and use_conf:
            assert len(filtering_datas) == len(datas)

        def shape_sig(g1):
            return tuple(
                (path, leaf.shape) for path, leaf in
                sorted(jax.tree_util.tree_flatten_with_path(g1)[0], key=str)
                if hasattr(leaf, "shape")
            )

        bs = min(self.batch_size, S * len(datas))
        if mesh is not None:
            n_dev = mesh.size
            bs = max(bs, n_dev) // n_dev * n_dev
            sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(mesh.axis_names[0])
            )

        lig_acc: dict[int, list] = defaultdict(list)
        atom_acc: dict[int, list] = defaultdict(list)
        conf_acc: dict[int, list] = defaultdict(list)

        # all chunks are dispatched asynchronously and materialized only at
        # the end, so host work (featurize + chunk assembly) overlaps device
        # compute (the single-complex dock() hides its host work the same
        # way; before this, dock_many synced per chunk and ran ~30% below
        # single-complex throughput at the same bucket)
        pending: list[tuple[list, int, jax.Array, jax.Array, Optional[jax.Array]]] = []
        graphs: list[ComplexGraph] = []
        # tail pool: sig -> list of (ci, g1, gf1, n_tail)
        tails: dict[tuple, list] = defaultdict(list)
        prof = {"featurize_s": 0.0, "dispatch_s": 0.0, "materialize_s": 0.0}

        def dispatch(g, gf, chunk, n_real, key):
            if mesh is not None:
                g = jax.device_put(g, sharding)
                if gf is not None:
                    gf = jax.device_put(gf, sharding)
            g_final, _ = self._run(key, g, self.variables)
            conf = (
                self._conf_jit(g_final, self.confidence_variables, gf)
                if use_conf else None
            )
            pending.append(
                (chunk, n_real, g_final.lig_pos, g_final.atom_pos, conf))

        for ci, d in enumerate(datas):
            t0 = _time.perf_counter()
            g1 = graphlib.from_raw(d.raw, buckets=self.buckets)
            gf1 = None
            if filtering_datas is not None and use_conf:
                gf1 = graphlib.from_raw(
                    filtering_datas[ci].raw, buckets=self.buckets)
                # same ligand-capacity guard as dock(): run_confidence
                # transfers lig_pos from the score graph into the filtering
                # graph, which is only coherent when both bucketed to the
                # same ligand capacity
                if gf1.lig_pos.shape != g1.lig_pos.shape:
                    raise ValueError(
                        f"complex {d.name}: filtering graph ligand "
                        f"capacity differs from the score graph "
                        f"({gf1.lig_pos.shape} vs {g1.lig_pos.shape})"
                    )
            prof["featurize_s"] += _time.perf_counter() - t0
            graphs.append(g1)
            t0 = _time.perf_counter()
            n_full = S // bs
            for c in range(n_full):
                g = graphlib.replicate(g1, bs)
                gf = graphlib.replicate(gf1, bs) if gf1 is not None else None
                key, sub = jax.random.split(key)
                chunk = [(ci, c * bs + s) for s in range(bs)]
                dispatch(g, gf, chunk, bs, sub)
            prof["dispatch_s"] += _time.perf_counter() - t0
            n_tail = S - n_full * bs
            if n_tail:
                sig = shape_sig(g1)
                if gf1 is not None:
                    sig = (sig, shape_sig(gf1))
                tails[sig].append((ci, g1, gf1, n_tail))

        t0 = _time.perf_counter()
        for group in tails.values():
            work = [(u, ci, s) for u, (ci, _g, _gf, n_tail) in enumerate(group)
                    for s in range(n_tail)]
            # one device-resident stack of the group's unique graphs; each
            # chunk batch is then a jitted gather (device-to-device) instead
            # of a host re-stack + re-upload of the same complexes per chunk
            g_stack = graphlib.stack([g for _ci, g, _gf, _n in group])
            gf_stack = (
                graphlib.stack([gf for _ci, _g, gf, _n in group])
                if group[0][2] is not None else None
            )
            for off in range(0, len(work), bs):
                chunk = work[off : off + bs]
                n_real = len(chunk)
                cb = bs
                if tail_rungs > 0 and n_real < bs:
                    for _ in range(tail_rungs):
                        half = cb // 2
                        if half < max(n_real, 1):
                            break
                        if mesh is not None and half % mesh.size != 0:
                            break
                        cb = half
                while len(chunk) < cb:  # tail: repeat rows, drop later
                    chunk.append(chunk[len(chunk) - n_real])
                rows = jnp.asarray([u for u, _ci, _s in chunk], dtype=jnp.int32)
                g = self._gather_jit(g_stack, rows)
                gf = (self._gather_jit(gf_stack, rows)
                      if gf_stack is not None else None)
                key, sub = jax.random.split(key)
                dispatch(g, gf, [(ci, s) for _u, ci, s in chunk],
                         n_real, sub)
        prof["dispatch_s"] += _time.perf_counter() - t0

        t0 = _time.perf_counter()

        for chunk, n_real, lig_d, atom_d, conf_d in pending:
            lig = np.asarray(lig_d)
            atom = np.asarray(atom_d)
            conf = np.asarray(conf_d) if conf_d is not None else None
            for row, (ci, _s) in enumerate(chunk[:n_real]):
                lig_acc[ci].append(lig[row])
                atom_acc[ci].append(atom[row])
                if conf is not None:
                    conf_acc[ci].append(conf[row])
        prof["materialize_s"] = _time.perf_counter() - t0
        logger.info(
            "dock_many phases: featurize %.2fs dispatch %.2fs materialize %.2fs",
            prof["featurize_s"], prof["dispatch_s"], prof["materialize_s"])
        if os.environ.get("DDP_TPU_DOCK_MANY_PROFILE", "0") == "1":
            import sys as _sys

            print(f"dock_many profile: {prof}", file=_sys.stderr)

        results = []
        for ci, data in enumerate(datas):
            lig_pos = np.stack(lig_acc[ci])[:S]
            atom_pos = np.stack(atom_acc[ci])[:S]
            conf = np.stack(conf_acc[ci])[:S] if conf_acc[ci] else None
            conf, aff = split_confidence_output(conf, self.confidence_cfg)
            order = np.argsort(-conf) if conf is not None else np.arange(S)
            # masks only — device_get of the whole graph pytree would pull
            # the ESM features back through the tunnel per complex
            results.append(DockingResult(
                name=data.name,
                lig_pos=lig_pos[order],
                atom_pos=atom_pos[order],
                confidence=conf[order] if conf is not None else None,
                center=np.asarray(data.raw["original_center"]),
                lig_mask=np.asarray(graphs[ci].lig_mask),
                atom_mask=np.asarray(graphs[ci].atom_mask),
                affinity=aff[order] if aff is not None else None,
            ))
        return results


def init_random_variables(model_cfg: ModelConfig, example_graph, seed: int = 0):
    """Random-init model variables for an example (batched) graph — used for
    benchmarking and before training produces checkpoints."""
    model = get_model(model_cfg)
    B = example_graph.lig_pos.shape[0]
    t = {k: jnp.full((B,), 0.5) for k in ("tr", "rot", "tor", "sc_tor", "t")}
    if model_cfg.confidence_mode:
        sn = None
    else:
        so3 = tables.so3_tables()
        torus = tables.torus_tables()
        sig = model_cfg.sigma
        _, s_rot, s_tor, s_sc = sig.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])
        sn = {
            "rot": so3.score_norm(s_rot),
            "tor": torus.score_norm(s_tor),
            "sc_tor": torus.score_norm(s_sc),
        }
    return jax.jit(model.init)(jax.random.PRNGKey(seed), example_graph, t, sn)
