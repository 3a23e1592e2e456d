"""Trainer: epoch loop, validation (incl. full reverse-diffusion docking
metrics), plateau LR scheduling, multi-criteria best checkpointing.

Parity targets (reference):
- train loop + checkpoint criteria      train.py:24-144 (best model per val
  loss / valinf rmsds_lt2 / sc-tor loss / sc-rmsd / steric clashes +
  last_model with optimizer/EMA for restart)
- AverageMeter (+ sigma intervals)      utils/training.py:112-144
- inference_epoch (val docking)         utils/training.py:259-459
- ReduceLROnPlateau on inference metric train.py:130-134

TPU-native: jitted train/eval steps over bucketed static-shape batches; the
plateau scheduler adjusts a host-side LR scale passed through optax
inject_hyperparams.
"""
from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import evaluation, graph as graphlib, runtime, sampling, tables, training
from .data import dataset as ds
from .models.score_model import get_model
from .pipeline import DockingPipeline, init_random_variables
from .utils import checkpoint as ckpt

logger = logging.getLogger(__name__)


class AverageMeter:
    """Running means of named metrics, optionally bucketed into sigma
    intervals (reference utils/training.py:112-144)."""

    def __init__(self, types, intervals: int = 1):
        self.types = list(types)
        self.intervals = intervals
        self.acc = defaultdict(float)
        self.count = defaultdict(float)

    def add(self, vals: dict, t_tr: np.ndarray | None = None):
        for k in self.types:
            if k not in vals:
                continue
            v = np.asarray(vals[k])
            self.acc[k] += float(v.sum() if v.ndim else v)
            self.count[k] += float(v.size if v.ndim else 1)
            if self.intervals > 1 and t_tr is not None and v.ndim:
                idx = np.clip((t_tr * self.intervals).astype(int), 0, self.intervals - 1)
                for i in range(self.intervals):
                    m = idx == i
                    if m.any():
                        self.acc[f"{k}_interval{i}"] += float(v[m].sum())
                        self.count[f"{k}_interval{i}"] += float(m.sum())

    def summary(self) -> dict:
        return {k: self.acc[k] / max(self.count[k], 1e-9) for k in self.acc}


class PlateauScheduler:
    """ReduceLROnPlateau equivalent: scale LR by factor after `patience`
    epochs without improvement."""

    def __init__(self, mode="max", factor=0.7, patience=30, min_lr=1e-6):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = -np.inf if mode == "max" else np.inf
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float, base_lr: float) -> float:
        improved = metric > self.best if self.mode == "max" else metric < self.best
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return max(base_lr * self.scale, self.min_lr)


class Trainer:
    def __init__(self, args, model_cfg, noise_cfg, loss_weights, train_set, val_set,
                 data_cfg=None):
        self.args = args
        self.model_cfg = model_cfg
        self.noise_cfg = noise_cfg
        self.loss_weights = loss_weights
        self.train_set = train_set
        self.val_set = val_set
        self.run_dir = os.path.join(args.log_dir, args.run_name)
        os.makedirs(self.run_dir, exist_ok=True)
        if data_cfg is None:
            data_cfg = getattr(train_set, "cfg", None)
        ckpt.save_yaml_config(self.run_dir, model_cfg, data_cfg=data_cfg)

        self.model = get_model(model_cfg)
        base_opt = optax.adamw if args.adamw else optax.adam
        self.optimizer = optax.inject_hyperparams(base_opt)(learning_rate=args.lr)
        # tables are device-resident ONCE and passed through the jit
        # boundary as arguments (training.make_train_step docstring)
        self.tbl = tables.all_tables()
        self.train_step = jax.jit(
            training.make_train_step(
                self.model, self.optimizer, model_cfg.sigma, noise_cfg,
                loss_weights, ema_decay=args.ema_rate,
            )
        )
        self.eval_step = jax.jit(
            training.make_eval_step(self.model, model_cfg.sigma, noise_cfg, loss_weights)
        )
        self.stats_step = jax.jit(
            training.make_stats_step(self.model, model_cfg.sigma, noise_cfg)
        )
        # device-resident dataset (gather batches on device by index): the
        # host<->TPU link is the scarcest resource in this deployment — a
        # per-step host-stacked batch upload (~8 MB) dwarfs the step itself.
        # One padded copy of every complex is staged to HBM and the jitted
        # step gathers rows; the host sends only indices + RNG keys.
        self._dev_groups: dict | None = None
        self._gather_train = jax.jit(
            lambda state, key, stacked, rows, tbl: self.train_step(
                state, key, jax.tree.map(lambda a: a[rows], stacked), tbl)
        )
        self._gather_eval = jax.jit(
            lambda params, bs, key, stacked, rows, tbl: self.eval_step(
                params, bs, key, jax.tree.map(lambda a: a[rows], stacked), tbl)
        )
        self._gather_stats = jax.jit(
            lambda params, bs, key, stacked, rows, tbl: self.stats_step(
                params, bs, key, jax.tree.map(lambda a: a[rows], stacked), tbl)
        )
        self.scheduler = PlateauScheduler(
            mode=args.main_metric_goal, patience=args.scheduler_patience
        )
        self.best = {}
        self.wandb = None
        if getattr(args, "wandb", False):
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project="diffdock_pocket_tpu", name=args.run_name,
                           config=vars(args))
            except ImportError:
                logger.warning("wandb requested but not installed; skipping")

    # ------------------------------------------------------------------
    def _complexes(self, dataset):
        # featurization is cached in memory across epochs (disk pickles back
        # the first pass; reference re-reads per epoch via the loader workers)
        cache = getattr(self, "_complex_cache", {})
        key = id(dataset)
        if key not in cache:
            cache[key] = dataset.preprocess_all()
            self._complex_cache = cache
        return cache[key]

    def _batches(self, dataset, rng=None):
        complexes = self._complexes(dataset)
        # each training complex appears `multiplicity` times per epoch with
        # independent noise draws (the reference parses --multiplicity and
        # stores it on PDBBind but never reads it, pdbbind.py:168 — here it
        # actually works); only applied when shuffling (training)
        mult = getattr(self.args, "multiplicity", 1) or 1
        if rng is not None and mult > 1:
            complexes = list(complexes) * mult
        for batch in ds.bucketed_batches(
            complexes, self.args.batch_size, shuffle_rng=rng
        ):
            yield graphlib.stack([self._graph(c, rng) for c in batch]), batch

    @staticmethod
    def _graph(c, rng):
        """Raw -> padded graph; with num_conformers > 1 a random matched
        conformer is substituted per batch assembly (reference
        pdbbind.py:80-81 random.choice in apply_noise)."""
        raw = c.raw
        confs = raw.get("lig_conf_pos")
        if confs is not None and len(confs) > 1:
            r = rng if rng is not None else np.random.default_rng(0)
            raw = dict(raw, lig_pos=confs[int(r.integers(len(confs)))])
        return graphlib.from_raw(raw)

    # ---- device-resident dataset -----------------------------------------
    # The host<->TPU link is the scarcest resource in this deployment (the
    # chip sits behind a tunnel); host-stacking every batch re-uploads ~MBs
    # per step.  Instead every (complex, conformer) variant is padded once,
    # stacked per shape signature, and staged to HBM; per step the host
    # sends a row-index vector and the jitted step gathers the batch on
    # device.  Semantics match the host path exactly: same bucketed_batches
    # order, same per-assembly random conformer choice.

    @staticmethod
    def _conf_variants(c):
        confs = c.raw.get("lig_conf_pos")
        if confs is not None and len(confs) > 1:
            return list(confs)
        return [c.raw["lig_pos"]]

    def _device_groups_for(self, dataset):
        """Stage `dataset` on device; returns False when disabled/over budget."""
        if not getattr(self.args, "device_data_cache", True):
            return False
        cache = getattr(self, "_dev_cache", None)
        if cache is None:
            cache = self._dev_cache = {}
            self._dev_rows = {}
        key = id(dataset)
        if key in cache:
            return cache[key]
        budget_mb = float(os.environ.get("DDP_TPU_DEVICE_DATA_MB", "1024"))
        entries = []  # (cid, conf_i, padded graph)
        for c in self._complexes(dataset):
            for ci, pos in enumerate(self._conf_variants(c)):
                g = graphlib.from_raw(dict(c.raw, lig_pos=pos))
                entries.append((id(c), ci, g))
        nbytes = sum(l.nbytes for _, _, g in entries for l in jax.tree.leaves(g))
        if nbytes > budget_mb * 1e6:
            logger.info(
                "device data cache: %d entries = %.0f MB exceeds budget "
                "%.0f MB (DDP_TPU_DEVICE_DATA_MB); using host batching",
                len(entries), nbytes / 1e6, budget_mb)
            cache[key] = False
            return False
        by_sig: dict = {}
        for cid, ci, g in entries:
            sig = tuple(l.shape for l in jax.tree.leaves(g))
            by_sig.setdefault(sig, []).append((cid, ci, g))
        groups = {}
        for sig, items in by_sig.items():
            stacked = jax.device_put(graphlib.stack([g for _, _, g in items]))
            groups[sig] = stacked
            for row, (cid, ci, _) in enumerate(items):
                self._dev_rows[(key, cid, ci)] = (sig, row)
        logger.info(
            "device data cache: staged %d entries (%d shape groups, %.0f MB)",
            len(entries), len(groups), nbytes / 1e6)
        cache[key] = groups
        return groups

    def _device_batches(self, dataset, rng=None):
        """Yield (stacked_group, row_indices) mirroring _batches' semantics."""
        groups = self._device_groups_for(dataset)
        assert groups, "caller must check _device_groups_for first"
        dkey = id(dataset)
        complexes = self._complexes(dataset)
        mult = getattr(self.args, "multiplicity", 1) or 1
        if rng is not None and mult > 1:
            complexes = list(complexes) * mult
        for batch in ds.bucketed_batches(
            complexes, self.args.batch_size, shuffle_rng=rng
        ):
            sig = None
            rows = []
            for c in batch:
                n = len(self._conf_variants(c))
                ci = int(rng.integers(n)) if (rng is not None and n > 1) else 0
                s, row = self._dev_rows[(dkey, id(c), ci)]
                assert sig is None or s == sig, "mixed shapes within a bucket"
                sig = s
                rows.append(row)
            yield groups[sig], jnp.asarray(rows, dtype=jnp.int32)

    def _refresh_stats(self, params, batch_stats, key, passes=None):
        """Re-center the BN running statistics on the CURRENT ``params`` by
        folding fresh batch statistics in at the layers' own momentum.

        ``passes`` sweeps over the training batches re-run the normal
        stats-update forward (momentum 0.1 per batch, as in training), each
        with fresh noise draws, STARTING from the existing running stats.
        After P passes x N batches the stale-stats weight is 0.9^(P*N)
        (~12% at the corpus scale's P=4 x N=5) while the t-draw noise of any
        single batch is smoothed by the same EMA that training relies on.
        A plain mean of single-pass per-batch statistics is NOT used: with
        few batches it samples the t (sigma) distribution so thinly that the
        per-channel variance estimates are noisier than the stale stats they
        replace (measured: val loss 6-59 vs 1.4-1.9 on the tiny verify run).
        Rationale for refreshing at all: training.make_stats_step."""
        if passes is None:
            passes = int(getattr(self.args, "bn_refresh_passes", 4) or 4)
        bs = batch_stats
        dev = bool(self._device_groups_for(self.train_set))
        for _ in range(passes):
            if dev:
                for stacked, rows in self._device_batches(self.train_set):
                    key, sub = jax.random.split(key)
                    bs = self._gather_stats(
                        params, bs, sub, stacked, rows, self.tbl)
            else:
                for g, _ in self._batches(self.train_set):
                    key, sub = jax.random.split(key)
                    bs = self.stats_step(params, bs, sub, g, self.tbl)
        return bs

    def fit(self):
        args = self.args
        key = jax.random.PRNGKey(args.seed)

        # init from the first training batch's shapes
        first = None
        for g, _ in self._batches(self.train_set):
            first = g
            break
        if first is None:
            raise RuntimeError("empty training set")
        esm_width = int(first.rec_esm.shape[-1])
        if esm_width != self.model_cfg.esm_embeddings_dim:
            raise ValueError(
                f"graph rec_esm width ({esm_width}) does not match "
                f"model esm_embeddings_dim ({self.model_cfg.esm_embeddings_dim}); "
                "pass matching --esm_embeddings_path / model config"
            )
        variables = init_random_variables(self.model_cfg, first, seed=args.seed)
        state = training.create_train_state(variables, self.optimizer)

        if args.restart_dir:
            state = ckpt.load_checkpoint(
                os.path.join(args.restart_dir, "last_model"), state
            )
            logger.info("restarted from %s", args.restart_dir)
            restart_lr = getattr(args, "restart_lr", None)
            if restart_lr is not None:
                # overwrite the restored optimizer LR (reference train.py:178)
                state = state._replace(opt_state=_set_lr(state.opt_state, restart_lr))
                self._lr = restart_lr
                logger.info("restart_lr: optimizer lr overwritten to %g", restart_lr)

        # steady-state throughput guard (compile-lottery, BASELINE.md): the
        # pathological executable draw makes training silently ~2.7x slower
        # for the whole run.  Compare each epoch's per-step time against the
        # best ever recorded for this configuration (runtime.step_time_ok);
        # a pathological epoch logs a visible warning and (unless
        # DDP_TPU_RECOMPILE_ON_SLOW=0) evicts the compile caches once so the
        # next epoch re-rolls the lottery.
        train_sig = (
            f"train:{jax.devices()[0].device_kind.replace(' ', '')}"
            f":ns{self.model_cfg.ns}_nv{self.model_cfg.nv}"
            f"_l{self.model_cfg.num_conv_layers}:b{args.batch_size}"
        )
        rerolled = False
        for epoch in range(args.n_epochs):
            t0 = time.time()
            meter = AverageMeter(["loss", "tr_loss", "rot_loss", "tor_loss", "sc_tor_loss"])
            rng = np.random.default_rng(args.seed + epoch)
            # collect aux as device arrays and fetch ONCE per epoch — a
            # per-step device_get would serialize the async dispatch queue
            # and expose full host<->device latency on every step
            pending = []
            if self._device_groups_for(self.train_set):
                for stacked, rows in self._device_batches(self.train_set, rng=rng):
                    key, sub = jax.random.split(key)
                    state, aux = self._gather_train(
                        state, sub, stacked, rows, self.tbl)
                    pending.append(aux)
            else:
                for g, _ in self._batches(self.train_set, rng=rng):
                    key, sub = jax.random.split(key)
                    state, aux = self.train_step(state, sub, g, self.tbl)
                    pending.append(aux)
            for aux in jax.device_get(pending):
                meter.add(aux)
            train_stats = meter.summary()
            if epoch >= 1 and pending:  # epoch 0 wall includes the compile
                step_ms = (time.time() - t0) / len(pending) * 1e3
                if runtime.steady_state_guard(
                        train_sig, step_ms, reroll_allowed=not rerolled):
                    rerolled = True  # one re-roll per run

            # ---- validation loss (EMA weights) ---------------------------
            val_meter = AverageMeter(
                ["loss", "tr_loss", "rot_loss", "tor_loss", "sc_tor_loss"],
                intervals=10 if args.test_sigma_intervals else 1,
            )
            eval_params = state.ema.params if args.use_ema else state.params
            eval_bs = state.batch_stats
            if getattr(args, "bn_stats_refresh", False):
                key, sub = jax.random.split(key)
                eval_bs = self._refresh_stats(eval_params, state.batch_stats, sub)
            pending = []
            if self._device_groups_for(self.val_set):
                for stacked, rows in self._device_batches(self.val_set):
                    key, sub = jax.random.split(key)
                    pending.append(self._gather_eval(
                        eval_params, eval_bs, sub, stacked, rows,
                        self.tbl))
            else:
                for g, _ in self._batches(self.val_set):
                    key, sub = jax.random.split(key)
                    pending.append(self.eval_step(
                        eval_params, eval_bs, sub, g, self.tbl))
            for aux in jax.device_get(pending):
                t_tr = aux.pop("t_tr")
                val_meter.add(aux, t_tr=t_tr)
            val_stats = {f"val_{k}": v for k, v in val_meter.summary().items()}

            metrics = {**train_stats, **val_stats, "epoch": epoch}

            # ---- periodic validation docking ----------------------------
            if args.val_inference_freq and (epoch + 1) % args.val_inference_freq == 0:
                key, sub = jax.random.split(key)
                inf = self.inference_epoch(eval_params, eval_bs, sub)
                metrics.update({f"valinf_{k}": v for k, v in inf.items()})

            # ---- periodic TRAIN-set docking (reference train.py:80-87;
            # always possible here — lig_orig_pos is stored for every
            # complex, where the reference loses it under torsion noise) ----
            tif = getattr(args, "train_inference_freq", None)
            if tif and (epoch + 1) % tif == 0:
                key, sub = jax.random.split(key)
                self._inference_set = self.train_set
                try:
                    inf = self.inference_epoch(eval_params, eval_bs, sub)
                finally:
                    self._inference_set = None
                metrics.update({f"traininf_{k}": v for k, v in inf.items()})

            lr, stepped = step_scheduler(
                self.scheduler, metrics, args.main_metric, args.lr,
                getattr(self, "_lr", args.lr),
            )
            if stepped:
                state = state._replace(opt_state=_set_lr(state.opt_state, lr))
                self._lr = lr
            metrics["lr"] = lr
            logger.info(
                "epoch %d (%.1fs): %s", epoch, time.time() - t0,
                {k: round(v, 4) for k, v in metrics.items() if isinstance(v, float)},
            )
            # durable per-epoch history (confidence/train.py already keeps
            # one; without it a finished run's trajectory survives only in
            # scrollback — the r3 corpus run's valinf curve was lost that way)
            with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as fh:
                fh.write(json.dumps(
                    {k: (round(v, 6) if isinstance(v, float) else v)
                     for k, v in metrics.items()
                     if isinstance(v, (int, float, str))}) + "\n")
            if self.wandb is not None:
                self.wandb.log(metrics, step=epoch)

            self._checkpoint(state, metrics, epoch, eval_batch_stats=eval_bs)

    # ------------------------------------------------------------------
    def inference_epoch(self, params, batch_stats, key) -> dict:
        """Full reverse-diffusion docking on up to num_inference_complexes
        validation complexes; rmsd + sc-rmsd + steric-clash metrics
        (reference utils/training.py:259-459)."""
        args = self.args
        manifold_alphas = None
        if self.model_cfg.asyncronous_noise_schedule:
            # per-manifold inverse-Beta schedules at val docking (reference
            # utils/training.py:263-267)
            nc = self.noise_cfg
            manifold_alphas = {
                "tr": (nc.alpha, nc.beta), "rot": (nc.rot_alpha, nc.rot_beta),
                "tor": (nc.tor_alpha, nc.tor_beta),
                "sc_tor": (nc.sc_tor_alpha, nc.sc_tor_beta),
            }
        pipe = DockingPipeline(
            model_cfg=self.model_cfg,
            variables={"params": params, "batch_stats": batch_stats},
            sampler_cfg=sampling.SamplerConfig(
                inference_steps=args.inference_steps,
                flexible_sidechains=self.model_cfg.flexible_sidechains,
                no_torsion=self.model_cfg.no_torsion,
            ),
            samples_per_complex=args.inference_samples,
            batch_size=args.inference_samples,
            manifold_alphas=manifold_alphas,
        )
        acc = defaultdict(list)  # metric families, each a list per complex
        rmsds, sc_rmsds = [], []
        n = 0
        dataset = getattr(self, "_inference_set", None) or self.val_set
        for i in range(len(dataset)):
            if n >= args.num_inference_complexes:
                break
            data = dataset.get(i)
            if data is None:
                continue
            key, sub = jax.random.split(key)
            try:
                result = pipe.dock(data, sub)
            except Exception as e:
                logger.warning("val docking failed for %s: %s", data.name, e)
                continue
            n += 1
            nl = len(data.raw["lig_pos"])
            true = data.raw["lig_orig_pos"]
            # symmetry-corrected RMSD with plain fallback (the checkpoint
            # criterion; matches the offline harness, evaluate_files.py —
            # the reference's spyrmsd wrapper is utils/utils.py:116-130)
            best = min(
                _rmsd_sym(data.ligand, result.lig_pos[s][:nl], true)
                for s in range(result.lig_pos.shape[0])
            )
            rmsds.append(best)
            self._clash_and_sc_metrics(data, result, acc, sc_rmsds)
        rmsds = np.asarray(rmsds)
        out = {
            "rmsds_lt2": float(np.mean(rmsds < 2.0)) if len(rmsds) else 0.0,
            "rmsds_lt5": float(np.mean(rmsds < 5.0)) if len(rmsds) else 0.0,
            "mean_rmsd": float(rmsds.mean()) if len(rmsds) else 0.0,
        }
        for k, v in acc.items():
            out[k] = float(np.mean(v))
        # sc_rmsds is aligned 1:1 with rmsds (NaN for complexes without
        # flexible side chains) so the combined metric pairs correctly
        sc = np.asarray(sc_rmsds)
        valid = ~np.isnan(sc) if len(sc) else np.zeros(0, bool)
        if valid.any():
            scv = sc[valid]
            out.update(
                {
                    # reference sc-RMSD bands 0.25/0.5/1 (training.py:440-442)
                    "sc_rmsds_lt025": float(np.mean(scv < 0.25)),
                    "sc_rmsds_lt05": float(np.mean(scv < 0.5)),
                    "sc_rmsds_lt1": float(np.mean(scv < 1.0)),
                    "mean_sc_rmsd": float(scv.mean()),
                    # the confidence-label proxy (reference training.py:425)
                    "rmsds_lt2_and_sc_rmsds_lt1": float(
                        np.mean((rmsds[valid] < 2.0) & (scv < 1.0))
                    ),
                    # kept for backward compat with round-2 logs/checkpoints
                    "mean_steric_clashes": out.get("rec_lig_steric_clashes", 0.0),
                }
            )
        return out

    def _clash_and_sc_metrics(self, data, result, acc, sc_rmsds):
        """Per-complex clash families (+deltas vs the original complex) and
        side-chain RMSD suite, incl. compare-to-true-protein (reference
        utils/training.py:273-280, 292-310, 316, 363-400, 443-457)."""
        raw = data.raw
        nl = len(raw["lig_pos"])
        na = len(raw["atom_pos"])
        pred_atom = np.asarray(result.atom_pos[0][:na])
        pred_lig = np.asarray(result.lig_pos[0][:nl])
        elements = evaluation.elements_from_atom_feat(raw["atom_feat"])
        lig_el = list(data.ligand.symbols)

        if self.model_cfg.all_atoms:
            base = evaluation.rec_lig_clashes(
                raw["atom_orig_pos"], elements, raw["lig_orig_pos"], lig_el
            )
            pred = evaluation.rec_lig_clashes(pred_atom, elements, pred_lig, lig_el)
            acc["rec_lig_steric_clashes"].append(pred)
            acc["rec_lig_steric_clashes_delta"].append(pred - base)

        if not (self.model_cfg.flexible_sidechains and raw["sc_bond_index"].size):
            # keep sc_rmsds aligned 1:1 with rmsds (complexes without
            # flexible side chains contribute NaN, masked out by the caller)
            sc_rmsds.append(float("nan"))
            return
        sc_mask = raw["sc_rotate_mask"].any(axis=0)  # flexible heavy atoms
        flex_idx = np.where(sc_mask)[0]
        flex_el = [elements[i] for i in flex_idx]

        # flexible side-chain atoms vs ligand (the reference's checkpoint
        # criterion family, train.py:124-127)
        base = evaluation.rec_lig_clashes(
            raw["atom_orig_pos"][flex_idx], flex_el, raw["lig_orig_pos"], lig_el
        )
        pred = evaluation.rec_lig_clashes(pred_atom[flex_idx], flex_el, pred_lig, lig_el)
        acc["rec_sc_lig_steric_clashes"].append(pred)
        acc["rec_sc_lig_steric_clashes_delta"].append(pred - base)

        # side chains vs rest-of-receptor and vs other side chains
        for fam, versus_rest in (
            ("rec_sc_rec_rest_steric_clashes", True),
            ("rec_sc_rec_sc_steric_clashes", False),
        ):
            base = evaluation.sidechain_clashes(
                raw["atom_orig_pos"], elements, raw["sc_rotate_mask"],
                raw["sc_res_index"], versus_rest=versus_rest,
            )
            pred = evaluation.sidechain_clashes(
                pred_atom, elements, raw["sc_rotate_mask"],
                raw["sc_res_index"], versus_rest=versus_rest,
            )
            acc[fam].append(pred)
            acc[f"{fam}_delta"].append(pred - base)

        _, overall = evaluation.sidechain_rmsds(
            pred_atom, raw["atom_orig_pos"],
            raw["sc_rotate_mask"], raw["sc_res_index"],
        )
        sc_rmsds.append(overall)

        # compare_true_protein: sc-RMSD vs the experimental (holo) structure
        # when the input receptor is computational (reference training.py:
        # 316, 390-400, 443-457); available when featurization stored
        # atom_true_pos (DataConfig.compare_true_protein)
        true_pos = raw.get("atom_true_pos")
        if true_pos is not None:
            _, from_holo = evaluation.sidechain_rmsds(
                pred_atom, true_pos, raw["sc_rotate_mask"], raw["sc_res_index"]
            )
            _, orig_from_holo = evaluation.sidechain_rmsds(
                raw["atom_orig_pos"], true_pos,
                raw["sc_rotate_mask"], raw["sc_res_index"],
            )
            acc["sc_rmsds_from_holo"].append(from_holo)
            acc["sc_rmsds_lt05_from_holo"].append(float(from_holo < 0.5))
            acc["sc_rmsds_lt1_from_holo"].append(float(from_holo < 1.0))
            # ratio < 1 = the model moved side chains toward the holo truth;
            # only meaningful when the input was actually perturbed (holo
            # rows have orig == true up to io roundoff)
            if orig_from_holo > 0.05:
                acc["sc_rmsds_from_holo_ratio"].append(from_holo / orig_from_holo)

    # ------------------------------------------------------------------
    def _checkpoint(self, state, metrics, epoch, eval_batch_stats=None):
        """best-per-criterion + last (reference train.py:101-141).

        ``eval_batch_stats`` (the BN-refresh output, when enabled) ships with
        the EMA checkpoints: those are what the metrics were measured on and
        what inference loads, so they must carry the stats that produced the
        recorded numbers."""
        criteria = {
            "best_model": ("val_loss", "min", None),
            # tie-break: valinf_rmsds_lt2 saturates at 1.0 on small val sets
            # (e.g. the 45-complex corpus), after which a strict comparison
            # would freeze this checkpoint at the FIRST saturating epoch —
            # whose side-chain head is typically still undertrained (round-3
            # corpus journey: top-1 sc<1A only 33%).  Among ties, prefer the
            # epoch with the better side-chain RMSD (falls back to mean
            # ligand RMSD for rigid runs).
            "best_inference_epoch_model": (
                "valinf_rmsds_lt2", "max",
                ("valinf_mean_sc_rmsd", "valinf_mean_rmsd")),
            "best_sc_tor_model": ("val_sc_tor_loss", "min", None),
            "best_sc_rmsd_model": ("valinf_mean_sc_rmsd", "min", None),
            # the reference selects on the side-chain-vs-ligand family
            # (train.py:124-127 valinf_rec_sc_lig_steric_clashes)
            "best_steric_clash_model": (
                "valinf_rec_sc_lig_steric_clashes", "min", None),
        }
        for name, (metric, goal, tiebreaks) in criteria.items():
            if metric not in metrics:
                continue
            v = metrics[metric]
            tb = None
            for tb_metric in (tiebreaks or ()):
                if tb_metric in metrics:
                    tb = metrics[tb_metric]  # lower is better for both
                    break
            prev = self.best.get(name)
            prev_v, prev_tb = prev if isinstance(prev, tuple) else (prev, None)
            better = prev is None or (v > prev_v if goal == "max" else v < prev_v)
            if (not better and v == prev_v and tb is not None
                    and (prev_tb is None or tb < prev_tb)):
                better = True
            if better:
                self.best[name] = (v, tb)
                # checkpoints are full variable trees (params + batch_stats),
                # loadable directly by the inference CLI; EMA variants use the
                # reference naming (best_ema_inference_epoch_model, ...)
                ckpt.save_checkpoint(
                    os.path.join(self.run_dir, name),
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
                if self.args.use_ema:
                    ema_name = name.replace("best_", "best_ema_")
                    ckpt.save_checkpoint(
                        os.path.join(self.run_dir, ema_name),
                        {"params": state.ema.params,
                         "batch_stats": (eval_batch_stats
                                         if eval_batch_stats is not None
                                         else state.batch_stats)},
                    )
        freq = getattr(self.args, "checkpoint_freq", 1) or 1
        if (epoch + 1) % freq == 0 or epoch + 1 == self.args.n_epochs:
            # restart checkpoint (params + optimizer + EMA); per-epoch by
            # default like the reference — raise --checkpoint_freq when the
            # save dominates small-epoch runs
            ckpt.save_checkpoint(os.path.join(self.run_dir, "last_model"), state)


def step_scheduler(scheduler, metrics: dict, main_metric: str, base_lr: float,
                   current_lr: float):
    """Step the plateau scheduler only on epochs where the main metric was
    actually computed (reference train.py:131-134 steps on the inference
    metric; a val-loss fallback on non-inference epochs would pollute the
    max-mode best tracker with raw losses).  Returns (lr, stepped)."""
    if main_metric in metrics:
        return scheduler.step(metrics[main_metric], base_lr), True
    return current_lr, False


def _rmsd_sym(ligand, pred, true) -> float:
    """Symmetry-corrected RMSD, falling back to plain RMSD on failure."""
    try:
        return evaluation.symmetry_rmsd(ligand, pred, true)
    except Exception:
        return evaluation.rmsd(pred, true)


def _set_lr(opt_state, lr):
    """Update the injected learning-rate hyperparameter in-place."""
    try:
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    except (AttributeError, TypeError):
        pass
    return opt_state
