"""Confidence (filtering) model trainer.

Parity targets (reference filtering/filtering_train.py): BCE-with-logits for
the binary (rmsd<2 & sc_rmsd<1) label (cross-entropy for binned cutoffs, MSE
for rmsd regression), accuracy/ROC-AUC metrics, optional transfer-weight init
from a score-model checkpoint, best/last checkpointing by --main_metric.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from typing import NamedTuple

from .. import graph as graphlib
from ..models.config import ModelConfig
from ..models.score_model import get_model
from ..pipeline import init_random_variables
from ..utils import checkpoint as ckpt
from .dataset import FilteringDataset

logger = logging.getLogger(__name__)


def _split_affinity(logits, affinity_prediction: bool):
    """Last output column is the affinity head when jointly predicted
    (parallel == 1 wiring; reference filtering_train.py:199-206)."""
    if not affinity_prediction:
        return logits, None
    conf = logits[..., :-1]
    if conf.shape[-1] == 1:
        conf = conf[..., 0]
    return conf, logits[..., -1]


def _confidence_loss(conf, y, loss_type):
    if loss_type == "bce":
        loss = optax.sigmoid_binary_cross_entropy(conf, y).mean()
        acc = jnp.mean((conf > 0) == (y > 0.5))
    elif loss_type == "crossentropy":
        loss = optax.softmax_cross_entropy_with_integer_labels(
            conf, y.astype(jnp.int32)
        ).mean()
        acc = jnp.mean(jnp.argmax(conf, -1) == y.astype(jnp.int32))
    else:  # mse regression on rmsd
        loss = jnp.mean((conf - y) ** 2)
        acc = jnp.zeros(())
    return loss, acc


def _affinity_loss(aff_pred, aff):
    """Masked MSE — NaN marks complexes missing from the affinity index."""
    ok = jnp.isfinite(aff)
    sq = jnp.where(ok, (aff_pred - jnp.where(ok, aff, 0.0)) ** 2, 0.0)
    return sq.sum() / jnp.maximum(ok.sum(), 1)


def make_confidence_train_step(model, optimizer, loss_type: str = "bce",
                               affinity_prediction: bool = False,
                               confidence_loss_weight: float = 1.0,
                               affinity_loss_weight: float = 1.0,
                               parallel_affinity: bool = False):
    def loss_fn(params, batch_stats, key, g, y, aff, tvals):
        t = {k: tvals for k in ("tr", "rot", "tor", "sc_tor")}
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, t, None, train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        if parallel_affinity:
            # model returns (per-pose filtering [B, P], affinity [B])
            conf, aff_pred = logits
        else:
            conf, aff_pred = _split_affinity(logits, affinity_prediction)
        loss, acc = _confidence_loss(conf, y, loss_type)
        aux = {"confidence_loss": loss, "accuracy": acc}
        loss = confidence_loss_weight * loss
        if aff_pred is not None:
            al = _affinity_loss(aff_pred, aff)
            aux["affinity_loss"] = al
            loss = loss + affinity_loss_weight * al
        aux["loss"] = loss
        return loss, (aux, mutated["batch_stats"])

    def step(params, batch_stats, opt_state, key, g, y, aff, tvals):
        (_, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, key, g, y, aff, tvals)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, new_opt, aux

    return step


def make_confidence_eval_step(model, loss_type: str = "bce",
                              affinity_prediction: bool = False,
                              confidence_loss_weight: float = 1.0,
                              affinity_loss_weight: float = 1.0,
                              parallel_affinity: bool = False):
    def step(params, batch_stats, g, y, aff, tvals):
        t = {k: tvals for k in ("tr", "rot", "tor", "sc_tor")}
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, g, t, None, train=False
        )
        if parallel_affinity:
            conf, aff_pred = logits
        else:
            conf, aff_pred = _split_affinity(logits, affinity_prediction)
        loss, _ = _confidence_loss(conf, y, loss_type)
        loss = confidence_loss_weight * loss
        if aff_pred is not None:
            loss = loss + affinity_loss_weight * _affinity_loss(aff_pred, aff)
        return loss, conf, aff_pred

    return step


class _DevBatch(NamedTuple):
    """Device-resident batch: per-complex base graphs staged in HBM once;
    only positions (the per-pose deltas) + row indices cross the link.
    The host<->TPU tunnel makes per-step full-graph uploads (~MB/pose) the
    bottleneck; poses of one complex differ ONLY in lig_pos (+ atom_pos for
    flexible side chains), ~KBs."""

    stacked: object  # ComplexGraph with leading row axis (device)
    rows: object  # [B] or [B*P] int32 row indices into `stacked`
    lig_pos: object  # [rows, NL, 3] padded pose ligand positions
    atom_pos: object  # [rows, NA, 3] padded pose atom positions


def _gather_graph(stacked, rows, lig_pos, atom_pos):
    g = jax.tree.map(lambda a: a[rows], stacked)
    return g.replace(lig_pos=lig_pos, atom_pos=atom_pos)


def _padded_positions(raw) -> tuple[np.ndarray, np.ndarray]:
    """Pad a pose's lig/atom positions exactly like graph.pad_graph_arrays
    (FAR fill so distance ops ignore the padding before masking)."""
    sizes = graphlib.bucket_sizes(
        len(raw["lig_pos"]), len(raw["rec_pos"]), len(raw["atom_pos"]),
        len(raw["tor_bond_index"]), len(raw["sc_bond_index"]),
        len(raw["lig_bond_index"]),
    )

    def pad(x, n):
        return np.pad(np.asarray(x, np.float32), [(0, n - len(x)), (0, 0)],
                      constant_values=1.0e4)

    return pad(raw["lig_pos"], sizes["lig"]), pad(raw["atom_pos"], sizes["atom"])


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based ROC-AUC (Mann-Whitney U)."""
    from scipy.stats import rankdata

    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return 0.5
    ranks = rankdata(np.concatenate([pos, neg]))  # average ranks for ties
    r_pos = ranks[: len(pos)].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2
    return float(u / (len(pos) * len(neg)))


class ConfidenceTrainer:
    def __init__(
        self,
        cfg: ModelConfig,
        train_data: FilteringDataset,
        val_data: FilteringDataset,
        run_dir: str,
        lr: float = 3e-4,
        batch_size: int = 16,
        loss_type: str = "bce",
        main_metric: str = "loss",
        main_metric_goal: str = "min",
        transfer_params=None,
        seed: int = 0,
        confidence_loss_weight: float = 1.0,
        affinity_loss_weight: float = 1.0,
        data_cfg=None,
        parallel: int = 1,
        val_multiplicity: int = 1,
    ):
        if cfg.parallel > 1 and not getattr(cfg, "affinity_prediction", False):
            # parallel mode only defines the affinity aggregation head; the
            # per-pose logits come back flattened [B*P] while labels are
            # [B, P], so without this check the loss fails at jit trace with
            # an opaque broadcast error
            raise ValueError(
                "parallel > 1 requires affinity_prediction (the parallel "
                "aggregators only feed the affinity head; reference "
                "models/all_atom_score_model.py:346-352)"
            )
        self.cfg = cfg
        self.train_data = train_data
        self.val_data = val_data
        self.run_dir = run_dir
        self.batch_size = batch_size
        self.loss_type = loss_type
        self.main_metric = main_metric
        self.main_metric_goal = main_metric_goal
        self.seed = seed
        os.makedirs(run_dir, exist_ok=True)
        ckpt.save_yaml_config(run_dir, cfg, data_cfg=data_cfg)
        self.model = get_model(cfg)
        self.optimizer = optax.adam(lr)
        self.parallel = parallel
        aff = bool(getattr(cfg, "affinity_prediction", False)) and cfg.parallel == 1
        par_aff = bool(getattr(cfg, "affinity_prediction", False)) and cfg.parallel > 1
        self.train_step = jax.jit(make_confidence_train_step(
            self.model, self.optimizer, loss_type, aff,
            confidence_loss_weight, affinity_loss_weight,
            parallel_affinity=par_aff,
        ))
        self.eval_step = jax.jit(make_confidence_eval_step(
            self.model, loss_type, aff,
            confidence_loss_weight, affinity_loss_weight,
            parallel_affinity=par_aff,
        ))
        # device-resident base graphs + position-only uploads (_DevBatch)
        self._dev_stage: dict = {}
        self._gather_train_step = jax.jit(
            lambda p, bs, o, k, st, rows, lig, atom, y, aff, t:
            self.train_step(p, bs, o, k, _gather_graph(st, rows, lig, atom),
                            y, aff, t))
        self._gather_eval_step = jax.jit(
            lambda p, bs, st, rows, lig, atom, y, aff, t:
            self.eval_step(p, bs, _gather_graph(st, rows, lig, atom),
                           y, aff, t))
        self.transfer_params = transfer_params
        # affinity label standardization (cfg.affinity_norm): the head is
        # trained on z-scores; metrics are reported in label units
        self.aff_mean, self.aff_std = getattr(cfg, "affinity_norm", (0.0, 1.0))
        self.aff_std = self.aff_std or 1.0
        # repeat the per-epoch val pass with fresh pose draws: with few val
        # complexes one draw each gives far too few points for a stable
        # ROC-AUC (and hence for main_metric checkpoint selection)
        self.val_multiplicity = max(1, int(val_multiplicity))
        self.best = None

    def _stage_device(self, data, examples):
        """Stage one base graph per distinct complex on device (first call
        per dataset); returns {"groups": {sig: stacked}, "rows": {...}} or
        False (disabled / over HBM budget — host path)."""
        key = id(data)
        if key in self._dev_stage:
            return self._dev_stage[key]
        budget_mb = float(os.environ.get("DDP_TPU_DEVICE_DATA_MB", "1024"))
        if budget_mb <= 0:
            self._dev_stage[key] = False
            return False
        from ..data.dataset import bucket_key

        base = {}  # name -> (sig, raw)
        for ex in examples:
            d0 = ex[0][0] if self.parallel > 1 else ex[0]
            if d0.name not in base:
                base[d0.name] = (bucket_key(d0.raw), d0.raw)
        by_sig: dict = {}
        for name, (sig, raw) in base.items():
            by_sig.setdefault(sig, []).append((name, raw))
        graphs = {sig: [graphlib.from_raw(raw) for _, raw in items]
                  for sig, items in by_sig.items()}
        nbytes = sum(l.nbytes for gs in graphs.values()
                     for g in gs for l in jax.tree.leaves(g))
        if nbytes > budget_mb * 1e6:
            logger.info(
                "confidence device cache: %d complexes = %.0f MB exceeds "
                "budget %.0f MB; using host batching",
                len(base), nbytes / 1e6, budget_mb)
            self._dev_stage[key] = False
            return False
        groups, rows = {}, {}
        for sig, items in by_sig.items():
            groups[sig] = jax.device_put(graphlib.stack(graphs[sig]))
            for row, (name, _) in enumerate(items):
                rows[name] = (sig, row)
        logger.info(
            "confidence device cache: staged %d complexes (%d shape "
            "groups, %.0f MB); per-step uploads are positions only",
            len(base), len(groups), nbytes / 1e6)
        stage = {"groups": groups, "rows": rows}
        self._dev_stage[key] = stage
        return stage

    def _batches(self, data: FilteringDataset, rng):
        """Yield (graph-or-_DevBatch, labels, affinities, times)
        bucket-uniform batches (affinity is NaN where no index entry
        exists; time is 0 except under trajectory sampling)."""
        examples = []
        for i in range(len(data)):
            ex = data.get(i, rng)
            if ex is not None:
                examples.append(ex)
        # group by bucket signature
        from ..data.dataset import bucket_key

        stage = self._stage_device(data, examples)
        groups = {}
        for ex in examples:
            d0 = ex[0][0] if self.parallel > 1 else ex[0]
            groups.setdefault(bucket_key(d0.raw), []).append(ex)
        for sig, group in groups.items():
            for i in range(0, len(group), self.batch_size):
                batch = group[i : i + self.batch_size]
                n_real = len(batch)
                while len(batch) < self.batch_size:
                    batch.append(batch[len(batch) % n_real])
                if self.parallel > 1:
                    # one example = `parallel` consecutive graph rows of the
                    # same complex; labels [B, P], affinity/time per complex
                    flat = [d for ds, _, _, _ in batch for d in ds]
                    y = jnp.asarray(np.stack([y for _, y, _, _ in batch]))
                    # per-row times (B*P graph rows)
                    tvals = jnp.asarray(
                        np.repeat([t for _, _, _, t in batch], self.parallel),
                        jnp.float32,
                    )
                else:
                    flat = [d for d, _, _, _ in batch]
                    y = jnp.asarray([y for _, y, _, _ in batch])
                    tvals = jnp.asarray([t for _, _, _, t in batch], jnp.float32)
                aff = jnp.asarray([a for _, _, a, _ in batch], jnp.float32)
                if stage:
                    rows = np.asarray(
                        [stage["rows"][d.name][1] for d in flat], np.int32)
                    pos = [_padded_positions(d.raw) for d in flat]
                    g = _DevBatch(
                        stacked=stage["groups"][sig],
                        rows=jnp.asarray(rows),
                        lig_pos=jnp.asarray(np.stack([p[0] for p in pos])),
                        atom_pos=jnp.asarray(np.stack([p[1] for p in pos])),
                    )
                else:
                    g = graphlib.stack([graphlib.from_raw(d.raw) for d in flat])
                yield g, y, aff, tvals

    def _step_train(self, params, batch_stats, opt_state, key, g, y, aff, tvals):
        if isinstance(g, _DevBatch):
            return self._gather_train_step(
                params, batch_stats, opt_state, key,
                g.stacked, g.rows, g.lig_pos, g.atom_pos, y, aff, tvals)
        return self.train_step(
            params, batch_stats, opt_state, key, g, y, aff, tvals)

    def _step_eval(self, params, batch_stats, g, y, aff, tvals):
        if isinstance(g, _DevBatch):
            return self._gather_eval_step(
                params, batch_stats,
                g.stacked, g.rows, g.lig_pos, g.atom_pos, y, aff, tvals)
        return self.eval_step(params, batch_stats, g, y, aff, tvals)

    @staticmethod
    def _materialize(g):
        """A concrete ComplexGraph for shape-dependent init."""
        if isinstance(g, _DevBatch):
            return _gather_graph(g.stacked, g.rows, g.lig_pos, g.atom_pos)
        return g

    def fit(self, n_epochs: int):
        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed)
        params = batch_stats = opt_state = None
        # fresh metrics history per fit(): a relaunch into the same run_dir
        # would otherwise append to the previous run's epochs and corrupt
        # any report that reads first/last/count from this file
        hist_path = os.path.join(self.run_dir, "metrics.jsonl")
        if os.path.exists(hist_path):
            os.remove(hist_path)
        for epoch in range(n_epochs):
            t0 = time.time()
            losses, accs, aff_losses = [], [], []
            for g, y, aff, tvals in self._batches(self.train_data, rng):
                if params is None:
                    variables = init_random_variables(
                        self.cfg, self._materialize(g), seed=self.seed)
                    params = variables["params"]
                    if self.transfer_params is not None:
                        params = _transfer_matching(params, self.transfer_params)
                    batch_stats = variables.get("batch_stats", {})
                    opt_state = self.optimizer.init(params)
                key, sub = jax.random.split(key)
                aff_z = (aff - self.aff_mean) / self.aff_std
                params, batch_stats, opt_state, aux = self._step_train(
                    params, batch_stats, opt_state, sub, g, y, aff_z, tvals
                )
                losses.append(float(aux["loss"]))
                accs.append(float(aux["accuracy"]))
                if "affinity_loss" in aux:
                    aff_losses.append(float(aux["affinity_loss"]))

            val_losses, val_scores, val_labels = [], [], []
            val_aff_pred, val_aff_true = [], []
            for _ in range(self.val_multiplicity):
                for g, y, aff, tvals in self._batches(self.val_data, rng):
                    aff_z = (aff - self.aff_mean) / self.aff_std
                    loss, logits, aff_pred = self._step_eval(
                        params, batch_stats, g, y, aff_z, tvals
                    )
                    val_losses.append(float(loss))
                    val_scores.append(np.asarray(logits).reshape(-1))
                    val_labels.append(np.asarray(y).reshape(-1))
                    if aff_pred is not None:
                        # un-standardize: report MSE in label units
                        val_aff_pred.append(
                            np.asarray(aff_pred).reshape(-1) * self.aff_std
                            + self.aff_mean
                        )
                        val_aff_true.append(np.asarray(aff).reshape(-1))
            metrics = {
                "loss": float(np.mean(losses)) if losses else 0.0,
                "accuracy": float(np.mean(accs)) if accs else 0.0,
                "val_loss": float(np.mean(val_losses)) if val_losses else 0.0,
            }
            if aff_losses:
                metrics["affinity_loss"] = float(np.mean(aff_losses))
            if val_aff_pred:
                p = np.concatenate(val_aff_pred)
                t = np.concatenate(val_aff_true)
                ok = np.isfinite(t)
                if ok.any():
                    metrics["val_affinity_mse"] = float(
                        np.mean((p[ok] - t[ok]) ** 2)
                    )
            if val_scores and self.loss_type == "bce":
                metrics["val_roc_auc"] = roc_auc(
                    np.concatenate(val_labels), np.concatenate(val_scores)
                )
            logger.info(
                "confidence epoch %d (%.1fs): %s", epoch, time.time() - t0,
                {k: round(v, 4) for k, v in metrics.items()},
            )
            # per-epoch metrics history (read by journey report scripts)
            import json as _json

            with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as fh:
                fh.write(_json.dumps({"epoch": epoch, **metrics}) + "\n")
            self._checkpoint(params, batch_stats, metrics)
        return params, batch_stats

    def evaluate(self, data, params, batch_stats, multiplicity: int = 1,
                 rng=None):
        """Eval-only pass over ``data``: mean loss/accuracy + raw
        (scores, labels).  ``multiplicity`` repeats the pass with fresh pose
        draws (reference test_epoch multiplicity,
        filtering_train.py:184-240)."""
        rng = rng or np.random.default_rng(self.seed)
        losses, scores, labels = [], [], []
        for _ in range(max(1, multiplicity)):
            for g, y, aff, tvals in self._batches(data, rng):
                aff_z = (aff - self.aff_mean) / self.aff_std
                loss, logits, _ = self._step_eval(
                    params, batch_stats, g, y, aff_z, tvals
                )
                losses.append(float(loss))
                scores.append(np.asarray(logits).reshape(-1))
                labels.append(np.asarray(y).reshape(-1))
        scores = np.concatenate(scores) if scores else np.zeros(0)
        labels = np.concatenate(labels) if labels else np.zeros(0)
        metrics = {
            "loss": float(np.mean(losses)) if losses else 0.0,
            "accuracy": float(np.mean((scores > 0) == (labels > 0.5)))
            if len(scores) else 0.0,
        }
        if self.loss_type == "bce" and len(scores):
            metrics["roc_auc"] = roc_auc(labels, scores)
        return metrics, scores, labels

    def test(self, data, params, batch_stats, out_dir: str,
             multiplicity: int = 1, n_steps: int | None = None):
        """Reference test() parity (filtering_train.py:384-419): under
        trajectory sampling, evaluate every reverse-diffusion step index
        separately (fixed_step sweep) and persist per-step + combined
        metrics as npz; without trajectories, a single eval pass.

        n_steps defaults to the pose cache's actual trajectory length
        (valid fixed_step values are 0..len(trajectory)-1; a fixed 21 as in
        the reference would silently wrap to trajectory[-1] with t > 1 on
        caches generated with inference_steps != 21)."""
        os.makedirs(out_dir, exist_ok=True)
        if getattr(data, "trajectory_sampling", False):
            avail = getattr(data, "trajectory_steps", None)
            if n_steps is None:
                n_steps = avail
            elif avail is not None and n_steps > avail:
                logger.warning(
                    "test: n_steps=%d > trajectory length %d; clamping",
                    n_steps, avail,
                )
                n_steps = avail
            steps = range(n_steps)
        else:
            steps = [None]
        all_losses, all_accs, all_scores, all_labels = [], [], [], []
        for step in steps:
            if step is not None:
                data.fixed_step = step
            metrics, scores, labels = self.evaluate(
                data, params, batch_stats, multiplicity=multiplicity
            )
            logger.info("test step %s: %s", step, metrics)
            all_losses.append(metrics["loss"])
            all_accs.append(metrics["accuracy"])
            all_scores.append(scores)
            all_labels.append(labels)
            if step is not None:
                np.savez(
                    os.path.join(out_dir, f"val_eval_step{step}.npz"),
                    loss=metrics["loss"], accuracy=metrics["accuracy"],
                    predictions=scores, labels=labels,
                )
        np.savez(
            os.path.join(out_dir, "val_eval.npz"),
            loss=np.asarray(all_losses), accuracy=np.asarray(all_accs),
            predictions=np.asarray(all_scores, dtype=object),
            labels=np.asarray(all_labels, dtype=object),
        )
        return {
            "loss": float(np.mean(all_losses)),
            "accuracy": float(np.mean(all_accs)),
        }

    def _checkpoint(self, params, batch_stats, metrics):
        v = metrics.get(
            self.main_metric, metrics.get(f"val_{self.main_metric}", metrics["val_loss"])
        )
        better = self.best is None or (
            v > self.best if self.main_metric_goal == "max" else v < self.best
        )
        state = {"params": params, "batch_stats": batch_stats}
        if better:
            self.best = v
            ckpt.save_checkpoint(os.path.join(self.run_dir, "best_model"), state)
        ckpt.save_checkpoint(os.path.join(self.run_dir, "last_model"), state)


def _transfer_matching(params, source):
    """Copy parameters whose path+shape match (reference transfer_weights
    init from the score model, filtering_train.py:483-492)."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    out = {}
    n = 0
    for k, v in flat_t.items():
        s = flat_s.get(k)
        if s is not None and s.shape == v.shape:
            out[k] = s
            n += 1
        else:
            out[k] = v
    logger.info("transferred %d/%d parameter tensors", n, len(flat_t))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]])
