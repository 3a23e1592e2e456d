"""Training engine: on-device forward diffusion (noise transform), the
4-component denoising score-matching loss, the optimizer/EMA step, and
epoch drivers.

Parity targets (reference):
- NoiseTransform.apply_noise      datasets/pdbbind.py:38-105 (numpy, in CPU
                                  dataloader workers) -> here fully on device
                                  inside the jitted train step, vmapped over
                                  the batch;
- loss_function                   utils/training.py:19-109 (sigma-weighted
                                  4-term MSE with per-manifold normalization);
- train_epoch/test_epoch          utils/training.py:147-256;
- ExponentialMovingAverage        utils/utils.py:166-248 (warmup decay
                                  min(decay, (1+n)/(10+n))).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import diffusion, tables
from .diffusion import SigmaConfig
from .graph import ComplexGraph

Array = jax.Array


# ---------------------------------------------------------------------------
# forward diffusion (noise transform)
# ---------------------------------------------------------------------------

class NoiseTargets(NamedTuple):
    tr_score: Array  # [B, 3]
    rot_score: Array  # [B, 3]
    tor_score: Array  # [B, T]
    sc_tor_score: Array  # [B, S]


@dataclass(frozen=True)
class NoiseConfig:
    alpha: float = 1.0
    beta: float = 1.0
    rot_alpha: float = 1.0
    rot_beta: float = 1.0
    tor_alpha: float = 1.0
    tor_beta: float = 1.0
    sc_tor_alpha: float = 1.0
    sc_tor_beta: float = 1.0
    separate_noise_schedule: bool = False
    asyncronous_noise_schedule: bool = False
    no_torsion: bool = False
    flexible_sidechains: bool = True


def beta_ppf_grids(cfg: NoiseConfig, n: int = 4096) -> dict[str, np.ndarray]:
    """Per-manifold inverse Beta CDF lookup grids over u in [0, 1]
    (host-precomputed; jnp.interp replaces scipy's ppf inside jit —
    reference get_inverse_schedule, diffusion_utils.py:120-121)."""
    from scipy.stats import beta as beta_dist

    u = np.linspace(0.0, 1.0, n)
    out = {}
    for m, (a, b) in {
        "tr": (cfg.alpha, cfg.beta),
        "rot": (cfg.rot_alpha, cfg.rot_beta),
        "tor": (cfg.tor_alpha, cfg.tor_beta),
        "sc_tor": (cfg.sc_tor_alpha, cfg.sc_tor_beta),
    }.items():
        out[m] = np.asarray(beta_dist.ppf(u, a=a, b=b), np.float32)
    return out


def sample_times(
    key: jax.Array, B: int, cfg: NoiseConfig,
    inv_grids: Optional[dict] = None,
) -> dict[str, Array]:
    """t ~ Beta(alpha, beta) per complex; separate per-manifold draws when
    separate_noise_schedule; with asyncronous_noise_schedule a common base
    t ~ U(0,1) is warped per manifold through the inverse Beta CDF and the
    base is returned under "t" for the model's timestep embedding
    (reference NoiseTransform.get_time, pdbbind.py:62-84)."""
    if cfg.separate_noise_schedule:
        ks = jax.random.split(key, 4)
        return {
            "tr": jax.random.beta(ks[0], cfg.alpha, cfg.beta, (B,)),
            "rot": jax.random.beta(ks[1], cfg.rot_alpha, cfg.rot_beta, (B,)),
            "tor": jax.random.beta(ks[2], cfg.tor_alpha, cfg.tor_beta, (B,)),
            "sc_tor": jax.random.beta(ks[3], cfg.sc_tor_alpha, cfg.sc_tor_beta, (B,)),
        }
    if cfg.asyncronous_noise_schedule:
        assert inv_grids is not None, "async schedules need beta_ppf_grids()"
        t = jax.random.uniform(key, (B,))
        u = jnp.linspace(0.0, 1.0, len(inv_grids["tr"]))
        out = {
            m: jnp.interp(t, u, jnp.asarray(inv_grids[m]))
            for m in ("tr", "rot", "tor", "sc_tor")
        }
        out["t"] = t
        return out
    t = jax.random.beta(key, cfg.alpha, cfg.beta, (B,))
    return {"tr": t, "rot": t, "tor": t, "sc_tor": t}


def apply_noise(
    key: jax.Array,
    g: ComplexGraph,  # batched [B, ...]
    t: dict[str, Array],
    sigma: SigmaConfig,
    so3: tables.SO3Tables,
    torus: tables.TorusTables,
    cfg: NoiseConfig,
) -> tuple[ComplexGraph, NoiseTargets]:
    """Perturb each complex at its drawn t and attach exact score targets —
    entirely on device (the reference runs this in numpy per sample in the
    dataloader workers)."""
    B = g.lig_pos.shape[0]
    T = g.tor_bond_index.shape[1]
    S = g.sc_bond_index.shape[1]
    s_tr, s_rot, s_tor, s_sc = sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])

    k_tr, k_rot, k_tor, k_sc = jax.random.split(key, 4)
    tr_update = jax.random.normal(k_tr, (B, 3)) * s_tr[:, None]
    rot_update = so3.sample_vec(k_rot, s_rot)  # [B, 3]
    tor_update = tables.TorusTables.sample(k_tor, s_tor[:, None], (B, T))
    sc_update = tables.TorusTables.sample(k_sc, s_sc[:, None], (B, S))

    atom_pos = g.atom_pos
    if cfg.flexible_sidechains and S > 0:
        atom_pos = jax.vmap(diffusion.apply_sidechain_torsion_updates)(
            atom_pos, g.sc_bond_index, g.sc_rotate_mask, sc_update, g.sc_bond_mask
        )
    lig_pos = jax.vmap(
        partial(diffusion.modify_conformer, with_torsion=not cfg.no_torsion)
    )(
        g.lig_pos, g.lig_mask, tr_update, rot_update,
        g.tor_bond_index, g.tor_rotate_mask, tor_update, g.tor_bond_mask,
    )
    g_noised = g.replace(lig_pos=lig_pos, atom_pos=atom_pos)

    targets = NoiseTargets(
        tr_score=-tr_update / (s_tr**2)[:, None],
        rot_score=so3.score_vec(s_rot, rot_update),
        tor_score=torus.score_fn(tor_update, s_tor[:, None]),
        sc_tor_score=torus.score_fn(sc_update, s_sc[:, None]),
    )
    return g_noised, targets


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LossWeights:
    tr: float = 1.0
    rot: float = 1.0
    tor: float = 1.0
    sc_tor: float = 1.0


def loss_function(
    preds: tuple[Array, Array, Array, Array],
    targets: NoiseTargets,
    g: ComplexGraph,
    t: dict[str, Array],
    sigma: SigmaConfig,
    so3: tables.SO3Tables,
    torus: tables.TorusTables,
    weights: LossWeights = LossWeights(),
    no_torsion: bool = False,
    flexible_sidechains: bool = True,
    apply_mean: bool = True,
):
    """Sigma-normalized 4-term score-matching loss (reference
    utils/training.py:19-109): tr scaled by sigma^2, rot by 1/score_norm^2,
    torsions by 1/torus score_norm; torsion terms are masked means over the
    real bonds of each complex."""
    tr_pred, rot_pred, tor_pred, sc_pred = preds
    s_tr, s_rot, s_tor, s_sc = sigma.t_to_sigma(t["tr"], t["rot"], t["tor"], t["sc_tor"])

    tr_loss = jnp.mean(
        (tr_pred - targets.tr_score) ** 2 * (s_tr**2)[:, None], axis=1
    )
    tr_base = jnp.mean(targets.tr_score**2 * (s_tr**2)[:, None], axis=1)

    rot_norm = so3.score_norm(s_rot)[:, None]
    rot_loss = jnp.mean(((rot_pred - targets.rot_score) / rot_norm) ** 2, axis=1)
    rot_base = jnp.mean((targets.rot_score / rot_norm) ** 2, axis=1)

    def _masked_bond_loss(pred, target, mask, norm2):
        # apply_mean=True: mean over ALL real bonds in the batch (reference
        # utils/training.py:48 `tor_loss.mean()` — complexes contribute
        # proportionally to their bond count).  apply_mean=False: per-complex
        # masked means (reference's index_add unpooled eval path, :50-58).
        per_bond = (pred - target) ** 2 / norm2
        base = target**2 / norm2
        m = mask.astype(pred.dtype)
        if apply_mean:
            total = jnp.maximum(m.sum(), 1e-4)
            l = jnp.broadcast_to((per_bond * m).sum() / total, tr_loss.shape)
            b = jnp.broadcast_to((base * m).sum() / total, tr_loss.shape)
            return l, b
        cnt = jnp.maximum(m.sum(axis=1), 1e-4)
        return (per_bond * m).sum(axis=1) / cnt, (base * m).sum(axis=1) / cnt

    if no_torsion:
        tor_loss = tor_base = jnp.zeros_like(tr_loss)
    else:
        tor_norm2 = torus.score_norm(s_tor)[:, None]
        tor_loss, tor_base = _masked_bond_loss(
            tor_pred, targets.tor_score, g.tor_bond_mask, tor_norm2
        )

    if not flexible_sidechains:
        sc_loss = sc_base = jnp.zeros_like(tr_loss)
    else:
        sc_norm2 = torus.score_norm(s_sc)[:, None]
        sc_loss, sc_base = _masked_bond_loss(
            sc_pred, targets.sc_tor_score, g.sc_bond_mask, sc_norm2
        )

    loss = (
        tr_loss * weights.tr
        + rot_loss * weights.rot
        + tor_loss * weights.tor
        + sc_loss * weights.sc_tor
    )
    aux = {
        "tr_loss": tr_loss, "rot_loss": rot_loss, "tor_loss": tor_loss,
        "sc_tor_loss": sc_loss, "tr_base_loss": tr_base,
        "rot_base_loss": rot_base, "tor_base_loss": tor_base,
        "sc_tor_base_loss": sc_base,
    }
    if apply_mean:
        loss = loss.mean()
        aux = {k: v.mean() for k, v in aux.items()}
    return loss, aux


# ---------------------------------------------------------------------------
# EMA (reference utils/utils.py:166-248)
# ---------------------------------------------------------------------------

class EMAState(NamedTuple):
    params: Any
    num_updates: Array


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.array, params), num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new = jax.tree.map(lambda e, p: e * d + p * (1 - d), state.params, params)
    return EMAState(params=new, num_updates=n)


# ---------------------------------------------------------------------------
# train state / step
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: Array


def create_train_state(variables, optimizer) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        ema=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    )


def score_norms(t, sigma: SigmaConfig, so3: tables.SO3Tables,
                torus: tables.TorusTables):
    """Per-manifold expected score norms at the drawn times (model input)."""
    _, s_rot, s_tor, s_sc = sigma.t_to_sigma(
        t["tr"], t["rot"], t["tor"], t["sc_tor"])
    return {
        "rot": so3.score_norm(s_rot),
        "tor": torus.score_norm(s_tor),
        "sc_tor": torus.score_norm(s_sc),
    }


def make_train_step(
    model,
    optimizer,
    sigma: SigmaConfig,
    noise_cfg: NoiseConfig,
    loss_weights: LossWeights = LossWeights(),
    ema_decay: float = 0.999,
    axis_name: Optional[str] = None,
):
    """Build the jitted train step: sample t, apply noise, forward, loss,
    grads (psum over `axis_name` when running data-parallel), adam + EMA.

    The diffusion tables are an explicit pytree ARGUMENT (`tbl`) of the
    returned step, not a closure: closed-over table arrays get inlined into
    the lowered HLO as literals (~430 MB per executable with the full torus
    grids), which wrecks compile time, HBM, and remote-compile transfer."""
    inv_grids = (
        beta_ppf_grids(noise_cfg)
        if noise_cfg.asyncronous_noise_schedule else None
    )

    def loss_fn(params, batch_stats, key, g, tbl: tables.Tables):
        so3, torus = tbl.so3, tbl.torus
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        B = g.lig_pos.shape[0]
        t = sample_times(k_t, B, noise_cfg, inv_grids)
        g_noised, targets = apply_noise(k_noise, g, t, sigma, so3, torus, noise_cfg)
        preds, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_noised, t, score_norms(t, sigma, so3, torus),
            train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"],
        )
        loss, aux = loss_function(
            preds, targets, g_noised, t, sigma, so3, torus, loss_weights,
            no_torsion=noise_cfg.no_torsion,
            flexible_sidechains=noise_cfg.flexible_sidechains,
        )
        return loss, (aux, mutated["batch_stats"])

    def train_step(state: TrainState, key, g: ComplexGraph, tbl: tables.Tables):
        (loss, (aux, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, key, g, tbl
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema=ema_update(state.ema, new_params, ema_decay),
            step=state.step + 1,
        )
        aux["loss"] = loss
        return new_state, aux

    return train_step


def make_eval_step(model, sigma: SigmaConfig, noise_cfg: NoiseConfig,
                   loss_weights: LossWeights = LossWeights()):
    """Validation loss step (EMA or raw params; running batch-norm stats).

    Takes the diffusion tables as an explicit argument (see make_train_step)."""
    inv_grids = (
        beta_ppf_grids(noise_cfg)
        if noise_cfg.asyncronous_noise_schedule else None
    )

    def eval_step(params, batch_stats, key, g, tbl: tables.Tables,
                  t_override=None):
        so3, torus = tbl.so3, tbl.torus
        k_t, k_noise = jax.random.split(key)
        B = g.lig_pos.shape[0]
        t = t_override if t_override is not None else sample_times(k_t, B, noise_cfg, inv_grids)
        g_noised, targets = apply_noise(k_noise, g, t, sigma, so3, torus, noise_cfg)
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_noised, t, score_norms(t, sigma, so3, torus), train=False,
        )
        loss, aux = loss_function(
            preds, targets, g_noised, t, sigma, so3, torus, loss_weights,
            no_torsion=noise_cfg.no_torsion,
            flexible_sidechains=noise_cfg.flexible_sidechains,
            apply_mean=False,
        )
        aux["loss"] = loss
        aux["t_tr"] = t["tr"]
        return aux

    return eval_step


def make_stats_step(model, sigma: SigmaConfig, noise_cfg: NoiseConfig):
    """Batch-norm statistics re-estimation step (no loss, no grads).

    Runs one noised forward in train mode with only the ``batch_stats``
    collection mutable and returns the updated running statistics.  Used by
    the trainer's BN-stats refresh: the trunk's masked per-irrep BatchNorm
    accumulates running stats by momentum during training, but the pre-norm
    activation scale drifts faster than the running average tracks (measured
    late-layer running variances ~1e6-1e7 on the corpus run), so eval mode
    (use_running_average=True) intermittently amplifies — observed as
    sporadic val-loss explosions (val rot loss 1e2-1e4 while the same batch
    under batch statistics is ~0.5) and one diverged val-docking epoch.
    Re-estimating the stats under the CURRENT (EMA) weights immediately
    before evaluation removes the lag.  Deviation from the reference, which
    evaluates on momentum-accumulated e3nn BatchNorm stats
    (models/score_model.py:98 via e3nn.nn.BatchNorm) and simply lives with
    the gap at its training scale."""
    inv_grids = (
        beta_ppf_grids(noise_cfg)
        if noise_cfg.asyncronous_noise_schedule else None
    )

    def stats_step(params, batch_stats, key, g, tbl: tables.Tables):
        so3, torus = tbl.so3, tbl.torus
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        B = g.lig_pos.shape[0]
        t = sample_times(k_t, B, noise_cfg, inv_grids)
        g_noised, _ = apply_noise(k_noise, g, t, sigma, so3, torus, noise_cfg)
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_noised, t, score_norms(t, sigma, so3, torus),
            train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"],
        )
        return mutated["batch_stats"]

    return stats_step
