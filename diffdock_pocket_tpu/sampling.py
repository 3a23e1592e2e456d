"""Reverse-diffusion sampler — the whole loop jitted on device.

Capability parity with reference utils/sampling.py (randomize_position +
Euler-Maruyama/prob-flow reverse SDE over the four manifolds + low-temperature
sampling + confidence scoring).  TPU-native redesign: one ``lax.scan`` over
inference steps; per step the score-model forward, the g(t)/noise updates and
the conformer/side-chain modifications all stay on device — the reference
instead re-collates a DataLoader and bounces scores and positions through
numpy on every step (sampling.py:100-125, 245-251).

Keys are threaded through the scan; every sample in the batch gets
independent noise.  All shape-touching config is static (dataclass), so jit
compiles once per (bucket, config).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import diffusion, geometry
from .diffusion import SigmaConfig
from .graph import ComplexGraph

Array = jax.Array


@dataclass(frozen=True)
class SamplerConfig:
    inference_steps: int = 20
    no_random: bool = False
    ode: bool = False
    no_final_step_noise: bool = True
    no_torsion: bool = False
    flexible_sidechains: bool = True
    # low-temperature sampling (reference inference.py:89-101 defaults)
    temp_sampling: tuple = (1.0, 1.0, 1.0, 1.0)  # tr, rot, tor, sc_tor
    temp_psi: tuple = (0.0, 0.0, 0.0, 0.0)
    temp_sigma_data: float = 0.5
    return_trajectory: bool = False
    # run the reduced score model (skip_heavy_intra: no rec/atom intra
    # families) for the FIRST this-many steps — receptor internals barely
    # change while the ligand is far away at high sigma.  0 = full model
    # on every step.  Requires passing score_fn_early to reverse_diffusion.
    skip_intra_steps: int = 0
    # SVGD particle interaction (reference sampling.py:197-243); the batch of
    # samples interacts through an RBF kernel over rigid+torsional distances
    svgd_weight: float = 0.0
    svgd_repulsive_weight: float = 1.0
    svgd_only: bool = False
    svgd_rot_rel_weight: float = 1.0
    svgd_tor_rel_weight: float = 1.0
    # jit one reverse step and dispatch it from a host loop instead of
    # compiling the whole lax.scan: the scan's XLA TPU compile is a
    # schedule lottery (~146-434 ms/step for the same program; fast draws
    # measured ~1/12) while the step body compiles consistently fast —
    # measured 145.8 ms/step first-draw vs the scan's 147.4 ms best-ever
    # draw (BASELINE.md).  Default ON; env override DDP_TPU_SAMPLER_LOOP=0/1
    step_loop: bool = True


MANIFOLDS = ("tr", "rot", "tor", "sc_tor")


def make_schedules(
    sigma_schedule: str,
    inference_steps: int,
    inf_sched_alpha=1,
    inf_sched_beta=1,
    asyncronous: bool = False,
    manifold_alphas: Optional[dict] = None,  # {"tr": (alpha, beta), ...}
):
    """Per-manifold t schedules {manifold: [steps]}.

    Default: all four manifolds share the expbeta schedule (reference
    inference.py:110-120).  With ``asyncronous``, each manifold follows its
    own inverse-Beta warp of the common base schedule (reference
    utils/training.py:263-267 + diffusion_utils.py:120-121); the base
    schedule is returned under the extra key "t" (the model's timestep
    embedding consumes it, reference score_model.py:485-486)."""
    sched = diffusion.get_t_schedule(
        sigma_schedule, inference_steps, inf_sched_alpha, inf_sched_beta
    )
    if not asyncronous:
        shared = jnp.asarray(sched)
        return {m: shared for m in MANIFOLDS}
    out = {"t": jnp.asarray(sched)}
    for m in MANIFOLDS:
        a, b = (manifold_alphas or {}).get(m, (1.0, 1.0))
        out[m] = jnp.asarray(
            diffusion.get_inverse_schedule(sched, a, b), jnp.float32
        )
    return out


def randomize_position(
    key: jax.Array,
    g: ComplexGraph,  # batched [S, ...]
    sigma: SigmaConfig,
    no_torsion: bool = False,
    no_random: bool = False,
    flexible_sidechains: bool = True,
    pocket_center: Optional[Array] = None,
) -> ComplexGraph:
    """Initialize the batch at t=1 (reference sampling.py:16-60):
    uniform torsion angles, uniform side-chain chi angles, uniform rigid
    rotation about the ligand center, ligand centroid at the pocket center
    (the origin of the centered frame) plus N(0, tr_sigma_max) translation.
    """
    S, NL = g.lig_pos.shape[:2]
    T = g.tor_bond_index.shape[1]
    SC = g.sc_bond_index.shape[1]
    k_tor, k_sc, k_rot, k_tr = jax.random.split(key, 4)

    lig_pos = g.lig_pos
    if not no_torsion:
        tor_updates = jax.random.uniform(k_tor, (S, T), minval=-jnp.pi, maxval=jnp.pi)
        lig_pos = jax.vmap(diffusion.apply_torsion_updates)(
            lig_pos, g.tor_bond_index, g.tor_rotate_mask, tor_updates, g.tor_bond_mask
        )

    atom_pos = g.atom_pos
    if flexible_sidechains and SC > 0:
        sc_updates = jax.random.uniform(k_sc, (S, SC), minval=-jnp.pi, maxval=jnp.pi)
        atom_pos = jax.vmap(diffusion.apply_sidechain_torsion_updates)(
            atom_pos, g.sc_bond_index, g.sc_rotate_mask, sc_updates, g.sc_bond_mask
        )

    # uniform rigid rotation about the ligand center, then place at pocket
    w = g.lig_mask.astype(lig_pos.dtype)
    center = (lig_pos * w[..., None]).sum(1) / jnp.maximum(w.sum(1), 1.0)[..., None]
    rots = geometry.uniform_rotation(k_rot, (S,))
    lig_pos = geometry.pmm(lig_pos - center[:, None, :], jnp.swapaxes(rots, -1, -2))
    if pocket_center is not None:
        lig_pos = lig_pos + pocket_center[None, None, :]
    if not no_random:
        tr = jax.random.normal(k_tr, (S, 1, 3)) * sigma.tr_sigma_max
        lig_pos = lig_pos + tr
    return g.replace(lig_pos=lig_pos, atom_pos=atom_pos)


def _perturbation(score, sigma, g_coef, dt, z, temp, psi, sigma_data_point, ode):
    """One manifold's reverse-SDE update (reference sampling.py:137-195)."""
    if ode:
        return 0.5 * g_coef**2 * dt * score
    if temp != 1.0:
        lam = (sigma_data_point + sigma) / (sigma_data_point + sigma / temp)
        return (
            g_coef**2 * dt * (lam + temp * psi / 2.0) * score
            + g_coef * jnp.sqrt(dt * (1 + psi)) * z
        )
    return g_coef**2 * dt * score + g_coef * jnp.sqrt(dt) * z


def _sigma_data_point(temp_sigma_data, smax, smin):
    return math.exp(
        temp_sigma_data * math.log(smax) + (1 - temp_sigma_data) * math.log(smin)
    )


# ---------------------------------------------------------------------------
# SVGD particle interaction (reference utils/sampling.py:197-243 and
# utils/torsion.py:96-160) — fully vectorized over the S x S sample pairs.
# ---------------------------------------------------------------------------

def dihedral_indices(g: ComplexGraph):
    """[T, 4] (c, a, b, d) dihedral atoms per rotatable bond: c is a bond
    neighbor of a (not b), d a neighbor of b (not a) — reference
    get_dihedrals (torsion.py:96-114).  Computed from the shared topology
    (sample 0)."""
    bonds = g.lig_bond_index[0]  # [EB, 2]
    bmask = g.lig_bond_mask[0]
    tor = g.tor_bond_index[0]  # [T, 2]
    a, b = tor[:, 0], tor[:, 1]

    def first_neighbor(node, exclude):
        # bonds are directed (both ways present): match src == node, dst != exclude
        hit = bmask & (bonds[:, 0] == node) & (bonds[:, 1] != exclude)
        idx = jnp.argmax(hit)  # first matching bond (0 if none; masked later)
        return bonds[idx, 1]

    c = jax.vmap(first_neighbor)(a, b)
    d = jax.vmap(first_neighbor)(b, a)
    return jnp.stack([c, a, b, d], axis=-1)


def torsion_angles(pos: Array, dihedrals: Array) -> Array:
    """Signed dihedral angles [S, T] from positions [S, N, 3] (reference
    get_torsion_angles, torsion.py:121-141)."""
    c, a, b, d = (dihedrals[:, i] for i in range(4))
    pc, pa, pb, pd = (pos[:, idx] for idx in (c, a, b, d))
    ab = pb - pa
    denom = jnp.sum(ab * ab, axis=-1, keepdims=True).clip(1e-12)
    c_proj = pa + jnp.sum((pc - pa) * ab, -1, keepdims=True) / denom * ab
    d_proj = pa + jnp.sum((pd - pa) * ab, -1, keepdims=True) / denom * ab
    d_shift = pd - d_proj + c_proj
    u1 = d_shift - c_proj
    u2 = pc - c_proj
    cos = jnp.sum(u1 * u2, -1) / (
        jnp.linalg.norm(u1, axis=-1) * jnp.linalg.norm(u2, axis=-1)
    ).clip(1e-12)
    ang = jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))
    sign = jnp.sign(jnp.sum(jnp.cross(u1, u2) * ab, -1))
    return ang * sign


def _svgd_terms(g: ComplexGraph, dihedrals, cfg: SamplerConfig):
    """Pairwise kernel + difference tensors over the sample batch."""
    S = g.lig_pos.shape[0]
    w = g.lig_mask[0].astype(g.lig_pos.dtype)

    # pairwise rigid transforms (Kabsch-independent: translation + rot vec)
    def pair(i_pos, j_pos):
        return geometry.kabsch_independent(i_pos, j_pos, weights=w)

    tr_diff, rot_diff = jax.vmap(
        lambda pi: jax.vmap(lambda pj: pair(pi, pj))(g.lig_pos)
    )(g.lig_pos)  # [S, S, 3] each

    tr_matrix = jnp.sum(tr_diff**2, -1)
    rot_matrix = jnp.sum(rot_diff**2, -1)

    T = g.tor_bond_index.shape[1]
    if T > 0 and not cfg.no_torsion:
        tau = torsion_angles(g.lig_pos, dihedrals)  # [S, T]
        tau = jnp.where(g.tor_bond_mask, tau, 0.0)
        tau_diff = tau[:, None, :] - tau[None, :, :]
        tau_diff = jnp.mod(tau_diff + 3 * jnp.pi, 2 * jnp.pi) - jnp.pi
        tor_matrix = jnp.sum(tau_diff**2, -1)
    else:
        tau_diff = jnp.zeros((S, S, T))
        tor_matrix = jnp.zeros((S, S))

    total = (
        tr_matrix
        + cfg.svgd_rot_rel_weight * rot_matrix
        + cfg.svgd_tor_rel_weight * tor_matrix
    )
    med2 = jnp.median(total, axis=1, keepdims=True)
    h = cfg.svgd_repulsive_weight * med2 / max(math.log(S), 1.0)
    h = jnp.maximum(h, 1e-8)
    k = jnp.exp(-total / h)
    return k, h, tr_diff, rot_diff, tau_diff


def _svgd_updates(g, dihedrals, scores, g_coefs, dts, cfg: SamplerConfig):
    """SVGD attractive + repulsive perturbation components (reference
    sampling.py:197-243)."""
    tr_score, rot_score, tor_score = scores
    g_tr, g_rot, g_tor = g_coefs
    dt_tr, dt_rot, dt_tor = dts
    S = g.lig_pos.shape[0]
    k, h, tr_diff, rot_diff, tau_diff = _svgd_terms(g, dihedrals, cfg)

    tr_rep = jnp.sum(2.0 / h[..., None] * tr_diff * k[..., None], axis=1)
    tr_att = jnp.sum(k[..., None] * tr_score[None, :, :], axis=1)
    tr_svgd = g_tr**2 * dt_tr * (tr_att + tr_rep) / S

    rot_rep = jnp.sum(
        2.0 / h[..., None] * cfg.svgd_rot_rel_weight * rot_diff * k[..., None], axis=1
    )
    rot_att = jnp.sum(k[..., None] * rot_score[None, :, :], axis=1)
    rot_svgd = g_rot**2 * dt_rot * (rot_att + rot_rep) / S

    tor_rep = jnp.sum(
        2.0 / h[..., None] * cfg.svgd_tor_rel_weight * tau_diff * k[..., None], axis=1
    )
    tor_att = jnp.sum(k[..., None] * tor_score[None, :, :], axis=1)
    tor_svgd = g_tor**2 * dt_tor * (tor_att + tor_rep) / S

    return tr_svgd, rot_svgd, tor_svgd


def reverse_diffusion(
    key: jax.Array,
    g: ComplexGraph,  # batched [S, ...] — already randomized
    score_fn: Callable,  # (graph, t_dict) -> (tr, rot, tor, sc) scores
    schedule,  # {manifold: [steps]} t values (or one shared [steps] array)
    sigma: SigmaConfig,
    cfg: SamplerConfig,
    schedule_next=None,  # same structure, next-t values
    score_fn_early: Optional[Callable] = None,  # reduced model for the
    # first cfg.skip_intra_steps steps (see SamplerConfig.skip_intra_steps)
):
    """Run the full reverse SDE under one jit.  Returns (final graph,
    trajectory) where trajectory is (lig_pos [steps, S, NL, 3],
    atom_pos [steps, S, NA, 3]) if cfg.return_trajectory else None.

    ``schedule`` carries one t array per manifold (asynchronous noise
    schedules, reference utils/sampling.py:70-96: tr/rot/tor/sc schedules are
    independent inputs and each manifold steps with its own t and dt); the
    optional extra key "t" is the base schedule consumed by the model's
    timestep embedding in asynchronous mode (reference set_time,
    diffusion_utils.py:158-165).

    ``schedule_next`` supports the --actual_steps early-stop trick
    (reference inference.py:81,457): a truncated schedule whose dt values
    come from the full-length schedule rather than treating the truncation
    point as the final step."""
    steps = cfg.inference_steps
    keys, t_all, dt_all, is_last = reverse_schedule_arrays(
        schedule, schedule_next, steps)

    step = make_reverse_step(score_fn, sigma, cfg, keys)
    k0 = cfg.skip_intra_steps if score_fn_early is not None else 0
    k0 = max(0, min(int(k0), steps))
    if k0 > 0:
        (g_mid, key_mid), traj_a = jax.lax.scan(
            make_reverse_step(score_fn_early, sigma, cfg, keys), (g, key),
            (t_all[:k0], dt_all[:k0], is_last[:k0]),
        )
        (g_final, _), traj_b = jax.lax.scan(
            step, (g_mid, key_mid), (t_all[k0:], dt_all[k0:], is_last[k0:])
        )
        traj = None
        if cfg.return_trajectory:
            traj = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], 0), traj_a, traj_b
            )
    else:
        (g_final, _), traj = jax.lax.scan(
            step, (g, key), (t_all, dt_all, is_last)
        )
    return g_final, traj


def reverse_schedule_arrays(schedule, schedule_next, steps):
    """(manifold keys, t [steps, M], dt [steps, M], is_last [steps]) for
    the reverse SDE — shared by the lax.scan path (reverse_diffusion) and
    the per-step jit path (pipeline step-loop mode)."""
    if not isinstance(schedule, dict):
        schedule = {m: schedule for m in MANIFOLDS}
    if schedule_next is not None and not isinstance(schedule_next, dict):
        schedule_next = {m: schedule_next for m in MANIFOLDS}

    keys = list(schedule.keys())
    t_all = jnp.stack([schedule[k] for k in keys], axis=-1)  # [steps, M]
    if schedule_next is None:
        t_next = jnp.concatenate([t_all[1:], jnp.zeros((1, t_all.shape[1]))])
    else:
        t_next = jnp.stack([schedule_next[k] for k in keys], axis=-1)
    dt_all = t_all - t_next  # final step: dt = t (reference sampling.py:96)
    is_last = jnp.arange(steps) == steps - 1
    return keys, t_all, dt_all, is_last


def make_reverse_step(fn, sigma: SigmaConfig, cfg: SamplerConfig, keys):
    """One reverse-SDE step as a pure ``(carry, inp) -> (carry, ys)``
    function (carry = (graph, rng key); inp = (t [M], dt [M], is_last)).

    Used two ways: scanned on-device by reverse_diffusion (one executable
    for the whole loop), or jitted ONCE and dispatched ``steps`` times from
    a host loop (pipeline step-loop mode).  The host loop exists because
    XLA's TPU compile of the 20-step scan is a schedule lottery (~146 ms to
    ~410 ms per step for the same program, BASELINE.md) while the step
    body alone compiles consistently fast; dispatch is async so the host
    loop adds only sub-ms queueing per step."""
    ki = {k: i for i, k in enumerate(keys)}

    sd_tr = _sigma_data_point(cfg.temp_sigma_data, sigma.tr_sigma_max, sigma.tr_sigma_min)
    sd_rot = _sigma_data_point(cfg.temp_sigma_data, sigma.rot_sigma_max, sigma.rot_sigma_min)
    sd_tor = _sigma_data_point(cfg.temp_sigma_data, sigma.tor_sigma_max, sigma.tor_sigma_min)
    sd_sc = _sigma_data_point(cfg.temp_sigma_data, sigma.sc_tor_sigma_max, sigma.sc_tor_sigma_min)

    def step(carry, inp):
            gr, k = carry
            # static under jit: bucket capacities of the batched graph
            S = gr.lig_pos.shape[0]
            T = gr.tor_bond_index.shape[1]
            SC = gr.sc_bond_index.shape[1]
            t_vec, dt_vec, last = inp
            k, k_tr, k_rot, k_tor, k_sc = jax.random.split(k, 5)

            t_m = {m: t_vec[ki[m]] for m in keys}
            t_dict = {m: jnp.full((S,), t_m[m]) for m in keys}
            tr_score, rot_score, tor_score, sc_score = fn(gr, t_dict)

            dt_tr, dt_rot = dt_vec[ki["tr"]], dt_vec[ki["rot"]]
            dt_tor, dt_sc = dt_vec[ki["tor"]], dt_vec[ki["sc_tor"]]
            s_tr, s_rot, s_tor, s_sc = sigma.t_to_sigma(
                t_m["tr"], t_m["rot"], t_m["tor"], t_m["sc_tor"]
            )
            g_tr = s_tr * math.sqrt(2 * math.log(sigma.tr_sigma_max / sigma.tr_sigma_min))
            g_rot = 2 * s_rot * math.sqrt(math.log(sigma.rot_sigma_max / sigma.rot_sigma_min))
            g_tor = s_tor * math.sqrt(2 * math.log(sigma.tor_sigma_max / sigma.tor_sigma_min))
            g_sc = s_sc * math.sqrt(2 * math.log(sigma.sc_tor_sigma_max / sigma.sc_tor_sigma_min))

            noise_on = 0.0 if cfg.no_random else 1.0
            if cfg.no_final_step_noise:
                noise_scale = jnp.where(last, 0.0, noise_on)
            else:
                noise_scale = noise_on
            z_tr = jax.random.normal(k_tr, (S, 3)) * noise_scale
            z_rot = jax.random.normal(k_rot, (S, 3)) * noise_scale
            z_tor = jax.random.normal(k_tor, (S, T)) * noise_scale
            z_sc = jax.random.normal(k_sc, (S, SC)) * noise_scale

            ts, tp = cfg.temp_sampling, cfg.temp_psi
            tr_p = _perturbation(tr_score, s_tr, g_tr, dt_tr, z_tr, ts[0], tp[0], sd_tr, cfg.ode)
            rot_p = _perturbation(rot_score, s_rot, g_rot, dt_rot, z_rot, ts[1], tp[1], sd_rot, cfg.ode)
            tor_p = _perturbation(tor_score, s_tor, g_tor, dt_tor, z_tor, ts[2], tp[2], sd_tor, cfg.ode)
            sc_p = _perturbation(sc_score, s_sc, g_sc, dt_sc, z_sc, ts[3], tp[3], sd_sc, cfg.ode)

            if cfg.svgd_weight > 0.0:
                dihedrals = dihedral_indices(gr)
                tr_sv, rot_sv, tor_sv = _svgd_updates(
                    gr, dihedrals,
                    (tr_score, rot_score, tor_score),
                    (g_tr, g_rot, g_tor), (dt_tr, dt_rot, dt_tor), cfg,
                )
                if cfg.svgd_only:
                    tr_p = cfg.svgd_weight * tr_sv
                    rot_p = cfg.svgd_weight * rot_sv
                    tor_p = cfg.svgd_weight * tor_sv
                else:
                    tr_p = tr_p + cfg.svgd_weight * tr_sv
                    rot_p = rot_p + cfg.svgd_weight * rot_sv
                    tor_p = tor_p + cfg.svgd_weight * tor_sv

            atom_pos = gr.atom_pos
            if cfg.flexible_sidechains and SC > 0:
                atom_pos = jax.vmap(diffusion.apply_sidechain_torsion_updates)(
                    atom_pos, gr.sc_bond_index, gr.sc_rotate_mask, sc_p, gr.sc_bond_mask
                )
            lig_pos = jax.vmap(
                partial(diffusion.modify_conformer, with_torsion=not cfg.no_torsion)
            )(
                gr.lig_pos, gr.lig_mask, tr_p, rot_p,
                gr.tor_bond_index, gr.tor_rotate_mask, tor_p, gr.tor_bond_mask,
            )
            gr = gr.replace(lig_pos=lig_pos, atom_pos=atom_pos)

            ys = (gr.lig_pos, gr.atom_pos) if cfg.return_trajectory else None
            return (gr, k), ys

    return step


def run_confidence(
    g: ComplexGraph,  # final poses [S, ...]
    confidence_fn: Callable,  # (graph, t_dict) -> confidence [S] or [S, K]
    filtering_graph: Optional[ComplexGraph] = None,
):
    """Score final poses with the confidence model at t=0 (reference
    sampling.py:263-281).  If the confidence model was trained on different
    graph parameters, ``filtering_graph`` carries that graph and receives the
    sampled ligand positions."""
    target = g if filtering_graph is None else filtering_graph.replace(lig_pos=g.lig_pos)
    S = target.lig_pos.shape[0]
    zeros = jnp.zeros((S,))
    t_dict = {"tr": zeros, "rot": zeros, "tor": zeros, "sc_tor": zeros, "t": zeros}
    return confidence_fn(target, t_dict)
