"""Diffusion schedules, timestep embeddings and on-device conformer updates.

Capability parity with reference utils/diffusion_utils.py (sigma schedules,
t-schedules, modify_conformer / modify_sidechains, timestep embeddings) and
utils/torsion.py (sequential torsion-angle application).  TPU-native design:

- conformer / torsion / side-chain updates are pure jnp functions over padded
  static-shape arrays with masks, implemented with ``lax.scan`` over a fixed
  bond capacity so the *whole reverse diffusion loop* can run inside one jit —
  the reference instead bounces every step through numpy on the host
  (utils/sampling.py:245-251).
- sequential in-place bond-rotation semantics are preserved exactly (order of
  bonds matters; each rotation sees previously-updated coordinates).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry

Array = jax.Array


# ---------------------------------------------------------------------------
# sigma(t) schedules (reference: utils/diffusion_utils.py:13-34)
# ---------------------------------------------------------------------------

def sigmoid(t):
    return 1 / (1 + jnp.exp(-t))


def sigmoid_schedule(t, k=10.0, m=0.5):
    s = lambda x: sigmoid(k * (x - m))
    return (s(t) - s(0.0)) / (s(1.0) - s(0.0))


def t_to_sigma_individual(t, schedule_type, sigma_min, sigma_max, schedule_k=10, schedule_m=0.4):
    if schedule_type == "exponential":
        return sigma_min ** (1 - t) * sigma_max**t
    elif schedule_type == "sigmoid":
        return sigmoid_schedule(t, k=schedule_k, m=schedule_m) * (sigma_max - sigma_min) + sigma_min
    raise ValueError(schedule_type)


@dataclass(frozen=True)
class SigmaConfig:
    """The four per-manifold exponential sigma ranges (reference train flags)."""

    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 5.0
    rot_sigma_min: float = 0.03
    rot_sigma_max: float = 1.55
    tor_sigma_min: float = 0.03
    tor_sigma_max: float = 3.14
    sc_tor_sigma_min: float = 0.03
    sc_tor_sigma_max: float = 3.14

    def t_to_sigma(self, t_tr, t_rot, t_tor, t_sc_tor):
        return (
            t_to_sigma_individual(t_tr, "exponential", self.tr_sigma_min, self.tr_sigma_max),
            t_to_sigma_individual(t_rot, "exponential", self.rot_sigma_min, self.rot_sigma_max),
            t_to_sigma_individual(t_tor, "exponential", self.tor_sigma_min, self.tor_sigma_max),
            t_to_sigma_individual(t_sc_tor, "exponential", self.sc_tor_sigma_min, self.sc_tor_sigma_max),
        )


def get_t_schedule(sigma_schedule, inference_steps, inf_sched_alpha=1, inf_sched_beta=1, t_max=1):
    """Host-side t-schedule (expbeta via Beta ppf; reference diffusion_utils.py:112-121)."""
    from scipy.stats import beta

    if sigma_schedule == "expbeta":
        lin_max = beta.cdf(t_max, a=inf_sched_alpha, b=inf_sched_beta)
        c = np.linspace(lin_max, 0, inference_steps + 1)[:-1]
        return np.asarray(beta.ppf(c, a=inf_sched_alpha, b=inf_sched_beta), dtype=np.float32)
    raise ValueError(sigma_schedule)


def get_inverse_schedule(t, sched_alpha=1, sched_beta=1):
    from scipy.stats import beta

    return beta.ppf(t, a=sched_alpha, b=sched_beta)


# ---------------------------------------------------------------------------
# timestep embeddings (reference: utils/diffusion_utils.py:112-151)
# ---------------------------------------------------------------------------

def sinusoidal_embedding(timesteps: Array, dim: int, scale: float = 1.0, max_positions: int = 10000) -> Array:
    """Transformer sinusoidal embedding of scalar times (...,) -> (..., dim)."""
    half_dim = dim // 2
    freqs = jnp.exp(
        jnp.arange(half_dim, dtype=jnp.float32) * -(math.log(max_positions) / (half_dim - 1))
    )
    emb = scale * timesteps[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def gaussian_fourier_embedding(timesteps: Array, w: Array) -> Array:
    """Gaussian Fourier features; ``w`` is a fixed (dim//2,) frequency draw."""
    x_proj = timesteps[..., None] * w * 2 * jnp.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def make_timestep_embedding(embedding_type: str, dim: int, scale: float = 10000.0, seed: int = 0):
    """Returns emb_fn: (...,) -> (..., dim).  'fourier' draws fixed frequencies."""
    if embedding_type == "sinusoidal":
        return partial(sinusoidal_embedding, dim=dim, scale=scale)
    elif embedding_type == "fourier":
        w = jax.random.normal(jax.random.PRNGKey(seed), (dim // 2,)) * scale
        return partial(gaussian_fourier_embedding, w=w)
    raise ValueError(embedding_type)


# ---------------------------------------------------------------------------
# torsion-angle application (reference: utils/torsion.py:68-94, exact
# sequential semantics; here a lax.scan over static bond capacity)
# ---------------------------------------------------------------------------

def apply_torsion_updates(
    pos: Array,  # [N, 3]
    bond_index: Array,  # [T, 2] int32 — bond (u, v); v side rotates
    rotate_mask: Array,  # [T, N] bool — atoms rotated by bond i
    torsion_updates: Array,  # [T] radians
    bond_mask: Array | None = None,  # [T] bool — real (non-padded) bonds
) -> Array:
    """Sequentially rotate atom subsets about each bond axis.

    Bond i rotates ``rotate_mask[i]`` atoms about axis pos[u]-pos[v] (pointing
    *inwards*, same sign convention as the reference) anchored at pos[v], by
    ``torsion_updates[i]``.  Later bonds see earlier updates (order matters
    whenever subtrees nest).  Padded bonds (mask 0) are identity.
    """
    T = bond_index.shape[0]
    if bond_mask is None:
        bond_mask = jnp.ones((T,), dtype=bool)
    theta = jnp.where(bond_mask, torsion_updates, 0.0)

    def body(p, inputs):
        (u, v), mask_row, th = inputs
        pu, pv = p[u], p[v]
        axis = pu - pv
        norm = jnp.linalg.norm(axis)
        rot_vec = axis * th / jnp.maximum(norm, 1e-12)
        rot_mat = geometry.axis_angle_to_matrix(rot_vec)
        rotated = geometry.pmm(p - pv, rot_mat.T) + pv
        p = jnp.where(mask_row[:, None], rotated, p)
        return p, None

    pos, _ = jax.lax.scan(body, pos, (bond_index, rotate_mask, theta))
    return pos


def modify_conformer(
    pos: Array,  # [N, 3] ligand positions
    lig_mask: Array,  # [N] bool — real atoms
    tr_update: Array,  # [3]
    rot_update: Array,  # [3] rotation vector
    bond_index: Array,  # [T, 2]
    rotate_mask: Array,  # [T, N]
    torsion_updates: Array,  # [T]
    bond_mask: Array,  # [T]
    with_torsion: bool = True,
) -> Array:
    """Rigid move about the ligand center + torsion update + Kabsch realign.

    Parity with reference utils/diffusion_utils.py:37-60 ``modify_conformer``:
    the torsion step composes in-place bond rotations, then the flexible
    conformer is rigidly re-aligned (Kabsch) onto the rigidly-moved conformer
    so the torsion update contributes no net translation/rotation.
    Masked atoms are carried along but excluded from center/Kabsch statistics.
    """
    w = lig_mask.astype(pos.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    center = (pos * w[:, None]).sum(0) / denom
    rot_mat = geometry.axis_angle_to_matrix(rot_update)
    rigid_new_pos = geometry.pmm(pos - center, rot_mat.T) + tr_update + center

    if not with_torsion or bond_index.shape[0] == 0:
        # static early-exit: no torsion bonds -> no Kabsch (whose SVD grad is
        # NaN for the degenerate identical-point-set case)
        return rigid_new_pos

    flexible_new_pos = apply_torsion_updates(
        rigid_new_pos, bond_index, rotate_mask, torsion_updates, bond_mask
    )
    r, t = geometry.kabsch(flexible_new_pos, rigid_new_pos, weights=w)
    aligned = geometry.pmm(flexible_new_pos, r.T) + t

    any_torsion = jnp.any(bond_mask)
    return jnp.where(any_torsion, aligned, rigid_new_pos)


def apply_sidechain_torsion_updates(
    atom_pos: Array,  # [NA, 3] receptor atom positions
    sc_bond_index: Array,  # [S, 2] int32 bond (u, v) atom indices
    sc_rotate_mask: Array,  # [S, NA] bool — atoms rotated by bond i
    torsion_updates: Array,  # [S]
    sc_bond_mask: Array,  # [S] bool
) -> Array:
    """Sequential side-chain chi-angle rotations (reference:
    utils/torsion.py:251-278 ``modify_sidechain_torsion_angle`` looped by
    utils/diffusion_utils.py:63-70 ``modify_sidechains``).  Identical scan
    machinery as the ligand torsions, over receptor atoms."""
    return apply_torsion_updates(
        atom_pos, sc_bond_index, sc_rotate_mask, torsion_updates, sc_bond_mask
    )


# ---------------------------------------------------------------------------
# diffusion coefficient g(t) for the reverse SDE (reference sampling.py:129-137)
# ---------------------------------------------------------------------------

def diffusion_g(sigma, sigma_min, sigma_max):
    """g(t) for the VE-SDE with exponential sigma schedule."""
    return sigma * jnp.sqrt(2 * jnp.log(sigma_max / sigma_min))
