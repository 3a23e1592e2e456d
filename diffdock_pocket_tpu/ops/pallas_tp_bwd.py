"""Backward Pallas kernels for the fused TP conv (custom VJP).

Forward (pallas_tp.py): msgs = FasterTP(x, sh, (h @ W2 + b2) * ew).
The backward is split into TWO kernels so each fits VMEM at big-model sizes
(rows_pad ~ 11.5k, H = 180 -> W2t 4.1 MB bf16, dW2 8.3 MB f32 cannot be
resident together with the per-type temporaries):

- ``_dhdx_kernel``: recomputes per-type weights (W2a^T h_aug, MXU; bias
  folded as in the forward — see pallas_tp.py), forms dz_t = w_t . g_t
  (VPU sublane reductions) and maps it through the candidate adjoints to
  dx; dh = W2-contraction of dw (per-type MXU dots folded immediately,
  never materializing the full dw).
- ``_dw_kernel``: forms dw_t = z_t (x) g_t (VPU) and accumulates
  dW2a += dw @ h_aug^T across the sequential TPU grid; h_aug's ones row
  makes the last dW2a column db2 for free, and the kernel needs neither
  W2 nor a separate bias buffer in VMEM.

Layout identical to the forward kernel: edges on lanes, TILE-edge tiles,
per-type fout sublane-padded.  sh/edge-weight cotangents are zeros (no
gradient flows to coordinates in training).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tensor_product import FasterTensorProduct

from .pallas_tp import TILE  # shared edge-tile size
_DEF = jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# shared static helpers
# ---------------------------------------------------------------------------

def _split_inputs(tp, x, sh_ref):
    im = tp.in_muls
    n0e, n1o, n1e, n0o = im["0e"], im["1o"], im["1e"], im["0o"]
    off = 0
    x0e = x[off : off + n0e]; off += n0e
    x1o = [x[off + 3 * u : off + 3 * u + 3] for u in range(n1o)]; off += 3 * n1o
    x1e = [x[off + 3 * u : off + 3 * u + 3] for u in range(n1e)]; off += 3 * n1e
    x0o = x[off : off + n0o]
    s = sh_ref[0:1, :]
    v = (sh_ref[1:2, :], sh_ref[2:3, :], sh_ref[3:4, :])
    return (n0e, n1o, n1e, n0o), (x0e, x1o, x1e, x0o), s, v


def _fanin_plans(counts):
    """Candidate descriptor lists per output type, in forward fan-in order."""
    n0e, n1o, n1e, n0o = counts
    return {
        "0e": [("0e", u) for u in range(n0e)] + [("dot1o", u) for u in range(n1o)],
        "1o": [("t0e", u) for u in range(n0e)]
        + [("s1o", u) for u in range(n1o)]
        + [("x1e", u) for u in range(n1e)],
        "1e": [("x1o", u) for u in range(n1o)]
        + [("s1e", u) for u in range(n1e)]
        + [("t0o", u) for u in range(n0o)],
        "0o": [("dot1e", u) for u in range(n1e)] + [("0o", u) for u in range(n0o)],
    }


_INV3 = 1.0 / math.sqrt(3.0)
_INV2 = 1.0 / math.sqrt(2.0)


def _dotv(u, v):
    return u[0:1] * v[0] + u[1:2] * v[1] + u[2:3] * v[2]


def _crossv(u, v):
    return (
        u[1:2] * v[2] - u[2:3] * v[1],
        u[2:3] * v[0] - u[0:1] * v[2],
        u[0:1] * v[1] - u[1:2] * v[0],
    )


def _scalar_candidate(kind, idx, xs, s, v):
    x0e, x1o, x1e, x0o = xs
    if kind == "0e":
        return x0e[idx : idx + 1] * s
    if kind == "0o":
        return x0o[idx : idx + 1] * s
    if kind == "dot1o":
        return _dotv(x1o[idx], v) * _INV3
    return _dotv(x1e[idx], v) * _INV3  # dot1e


def _vector_candidate(kind, idx, xs, s, v):
    x0e, x1o, x1e, x0o = xs
    if kind == "t0e":
        return (x0e[idx : idx + 1] * v[0], x0e[idx : idx + 1] * v[1], x0e[idx : idx + 1] * v[2])
    if kind == "t0o":
        return (x0o[idx : idx + 1] * v[0], x0o[idx : idx + 1] * v[1], x0o[idx : idx + 1] * v[2])
    if kind == "s1o":
        u = x1o[idx]
        return (u[0:1] * s, u[1:2] * s, u[2:3] * s)
    if kind == "s1e":
        u = x1e[idx]
        return (u[0:1] * s, u[1:2] * s, u[2:3] * s)
    if kind == "x1o":
        return tuple(c * _INV2 for c in _crossv(x1o[idx], v))
    return tuple(c * _INV2 for c in _crossv(x1e[idx], v))  # x1e


def _gather_g_scalar(g_ref, gout_off, fout, fout_pad, T):
    g_t = g_ref[gout_off : gout_off + fout, :]
    if fout_pad > fout:
        g_t = jnp.concatenate(
            [g_t, jnp.zeros((fout_pad - fout, T), jnp.float32)], axis=0
        )
    return g_t


def _gather_g_vector(g_ref, gout_off, fout, fout_pad, T):
    """De-interleave cotangent rows (m*3 + c) into per-component blocks."""
    g_c = []
    for c in range(3):
        rows = [
            g_ref[gout_off + m * 3 + c : gout_off + m * 3 + c + 1, :]
            for m in range(fout)
        ]
        if fout_pad > fout:
            rows.append(jnp.zeros((fout_pad - fout, T), jnp.float32))
        g_c.append(jnp.concatenate(rows, axis=0))
    return g_c


# ---------------------------------------------------------------------------
# kernel 1: dh + dx
# ---------------------------------------------------------------------------

def _dhdx_kernel(tp, plan, h_ref, x_ref, sh_ref, ew_ref, w2a_ref,
                 g_ref, dh_ref, dx_ref):
    """h [H+1, T] with a ones last row; w2a [rows_pad, H+1] with the bias as
    its last column (see pallas_tp.py — a separate [rows_pad, 1] bias operand
    lane-pads to ~6 MB and OOMs VMEM at big-model sizes).  dh is [H+1, T];
    its last row is a bias artifact the caller drops."""
    T = h_ref.shape[1]
    h = h_ref[:]
    ew = ew_ref[:]
    counts, xs, s, v = _split_inputs(tp, x_ref[:], sh_ref)
    n0e, n1o, n1e, n0o = counts
    fan = _fanin_plans(counts)

    dx0e = [jnp.zeros((1, T), jnp.float32) for _ in range(n0e)]
    dx1o = [[jnp.zeros((1, T), jnp.float32) for _ in range(3)] for _ in range(n1o)]
    dx1e = [[jnp.zeros((1, T), jnp.float32) for _ in range(3)] for _ in range(n1e)]
    dx0o = [jnp.zeros((1, T), jnp.float32) for _ in range(n0o)]
    dh_acc = [jnp.zeros((h.shape[0], T), jnp.float32)]
    gout_off = [0]

    def add_dx_scalar(kind, idx, dz):
        if kind == "0e":
            dx0e[idx] += dz * s
        elif kind == "0o":
            dx0o[idx] += dz * s
        elif kind == "dot1o":
            t_ = dx1o[idx]
            for c in range(3):
                t_[c] += dz * v[c] * _INV3
        else:
            t_ = dx1e[idx]
            for c in range(3):
                t_[c] += dz * v[c] * _INV3

    def add_dx_vector(kind, idx, dz):
        if kind == "t0e":
            dx0e[idx] += dz[0] * v[0] + dz[1] * v[1] + dz[2] * v[2]
        elif kind == "t0o":
            dx0o[idx] += dz[0] * v[0] + dz[1] * v[1] + dz[2] * v[2]
        elif kind == "s1o":
            t_ = dx1o[idx]
            for c in range(3):
                t_[c] += dz[c] * s
        elif kind == "s1e":
            t_ = dx1e[idx]
            for c in range(3):
                t_[c] += dz[c] * s
        elif kind == "x1o":
            # adjoint of u -> cross(u, v): du = cross(v, dz)
            t_ = dx1o[idx]
            t_[0] += (v[1] * dz[2] - v[2] * dz[1]) * _INV2
            t_[1] += (v[2] * dz[0] - v[0] * dz[2]) * _INV2
            t_[2] += (v[0] * dz[1] - v[1] * dz[0]) * _INV2
        else:  # x1e
            t_ = dx1e[idx]
            t_[0] += (v[1] * dz[2] - v[2] * dz[1]) * _INV2
            t_[1] += (v[2] * dz[0] - v[0] * dz[2]) * _INV2
            t_[2] += (v[0] * dz[1] - v[1] * dz[0]) * _INV2

    def run_type(key, is_vector):
        fin, fout, fout_pad, roff = plan[key]
        if not fout:
            return
        n = fin * fout_pad
        alpha = ew * (1.0 / math.sqrt(max(fin, 1)))
        wt = jnp.dot(w2a_ref[roff : roff + n, :], h,
                     preferred_element_type=jnp.float32, precision=_DEF)
        wt = wt * alpha  # bias folded into the matmul via the ones row
        if is_vector:
            g_c = _gather_g_vector(g_ref, gout_off[0], fout, fout_pad, T)
            gout_off[0] += fout * 3
        else:
            g_t = _gather_g_scalar(g_ref, gout_off[0], fout, fout_pad, T)
            gout_off[0] += fout
        dws = []
        for ci, (kind, idx) in enumerate(fan[key]):
            wt_blk = wt[ci * fout_pad : (ci + 1) * fout_pad, :]
            if is_vector:
                zc = _vector_candidate(kind, idx, xs, s, v)
                dws.append(zc[0] * g_c[0] + zc[1] * g_c[1] + zc[2] * g_c[2])
                dz = [jnp.sum(wt_blk * g_c[c], axis=0, keepdims=True) for c in range(3)]
                add_dx_vector(kind, idx, dz)
            else:
                z = _scalar_candidate(kind, idx, xs, s, v)
                dws.append(z * g_t)
                dz = jnp.sum(wt_blk * g_t, axis=0, keepdims=True)
                add_dx_scalar(kind, idx, dz)
        dw_t = jnp.concatenate(dws, axis=0) * alpha
        dh_acc[0] += jax.lax.dot_general(
            w2a_ref[roff : roff + n, :].astype(jnp.float32), dw_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )

    run_type("0e", False)
    run_type("1o", True)
    run_type("1e", True)
    run_type("0o", False)

    dh_ref[:] = dh_acc[0]
    rows = list(dx0e)
    for u in range(n1o):
        rows += dx1o[u]
    for u in range(n1e):
        rows += dx1e[u]
    rows += dx0o
    dx_ref[:] = jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# kernel 2: dW2 + db2 (grid-accumulated)
# ---------------------------------------------------------------------------

def _dw_kernel(tp, plan, h_ref, x_ref, sh_ref, ew_ref, g_ref, dw2_ref):
    """dw2 is the augmented [rows_pad, H+1] gradient: contracting dw against
    h's ones row makes the last column db2 for free (no separate lane-padded
    [rows_pad, 1] output buffer)."""
    T = h_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    h = h_ref[:]
    ew = ew_ref[:]
    counts, xs, s, v = _split_inputs(tp, x_ref[:], sh_ref)
    fan = _fanin_plans(counts)
    gout_off = [0]

    def run_type(key, is_vector):
        fin, fout, fout_pad, roff = plan[key]
        if not fout:
            return
        n = fin * fout_pad
        alpha = ew * (1.0 / math.sqrt(max(fin, 1)))
        if is_vector:
            g_c = _gather_g_vector(g_ref, gout_off[0], fout, fout_pad, T)
            gout_off[0] += fout * 3
        else:
            g_t = _gather_g_scalar(g_ref, gout_off[0], fout, fout_pad, T)
            gout_off[0] += fout
        dws = []
        for kind, idx in fan[key]:
            if is_vector:
                zc = _vector_candidate(kind, idx, xs, s, v)
                dws.append(zc[0] * g_c[0] + zc[1] * g_c[1] + zc[2] * g_c[2])
            else:
                dws.append(_scalar_candidate(kind, idx, xs, s, v) * g_t)
        dw_t = jnp.concatenate(dws, axis=0) * alpha
        dw2_ref[roff : roff + n, :] += jax.lax.dot_general(
            dw_t, h.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )  # h's ones row makes column H the bias gradient

    run_type("0e", False)
    run_type("1o", True)
    run_type("1e", True)
    run_type("0o", False)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def run_bwd(tp, plan, rows_pad, ht, xt, sht, ewt, w2a, gt, interpret=False):
    """ht [H+1, E] bf16 (ones last row), xt [din, E], sht [4, E], ewt [1, E],
    w2a [rows_pad, H+1] bf16 (bias last column), gt [dout, E] f32.  Returns
    (dh [H+1, E] — caller drops the last row, dx [din, E],
    dw2a [rows_pad, H+1] — last column is db2)."""
    Ha, E = ht.shape  # Ha = H + 1
    din = xt.shape[0]
    dout = gt.shape[0]
    grid = (E // TILE,)

    def edge_spec(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    def fixed_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    dh, dx = pl.pallas_call(
        functools.partial(_dhdx_kernel, tp, plan),
        grid=grid,
        in_specs=[
            edge_spec(Ha), edge_spec(din), edge_spec(4), edge_spec(1),
            fixed_spec((rows_pad, Ha)), edge_spec(dout),
        ],
        out_specs=[edge_spec(Ha), edge_spec(din)],
        out_shape=[
            jax.ShapeDtypeStruct((Ha, E), jnp.float32),
            jax.ShapeDtypeStruct((din, E), jnp.float32),
        ],
        interpret=interpret,
    )(ht, xt, sht, ewt, w2a, gt)

    dw2a = pl.pallas_call(
        functools.partial(_dw_kernel, tp, plan),
        grid=grid,
        in_specs=[edge_spec(Ha), edge_spec(din), edge_spec(4), edge_spec(1), edge_spec(dout)],
        out_specs=fixed_spec((rows_pad, Ha)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, Ha), jnp.float32),
        interpret=interpret,
    )(ht, xt, sht, ewt, gt)
    return dh, dx, dw2a
