"""Backward Pallas kernels for the fused FCTP conv (general CG paths).

Forward (pallas_tp_fc.py): msgs = FCTP(x, sh, (h @ W2 + b2) * ew).
Mirrors pallas_tp_bwd.py's two-kernel split (each fits VMEM at big sizes):

- ``_dhdx_kernel_fc``: recomputes per-block weights (W2a^T h_aug on the
  MXU, bias folded as an extra column against h's ones row), forms
  dz_c = sum_m wt . g_c (VPU sublane reductions) and maps it through the
  CG-candidate adjoints to dx (dcand_c -> dx[a] += cg[a,b,c] * sh[b] * dz_c,
  unrolled over the static nonzero cg entries); dh = W2-contraction of dw
  per block, folded immediately.
- ``_dw_kernel_fc``: forms dw = cand . g (VPU) and accumulates
  dW2a += dw @ h_aug^T across the sequential grid; h_aug's ones row makes
  the last dW2a column db2 for free.

Layout identical to the forward: edges on lanes, TILE-edge tiles,
per-block fout sublane-padded, g rows mul-major/component-minor.
sh/edge-weight cotangents are zeros (same contract as the lmax=1 pair:
positions must be held constant — see pallas_tp.py's GRADIENT SCOPE).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tp import TILE

_DEF = jax.lax.Precision.DEFAULT


def _gather_g_comps(g_ref, gout_off, fout, fout_pad, d_o, T):
    """De-interleave cotangent rows (m*d_o + c) into d_o [fout_pad, T]
    blocks."""
    g_c = []
    for c in range(d_o):
        rows = [
            g_ref[gout_off + m * d_o + c : gout_off + m * d_o + c + 1, :]
            for m in range(fout)
        ]
        if fout_pad > fout:
            rows.append(jnp.zeros((fout_pad - fout, T), jnp.float32))
        g_c.append(jnp.concatenate(rows, axis=0))
    return g_c


def _candidate_rows(x, sh, in_slices, sh_slices, in_dims, chan):
    """cand_c ([1, T] rows, keyed by component) for one fan-in channel,
    memoizing the (a, b) product rows shared across components."""
    ki, u, ks, nz, d_o = chan
    xoff = in_slices[ki].start + u * in_dims[ki]
    soff = sh_slices[ks].start
    prods: dict[tuple[int, int], jax.Array] = {}
    cand: dict[int, jax.Array] = {}
    for a, b, c, coeff in nz:
        p = prods.get((a, b))
        if p is None:
            p = x[xoff + a : xoff + a + 1] * sh[soff + b : soff + b + 1]
            prods[(a, b)] = p
        term = p * coeff
        cand[c] = term if c not in cand else cand[c] + term
    return cand


def _dhdx_kernel_fc(tp, plan, chans, h_ref, x_ref, sh_ref, ew_ref, w2a_ref,
                    g_ref, dh_ref, dx_ref):
    """h [H+1, T] (ones last row); w2a [rows_pad, H+1] (bias last column).
    dh is [H+1, T]; its last row is a bias artifact the caller drops."""
    T = h_ref.shape[1]
    h = h_ref[:]
    x = x_ref[:]
    sh = sh_ref[:]
    ew = ew_ref[:]
    in_slices = tp.in_irreps.slices()
    sh_slices = tp.sh_irreps.slices()
    in_dims = [ir.dim for _, ir in tp.in_irreps]

    dx_rows = [jnp.zeros((1, T), jnp.float32) for _ in range(x.shape[0])]
    dh_acc = [jnp.zeros((h.shape[0], T), jnp.float32)]
    gout_off = 0

    for ko, (mul_o, ir_o) in enumerate(tp.out_irreps):
        fin, fout, fout_pad, roff = plan[ko]
        d_o = ir_o.dim
        if fin * fout == 0:
            gout_off += mul_o * d_o  # fwd emitted zero rows for this block
            continue
        n = fin * fout_pad
        alpha = ew * (1.0 / math.sqrt(max(fin, 1)))
        wt = jnp.dot(w2a_ref[roff : roff + n, :], h,
                     preferred_element_type=jnp.float32, precision=_DEF)
        wt = wt * alpha
        g_c = _gather_g_comps(g_ref, gout_off, fout, fout_pad, d_o, T)
        gout_off += fout * d_o

        dws = []
        for ci, chan in enumerate(chans[ko]):
            ki, u, ks, nz, _ = chan
            xoff = in_slices[ki].start + u * in_dims[ki]
            soff = sh_slices[ks].start
            cand = _candidate_rows(x, sh, in_slices, sh_slices, in_dims, chan)
            dw = None
            for c, row in cand.items():
                t = row * g_c[c]
                dw = t if dw is None else dw + t
            dws.append(dw)
            wt_blk = wt[ci * fout_pad : (ci + 1) * fout_pad, :]
            dz = {
                c: jnp.sum(wt_blk * g_c[c], axis=0, keepdims=True)
                for c in cand  # only components this channel feeds
            }
            # adjoint of cand_c = sum cg[a,b,c] x_a sh_b, memoizing
            # sh_b * dz_c rows shared across a's
            shdz: dict[tuple[int, int], jax.Array] = {}
            for a, b, c, coeff in nz:
                r = shdz.get((b, c))
                if r is None:
                    r = sh[soff + b : soff + b + 1] * dz[c]
                    shdz[(b, c)] = r
                dx_rows[xoff + a] = dx_rows[xoff + a] + r * coeff
        dw_t = jnp.concatenate(dws, axis=0) * alpha
        dh_acc[0] += jax.lax.dot_general(
            w2a_ref[roff : roff + n, :].astype(jnp.float32), dw_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )

    dh_ref[:] = dh_acc[0]
    dx_ref[:] = jnp.concatenate(dx_rows, axis=0)


def _dw_kernel_fc(tp, plan, chans, h_ref, x_ref, sh_ref, ew_ref, g_ref,
                  dw2_ref):
    """dw2 is the augmented [rows_pad, H+1] gradient (last column db2)."""
    T = h_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    h = h_ref[:]
    x = x_ref[:]
    sh = sh_ref[:]
    ew = ew_ref[:]
    in_slices = tp.in_irreps.slices()
    sh_slices = tp.sh_irreps.slices()
    in_dims = [ir.dim for _, ir in tp.in_irreps]
    gout_off = 0

    for ko, (mul_o, ir_o) in enumerate(tp.out_irreps):
        fin, fout, fout_pad, roff = plan[ko]
        d_o = ir_o.dim
        if fin * fout == 0:
            gout_off += mul_o * d_o
            continue
        n = fin * fout_pad
        alpha = ew * (1.0 / math.sqrt(max(fin, 1)))
        g_c = _gather_g_comps(g_ref, gout_off, fout, fout_pad, d_o, T)
        gout_off += fout * d_o
        dws = []
        for chan in chans[ko]:
            cand = _candidate_rows(x, sh, in_slices, sh_slices, in_dims, chan)
            dw = None
            for c, row in cand.items():
                t = row * g_c[c]
                dw = t if dw is None else dw + t
            dws.append(dw)
        dw_t = jnp.concatenate(dws, axis=0) * alpha
        dw2_ref[roff : roff + n, :] += jax.lax.dot_general(
            dw_t, h.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )  # h's ones row makes column H the bias gradient


def run_bwd_fc(tp, plan, chans, rows_pad, ht, xt, sht, ewt, w2a, gt,
               interpret=False):
    """ht [H+1, E] bf16 (ones last row), xt [din, E], sht [d_sh, E],
    ewt [1, E], w2a [rows_pad, H+1] bf16 (bias last column), gt [dout, E]
    f32.  Returns (dh [H+1, E] — caller drops the last row, dx [din, E],
    dw2a [rows_pad, H+1] — last column is db2)."""
    Ha, E = ht.shape
    din = xt.shape[0]
    d_sh = sht.shape[0]
    dout = gt.shape[0]
    grid = (E // TILE,)

    def edge_spec(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    def fixed_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    dh, dx = pl.pallas_call(
        functools.partial(_dhdx_kernel_fc, tp, plan, chans),
        grid=grid,
        in_specs=[
            edge_spec(Ha), edge_spec(din), edge_spec(d_sh), edge_spec(1),
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
        functools.partial(_dw_kernel_fc, tp, plan, chans),
        grid=grid,
        in_specs=[edge_spec(Ha), edge_spec(din), edge_spec(d_sh),
                  edge_spec(1), edge_spec(dout)],
        out_specs=fixed_spec((rows_pad, Ha)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, Ha), jnp.float32),
        interpret=interpret,
    )(ht, xt, sht, ewt, gt)
    return dh, dx, dw2a
