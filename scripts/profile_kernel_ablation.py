"""Ablate the fused TP kernel at big-model dims: full kernel vs
matmul-only (type_weights, MXU) vs TP-apply-only (candidates+FMAs, VPU).

Decides where per-tile time goes (run on the real TPU).
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime

runtime.setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdock_pocket_tpu.ops.irreps import Irreps, feature_ladder
from diffdock_pocket_tpu.ops.pallas_tp import (
    TILE, _aug_h, _aug_w2, _ceil_to, _kernel_body, _plan,
)
from diffdock_pocket_tpu.ops.tensor_product import FasterTensorProduct

ns, nv, H, E = 60, 10, 180, 98304  # late layer, lr-family edge count

ladder = feature_ladder(ns, nv, False)
IN = OUT = str(ladder[3])
tp = FasterTensorProduct(IN, "1x0e+1x1o", OUT)
plan, rows_pad = _plan(tp)
din = Irreps.parse(IN).dim
dout = Irreps.parse(OUT).dim
print(f"rows_pad={rows_pad} din={din} dout={dout} tiles={E // TILE}")

rng = np.random.default_rng(0)
h = jnp.asarray(rng.standard_normal((E, H)), jnp.float32)
x = jnp.asarray(rng.standard_normal((E, din)), jnp.float32)
sh = jnp.asarray(rng.standard_normal((E, 4)), jnp.float32)
ew = jnp.ones((E,), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((H, tp.weight_numel)) * 0.1, jnp.float32)
b2 = jnp.zeros((tp.weight_numel,), jnp.float32)

w2a = _aug_w2(w2, b2, tp)  # [rows_pad, H+1] bf16, bias folded
ht = _aug_h(h.astype(jnp.bfloat16).T)  # [H+1, E]
xt = x.T
sht = sh.T
ewt = ew[None, :]


def matmul_only_kernel(h_ref, x_ref, sh_ref, ew_ref, w2t_ref, out_ref):
    h_ = h_ref[:]
    acc = jnp.zeros((dout, h_.shape[1]), jnp.float32)
    for key in tp._KEYS:
        fin, fout, fout_pad, roff = plan[key]
        n = fin * fout_pad
        if not n:
            continue
        wt = jnp.dot(w2t_ref[roff : roff + n, :], h_,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT)
        # cheap reduction so the matmul isn't DCE'd; [n,T] -> [1,T]
        acc += jnp.broadcast_to(jnp.sum(wt, axis=0, keepdims=True), acc.shape)
    out_ref[:] = acc


def tp_only_kernel(h_ref, x_ref, sh_ref, ew_ref, w2t_ref, out_ref):
    # identical body to _kernel_body but type_weights returns a slice of the
    # (preloaded) W2t rows broadcast over T — no MXU dot
    im = tp.in_muls
    n0e, n1o, n1e, n0o = im["0e"], im["1o"], im["1e"], im["0o"]
    h_ = h_ref[:]
    ew_ = ew_ref[:]
    x_ = x_ref[:]
    s = sh_ref[0:1, :]
    vx, vy, vz = sh_ref[1:2, :], sh_ref[2:3, :], sh_ref[3:4, :]
    off = 0
    x0e = x_[off : off + n0e]; off += n0e
    x1o = [x_[off + 3 * u : off + 3 * u + 3] for u in range(n1o)]; off += 3 * n1o
    x1e = [x_[off + 3 * u : off + 3 * u + 3] for u in range(n1e)]; off += 3 * n1e
    x0o = x_[off : off + n0o]
    inv3 = 1.0 / math.sqrt(3.0)
    inv2 = 1.0 / math.sqrt(2.0)

    def dotv(u):
        return u[0:1] * vx + u[1:2] * vy + u[2:3] * vz

    def crossv(u):
        return (u[1:2] * vz - u[2:3] * vy, u[2:3] * vx - u[0:1] * vz,
                u[0:1] * vy - u[1:2] * vx)

    def type_weights(key):
        fin, fout, fout_pad, roff = plan[key]
        n = fin * fout_pad
        # no matmul: broadcast one bf16 W2 column over T (keeps slice sizes)
        return (w2t_ref[roff : roff + n, 0:1].astype(jnp.float32)
                * ew_) * (1.0 / math.sqrt(max(fin, 1)))

    out_rows = []
    fin, fout, fout_pad, _ = plan["0e"]
    if fout:
        wt = type_weights("0e")
        acc = jnp.zeros((fout_pad, h_.shape[1]), jnp.float32)
        ci = 0
        for u in range(n0e):
            acc += (x0e[u : u + 1] * s) * wt[ci * fout_pad : (ci + 1) * fout_pad]
            ci += 1
        for u in x1o:
            acc += (dotv(u) * inv3) * wt[ci * fout_pad : (ci + 1) * fout_pad]
            ci += 1
        out_rows.append(acc[:fout])

    def vector_type(key, chans):
        fin, fout, fout_pad, _ = plan[key]
        if not fout:
            return
        wt = type_weights(key)
        accs = [jnp.zeros((fout_pad, h_.shape[1]), jnp.float32) for _ in range(3)]
        for ci, comps in enumerate(chans):
            ws = wt[ci * fout_pad : (ci + 1) * fout_pad]
            for c in range(3):
                accs[c] += comps[c] * ws
        rows = []
        for m in range(fout):
            rows += [accs[0][m : m + 1], accs[1][m : m + 1], accs[2][m : m + 1]]
        out_rows.append(jnp.concatenate(rows, axis=0))

    chans_1o = (
        [(x0e[u : u + 1] * vx, x0e[u : u + 1] * vy, x0e[u : u + 1] * vz) for u in range(n0e)]
        + [(u[0:1] * s, u[1:2] * s, u[2:3] * s) for u in x1o]
        + [tuple(c * inv2 for c in crossv(u)) for u in x1e]
    )
    vector_type("1o", chans_1o)
    chans_1e = (
        [tuple(c * inv2 for c in crossv(u)) for u in x1o]
        + [(u[0:1] * s, u[1:2] * s, u[2:3] * s) for u in x1e]
        + [(x0o[u : u + 1] * vx, x0o[u : u + 1] * vy, x0o[u : u + 1] * vz) for u in range(n0o)]
    )
    vector_type("1e", chans_1e)
    fin, fout, fout_pad, _ = plan["0o"]
    if fout:
        wt = type_weights("0o")
        acc = jnp.zeros((fout_pad, h_.shape[1]), jnp.float32)
        ci = 0
        for u in x1e:
            acc += (dotv(u) * inv3) * wt[ci * fout_pad : (ci + 1) * fout_pad]
            ci += 1
        for u in range(n0o):
            acc += (x0o[u : u + 1] * s) * wt[ci * fout_pad : (ci + 1) * fout_pad]
            ci += 1
        out_rows.append(acc[:fout])
    out_ref[:] = jnp.concatenate(out_rows, axis=0)


def run(kernel_body, name):
    call = pl.pallas_call(
        kernel_body,
        grid=(E // TILE,),
        in_specs=[
            pl.BlockSpec((H + 1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((din, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, H + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dout, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dout, E), jnp.float32),
    )
    f = jax.jit(lambda *a: call(*a))
    args = (ht, xt, sht, ewt, w2a)
    out = f(*args)
    float(out.sum())  # sync
    t0 = time.time()
    for _ in range(10):
        out = f(*args)
    float(out.sum())
    dt = (time.time() - t0) / 10
    print(f"{name:24s} {dt * 1000:7.2f} ms  ({dt / (E // TILE) * 1e6:.2f} us/tile)")
    return dt


run(functools.partial(_kernel_body, tp, plan), "full kernel")
run(matmul_only_kernel, "matmul only (MXU)")
run(tp_only_kernel, "tp-apply only (VPU)")
