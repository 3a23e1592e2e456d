"""On-chip correctness check for the fused Pallas conv kernels.

The general-CG kernels (ops/pallas_tp_fc.py) went live inside the
pseudotorque heads (models/all_atom_score_model.py::_pseudotorque_head,
TPConv faster=False) at round-3 end, but their parity tests run in
interpret mode only — interpret mode cannot catch chip-specific
layout/padding bugs.  This script compares, ON THE REAL BACKEND, the
kernel's output against (a) the same kernel in interpret mode and (b) the
pure-XLA FullyConnectedTensorProduct fallback (models/layers.py TPConv
non-fused branch), at the exact irreps/shape signatures the ns=60 flagship
uses for its tor/sc bond convs, plus the lmax=1 fast-path kernel
(ops/pallas_tp.py) as a control.

Writes results/fc_chip_verify.json and exits nonzero on mismatch.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime

runtime.setup()

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_pocket_tpu.ops.irreps import Irreps
from diffdock_pocket_tpu.ops.pallas_tp import fused_tp_messages
from diffdock_pocket_tpu.ops.pallas_tp_fc import fused_fc_tp_messages
from diffdock_pocket_tpu.ops.tensor_product import (
    FasterTensorProduct,
    FullyConnectedTensorProduct,
)

# flagship (ns=60) pseudotorque-head signature (see
# all_atom_score_model.py:806-812 and scripts output in round-4 notes)
IN_IR = "60x0e + 10x1o + 10x2e + 10x1e + 10x2o + 60x0o"
SH_IR = "1x1o + 1x2e + 1x2o + 1x3o"
OUT_IR = "60x0o + 60x0e"
H_DIM = 3 * 60  # n_edge_features

# trunk fast-path signature (control; chip-proven since round 2).  The
# FasterTensorProduct supports 0e/1o/1e/0o multiplicities only.
TRUNK_IN = "60x0e + 10x1o + 10x1e + 60x0o"
TRUNK_SH = "1x0e + 1x1o"
TRUNK_OUT = "60x0e + 10x1o + 10x1e + 60x0o"


def xla_reference(h, x, sh, ew, w2, b2, in_ir, sh_ir, out_ir):
    tp = FullyConnectedTensorProduct(in_ir, sh_ir, out_ir)
    w = (h @ w2 + b2) * ew[..., None]
    return tp(x, sh, w)


def run_case(name, E, in_ir, sh_ir, out_ir, fast_path=False, seed=0):
    k = jax.random.PRNGKey(seed)
    kh, kx, ks, ke, kw, kb = jax.random.split(k, 6)
    din = Irreps.parse(in_ir).dim
    dsh = Irreps.parse(sh_ir).dim
    if fast_path:
        tp = FasterTensorProduct(in_ir, sh_ir, out_ir)
        numel = tp.weight_numel
    else:
        tp = FullyConnectedTensorProduct(in_ir, sh_ir, out_ir)
        numel = tp.weight_numel
    h = jax.random.normal(kh, (E, H_DIM), jnp.float32)
    x = jax.random.normal(kx, (E, din), jnp.float32)
    sh = jax.random.normal(ks, (E, dsh), jnp.float32)
    ew = jax.random.uniform(ke, (E,), jnp.float32)
    w2 = jax.random.normal(kw, (H_DIM, numel), jnp.float32) * 0.05
    b2 = jax.random.normal(kb, (numel,), jnp.float32) * 0.05

    if fast_path:
        on_chip = np.asarray(fused_tp_messages(h, x, sh, ew, w2, b2,
                                               in_ir, out_ir, False))
        interp = np.asarray(fused_tp_messages(h, x, sh, ew, w2, b2,
                                              in_ir, out_ir, True))
        w = (h @ w2 + b2) * ew[..., None]
        ref = np.asarray(tp(x, sh, w))
    else:
        on_chip = np.asarray(fused_fc_tp_messages(h, x, sh, ew, w2, b2,
                                                  in_ir, sh_ir, out_ir, False))
        interp = np.asarray(fused_fc_tp_messages(h, x, sh, ew, w2, b2,
                                                 in_ir, sh_ir, out_ir, True))
        ref = np.asarray(xla_reference(h, x, sh, ew, w2, b2,
                                       in_ir, sh_ir, out_ir))

    def stats(a, b):
        denom = np.maximum(np.abs(b), 1e-3)
        rel = np.abs(a - b) / denom
        return {
            "max_abs_err": float(np.max(np.abs(a - b))),
            "max_rel_err": float(np.max(rel)),
            "frac_rel_gt_5pct": float(np.mean(rel > 0.05)),
            "ref_rms": float(np.sqrt(np.mean(b * b))),
            "out_rms": float(np.sqrt(np.mean(a * a))),
        }

    row = {
        "case": name, "E": E,
        "chip_vs_interp": stats(on_chip, interp),
        "chip_vs_xla": stats(on_chip, ref),
        "interp_vs_xla": stats(interp, ref),
    }
    # gradient A/B (the heads backprop into the trunk through x_dst — a
    # broken backward kernel would poison the whole model's training)
    ct = jax.random.normal(jax.random.PRNGKey(seed + 1), ref.shape,
                           jnp.float32)

    if fast_path:
        def loss_kernel(h_, x_, w2_, b2_):
            return jnp.sum(fused_tp_messages(
                h_, x_, sh, ew, w2_, b2_, in_ir, out_ir, False) * ct)
    else:
        def loss_kernel(h_, x_, w2_, b2_):
            return jnp.sum(fused_fc_tp_messages(
                h_, x_, sh, ew, w2_, b2_, in_ir, sh_ir, out_ir, False) * ct)

    def loss_ref(h_, x_, w2_, b2_):
        w = (h_ @ w2_ + b2_) * ew[..., None]
        return jnp.sum(tp(x_, sh, w) * ct)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(h, x, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, x, w2, b2)
    grad_stats = {}
    for nm, a, b in zip(("dh", "dx", "dw2", "db2"), gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.sqrt(np.mean(b * b))), 1e-6)
        grad_stats[nm] = {
            "rms_err_over_ref_rms": float(
                np.sqrt(np.mean((a - b) ** 2)) / scale),
            "ref_rms": scale,
        }
    row["grads_chip_vs_xla"] = grad_stats

    # bf16 h inside the kernel => tolerate ~1% relative; flag beyond that
    row["ok"] = (row["chip_vs_xla"]["frac_rel_gt_5pct"] < 0.01 and
                 all(v["rms_err_over_ref_rms"] < 0.05
                     for v in grad_stats.values()))
    return row


def main():
    dev = jax.devices()[0]
    rows = []
    # tor-head-like and sc-head-like edge counts (B*T*K with B=8, K=32):
    # T=24 -> 6144, SC=160 -> 40960; plus a deliberately non-tile-multiple E
    for name, E in (("fc_tor_like", 8 * 24 * 32),
                    ("fc_sc_like", 8 * 160 * 32),
                    ("fc_ragged", 8 * 24 * 32 + 96)):
        rows.append(run_case(name, E, IN_IR, SH_IR, OUT_IR))
    rows.append(run_case("fast_trunk_control", 8192, TRUNK_IN, TRUNK_SH,
                         TRUNK_OUT, fast_path=True))
    out = {"device": str(dev), "platform": dev.platform, "cases": rows,
           "all_ok": all(r["ok"] for r in rows)}
    os.makedirs("results", exist_ok=True)
    with open("results/fc_chip_verify.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    sys.exit(0 if out["all_ok"] else 1)


if __name__ == "__main__":
    main()
