"""Parity tests for the fused FullyConnectedTensorProduct Pallas kernel
(interpret mode on CPU) — the second-order (lmax=2) conv path.

The kernel must reproduce FCTP(x, sh, (h@W2+b2)*ew) exactly (up to its bf16
weight matmul) for every second-order ladder layer, and its custom VJP must
match the unfused XLA gradients for h, x, W2, b2 (d(sh)/d(ew) are zeros by
contract, as in the lmax=1 kernel).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_pocket_tpu.ops import spherical
from diffdock_pocket_tpu.ops.irreps import Irreps, feature_ladder, sh_irreps
from diffdock_pocket_tpu.ops.pallas_tp_fc import (
    fused_fc_tp_messages,
    fused_fc_tp_messages_multi,
)
from diffdock_pocket_tpu.ops.tensor_product import FullyConnectedTensorProduct


def _inputs(in_ir, sh_lmax, numel, E, H, seed):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((E, H)).astype(np.float32)
    x = rng.standard_normal((E, Irreps.parse(in_ir).dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(sh_lmax, jnp.asarray(vec)))
    ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
    w2 = (rng.standard_normal((H, numel)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(numel) * 0.1).astype(np.float32)
    return h, x, sh, ew, w2, b2


def _case(in_ir, out_ir, sh_lmax=2, E=37, H=24, seed=0):
    shirr = str(sh_irreps(sh_lmax))
    tp = FullyConnectedTensorProduct(in_ir, shirr, out_ir)
    h, x, sh, ew, w2, b2 = _inputs(in_ir, sh_lmax, tp.weight_numel, E, H, seed)
    ref = np.asarray(
        tp(jnp.asarray(x), jnp.asarray(sh), jnp.asarray((h @ w2 + b2) * ew[:, None]))
    )
    got = np.asarray(
        fused_fc_tp_messages(
            jnp.asarray(h), jnp.asarray(x), jnp.asarray(sh), jnp.asarray(ew),
            jnp.asarray(w2), jnp.asarray(b2), in_ir, shirr, out_ir,
            interpret=True,
        )
    )
    return ref, got


@pytest.mark.parametrize("layer", [0, 1, 2, 3])
def test_fused_fc_matches_second_order_ladder(layer):
    ladder = feature_ladder(8, 3, True)
    ref, got = _case(str(ladder[layer]), str(ladder[min(layer + 1, 3)]), seed=layer)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)  # bf16 matmul


def test_fused_fc_matches_lmax1_fctp():
    """sh_lmax=1 through the generic CG kernel (the faster=False, lmax=1
    combination, e.g. --sh_lmax 1 with --use_second_order_repr off but
    no_fast_tp semantics)."""
    ladder = feature_ladder(8, 3, False)
    ref, got = _case(str(ladder[2]), str(ladder[3]), sh_lmax=1, seed=5)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_fused_fc_handles_edge_padding():
    ladder = feature_ladder(6, 2, True)
    ref, got = _case(str(ladder[3]), str(ladder[3]), E=130, seed=3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_fused_fc_grads_match_unfused():
    """Custom-VJP cotangents for (h, x, w2, b2) equal the unfused XLA
    gradients; d(sh)/d(ew) are zeros by contract."""
    ladder = feature_ladder(6, 2, True)
    in_ir, out_ir = str(ladder[1]), str(ladder[2])
    shirr = str(sh_irreps(2))
    tp = FullyConnectedTensorProduct(in_ir, shirr, out_ir)
    h, x, sh, ew, w2, b2 = _inputs(in_ir, 2, tp.weight_numel, E=29, H=16, seed=7)
    args = tuple(jnp.asarray(a) for a in (h, x, sh, ew, w2, b2))

    def fused_loss(h_, x_, w2_, b2_):
        out = fused_fc_tp_messages(
            h_, x_, args[2], args[3], w2_, b2_, in_ir, shirr, out_ir, True)
        return jnp.sum(out * out)

    def unfused_loss(h_, x_, w2_, b2_):
        w = (h_ @ w2_ + b2_) * args[3][:, None]
        out = tp(x_, args[2], w)
        return jnp.sum(out * out)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(args[0], args[1], args[4], args[5])
    gu = jax.grad(unfused_loss, argnums=(0, 1, 2, 3))(args[0], args[1], args[4], args[5])
    for a, b in zip(gf, gu):
        # backward is an exact fp32 recompute, but the primal out entering
        # d(sum out^2) differs by the fused forward's bf16 matmul
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)

    # zero-gradient contract for sh / edge_weight
    def fused_sh_loss(sh_, ew_):
        out = fused_fc_tp_messages(args[0], args[1], sh_, ew_, args[4], args[5],
                                   in_ir, shirr, out_ir, True)
        return jnp.sum(out)

    gsh, gew = jax.grad(fused_sh_loss, argnums=(0, 1))(args[2], args[3])
    assert float(jnp.abs(gsh).max()) == 0.0
    assert float(jnp.abs(gew).max()) == 0.0


def test_fused_fc_multi_matches_per_family():
    """fused_fc_tp_messages_multi == per-family fused_fc_tp_messages."""
    ladder = feature_ladder(8, 3, True)
    in_ir, out_ir = str(ladder[2]), str(ladder[3])
    shirr = str(sh_irreps(2))
    tp = FullyConnectedTensorProduct(in_ir, shirr, out_ir)
    rng = np.random.default_rng(11)
    H = 24
    din = Irreps.parse(in_ir).dim
    parts, refs = [], []
    for f, E in enumerate([5, 200, 37]):
        h = rng.standard_normal((E, H)).astype(np.float32)
        x = rng.standard_normal((E, din)).astype(np.float32)
        vec = rng.standard_normal((E, 3)).astype(np.float32)
        sh = np.asarray(spherical.sh_ladder(2, jnp.asarray(vec)))
        ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
        w2 = (rng.standard_normal((H, tp.weight_numel)) * 0.1).astype(np.float32)
        b2 = (rng.standard_normal(tp.weight_numel) * 0.1).astype(np.float32)
        parts.append(tuple(jnp.asarray(a) for a in (h, x, sh, ew, w2, b2)))
        refs.append(np.asarray(fused_fc_tp_messages(
            *parts[-1], in_ir, shirr, out_ir, True)))
    outs = fused_fc_tp_messages_multi(tuple(parts), in_ir, shirr, out_ir, True)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_fused_fc_multi_grads():
    """Multi-family VJP returns per-family cotangents matching per-family
    fused calls."""
    ladder = feature_ladder(4, 2, True)
    in_ir, out_ir = str(ladder[1]), str(ladder[2])
    shirr = str(sh_irreps(2))
    tp = FullyConnectedTensorProduct(in_ir, shirr, out_ir)
    rng = np.random.default_rng(13)
    H = 12
    din = Irreps.parse(in_ir).dim
    parts = []
    for E in (9, 40):
        h = rng.standard_normal((E, H)).astype(np.float32)
        x = rng.standard_normal((E, din)).astype(np.float32)
        vec = rng.standard_normal((E, 3)).astype(np.float32)
        sh = np.asarray(spherical.sh_ladder(2, jnp.asarray(vec)))
        ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
        w2 = (rng.standard_normal((H, tp.weight_numel)) * 0.1).astype(np.float32)
        b2 = (rng.standard_normal(tp.weight_numel) * 0.1).astype(np.float32)
        parts.append(tuple(jnp.asarray(a) for a in (h, x, sh, ew, w2, b2)))

    def multi_loss(parts_):
        outs = fused_fc_tp_messages_multi(parts_, in_ir, shirr, out_ir, True)
        return sum(jnp.sum(o * o) for o in outs)

    def single_loss(parts_):
        outs = [fused_fc_tp_messages(*p, in_ir, shirr, out_ir, True)
                for p in parts_]
        return sum(jnp.sum(o * o) for o in outs)

    gm = jax.grad(multi_loss)(tuple(parts))
    gs = jax.grad(single_loss)(tuple(parts))
    for pm, ps in zip(gm, gs):
        for a, b in zip(pm, ps):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_fc_flop_trace_registry():
    """The fused FCTP kernel records analytic FLOPs in the shared registry
    (bench MFU accounting covers the lmax=2 path too)."""
    from diffdock_pocket_tpu.ops import pallas_tp as base

    ladder = feature_ladder(4, 2, True)
    in_ir, out_ir = str(ladder[1]), str(ladder[2])
    shirr = str(sh_irreps(2))
    tp = FullyConnectedTensorProduct(in_ir, shirr, out_ir)
    h, x, sh, ew, w2, b2 = _inputs(in_ir, 2, tp.weight_numel, E=10, H=8, seed=1)
    base.start_flop_trace()
    jax.eval_shape(
        lambda *a: fused_fc_tp_messages(*a, in_ir, shirr, out_ir, True),
        *(jnp.asarray(v) for v in (h, x, sh, ew, w2, b2)),
    )
    total = base.stop_flop_trace()
    assert total > 0
