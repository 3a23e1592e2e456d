"""Parity tests for the fused Pallas TP kernel (interpret mode on CPU).

The kernel must reproduce FasterTensorProduct(x, sh, (h@W2+b2)*ew) exactly
(up to its bf16 weight matmul) for every ladder layer and for the final-conv
irreps, including padded/masked edges.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_pocket_tpu.ops import spherical
from diffdock_pocket_tpu.ops.irreps import feature_ladder
from diffdock_pocket_tpu.ops.pallas_tp import fused_tp_messages
from diffdock_pocket_tpu.ops.tensor_product import FasterTensorProduct


def _case(in_ir, out_ir, E=37, H=24, seed=0):
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((E, H)).astype(np.float32)
    from diffdock_pocket_tpu.ops.irreps import Irreps

    x = rng.standard_normal((E, Irreps.parse(in_ir).dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
    ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
    w2 = (rng.standard_normal((H, tp.weight_numel)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(tp.weight_numel) * 0.1).astype(np.float32)
    ref = np.asarray(
        tp(jnp.asarray(x), jnp.asarray(sh), jnp.asarray((h @ w2 + b2) * ew[:, None]))
    )
    got = np.asarray(
        fused_tp_messages(
            jnp.asarray(h), jnp.asarray(x), jnp.asarray(sh), jnp.asarray(ew),
            jnp.asarray(w2), jnp.asarray(b2), in_ir, out_ir, interpret=True,
        )
    )
    return ref, got


@pytest.mark.parametrize("layer", [0, 1, 2, 3])
def test_fused_matches_ladder_layers(layer):
    ladder = feature_ladder(8, 3, False)
    ref, got = _case(str(ladder[layer]), str(ladder[min(layer + 1, 3)]), seed=layer)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)  # bf16 matmul


def test_fused_matches_final_conv_irreps():
    ladder = feature_ladder(8, 3, False)
    ref, got = _case(str(ladder[3]), "2x1o + 2x1e", seed=9)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_fused_handles_edge_padding():
    """E not a multiple of the tile: padded rows must not corrupt output."""
    ladder = feature_ladder(6, 2, False)
    ref, got = _case(str(ladder[3]), str(ladder[3]), E=130, seed=3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_multi_family_matches_per_family():
    """fused_tp_messages_multi == per-family fused_tp_messages (one launch,
    scalar-prefetch W2 selection, bias folded into the matmul)."""
    from diffdock_pocket_tpu.ops.pallas_tp import fused_tp_messages_multi
    from diffdock_pocket_tpu.ops.irreps import Irreps

    ladder = feature_ladder(8, 3, False)
    in_ir, out_ir = str(ladder[2]), str(ladder[3])
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    rng = np.random.default_rng(7)
    H = 24
    din = Irreps.parse(in_ir).dim
    parts = []
    refs = []
    for f, E in enumerate([5, 200, 37]):  # below/above/at-awkward tile sizes
        h = rng.standard_normal((E, H)).astype(np.float32)
        x = rng.standard_normal((E, din)).astype(np.float32)
        vec = rng.standard_normal((E, 3)).astype(np.float32)
        sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
        ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
        w2 = (rng.standard_normal((H, tp.weight_numel)) * 0.1).astype(np.float32)
        b2 = (rng.standard_normal(tp.weight_numel) * 0.1).astype(np.float32)
        parts.append(tuple(jnp.asarray(a) for a in (h, x, sh, ew, w2, b2)))
        refs.append(np.asarray(fused_tp_messages(
            *parts[-1], in_ir, out_ir, interpret=True)))
    outs = fused_tp_messages_multi(tuple(parts), in_ir, out_ir, True)
    for got, ref in zip(outs, refs):
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-2, rtol=2e-2)


def test_multi_family_grads_match_per_family():
    """The multi-kernel VJP must equal the per-family fused VJPs.

    b2 is zero here so the two forwards agree bitwise (the multi kernel
    folds the bias into the bf16 matmul while the per-family kernel adds it
    in f32) — with identical cotangents, any grad mismatch is a wiring bug."""
    from diffdock_pocket_tpu.ops.pallas_tp import fused_tp_messages_multi
    from diffdock_pocket_tpu.ops.irreps import Irreps

    ladder = feature_ladder(6, 2, False)
    in_ir = out_ir = str(ladder[3])
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    rng = np.random.default_rng(3)
    H, din = 16, Irreps.parse(in_ir).dim
    parts = []
    for E in (9, 140):
        h = rng.standard_normal((E, H)).astype(np.float32)
        x = rng.standard_normal((E, din)).astype(np.float32)
        vec = rng.standard_normal((E, 3)).astype(np.float32)
        sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
        ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
        w2 = (rng.standard_normal((H, tp.weight_numel)) * 0.1).astype(np.float32)
        b2 = np.zeros(tp.weight_numel, np.float32)
        parts.append(tuple(jnp.asarray(a) for a in (h, x, sh, ew, w2, b2)))
    parts = tuple(parts)

    def loss_multi(ps):
        outs = fused_tp_messages_multi(ps, in_ir, out_ir, True)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_single(ps):
        outs = [fused_tp_messages(*p, in_ir, out_ir, True) for p in ps]
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g_multi = jax.grad(loss_multi)(parts)
    g_single = jax.grad(loss_single)(parts)
    for gm, gs in zip(g_multi, g_single):
        for a, b in zip(gm, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_flop_trace_registry():
    """The analytic FLOP registry records kernel calls at trace time and
    scales linearly in padded edge count (backs bench.py's honest MFU)."""
    from diffdock_pocket_tpu.ops import pallas_tp

    ladder = feature_ladder(8, 2, False)
    in_ir = out_ir = ladder[1]

    def run(E):
        pallas_tp.start_flop_trace()
        _case(in_ir, out_ir, E=E)
        return pallas_tp.stop_flop_trace()

    f128 = run(128)
    f256 = run(256)
    assert f128 > 0
    assert abs(f256 / f128 - 2.0) < 1e-6
    # off outside a trace window
    assert pallas_tp.stop_flop_trace() == 0.0
    # dominated by the weight matmul term: sanity lower bound
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    from diffdock_pocket_tpu.ops.pallas_tp import _plan

    _, rows_pad = _plan(tp)
    assert f128 >= 2.0 * rows_pad * 25 * 128  # H=24 -> K=H+1=25
