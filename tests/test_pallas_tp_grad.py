"""Gradient parity of the fused TP custom VJP (interpret mode on CPU)
against jax autodiff of the XLA reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_pocket_tpu.ops import spherical
from diffdock_pocket_tpu.ops.irreps import Irreps, feature_ladder
from diffdock_pocket_tpu.ops.pallas_tp import fused_tp_messages
from diffdock_pocket_tpu.ops.tensor_product import FasterTensorProduct


def _inputs(in_ir, E=40, H=16, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((E, H)).astype(np.float32)
    x = rng.standard_normal((E, Irreps.parse(in_ir).dim)).astype(np.float32)
    vec = rng.standard_normal((E, 3)).astype(np.float32)
    sh = np.asarray(spherical.sh_ladder(1, jnp.asarray(vec)))
    ew = rng.uniform(0.5, 1.0, E).astype(np.float32)
    return h, x, sh, ew


@pytest.mark.parametrize("layer", [1, 3])
def test_fused_vjp_matches_autodiff(layer):
    ladder = feature_ladder(6, 2, False)
    in_ir = str(ladder[layer])
    out_ir = str(ladder[min(layer + 1, 3)])
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    h, x, sh, ew = _inputs(in_ir, seed=layer)
    rng = np.random.default_rng(layer + 50)
    w2 = (rng.standard_normal((h.shape[1], tp.weight_numel)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(tp.weight_numel) * 0.1).astype(np.float32)
    cot = rng.standard_normal((h.shape[0], Irreps.parse(out_ir).dim)).astype(np.float32)

    def ref_fn(h_, x_, w2_, b2_):
        w = (h_ @ w2_ + b2_) * jnp.asarray(ew)[:, None]
        return tp(x_, jnp.asarray(sh), w)

    def fused_fn(h_, x_, w2_, b2_):
        return fused_tp_messages(
            h_, x_, jnp.asarray(sh), jnp.asarray(ew), w2_, b2_,
            in_ir, out_ir, True,
        )

    args = (jnp.asarray(h), jnp.asarray(x), jnp.asarray(w2), jnp.asarray(b2))
    out_ref, vjp_ref = jax.vjp(ref_fn, *args)
    out_fused, vjp_fused = jax.vjp(fused_fn, *args)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=2e-2, rtol=2e-2)

    g_ref = vjp_ref(jnp.asarray(cot))
    g_fused = vjp_fused(jnp.asarray(cot))
    names = ["dh", "dx", "dw2", "db2"]
    for name, a, b in zip(names, g_fused, g_ref):
        scale = np.abs(np.asarray(b)).max() + 1e-3
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-2,
            err_msg=f"gradient mismatch for {name}",
        )


def test_fused_vjp_through_loss():
    """End-to-end scalar-loss gradient check (what training actually does)."""
    ladder = feature_ladder(4, 2, False)
    in_ir = out_ir = str(ladder[3])
    tp = FasterTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    h, x, sh, ew = _inputs(in_ir, E=20, H=8, seed=9)
    rng = np.random.default_rng(99)
    w2 = (rng.standard_normal((8, tp.weight_numel)) * 0.1).astype(np.float32)
    b2 = np.zeros(tp.weight_numel, np.float32)

    def loss_fused(w2_):
        out = fused_tp_messages(
            jnp.asarray(h), jnp.asarray(x), jnp.asarray(sh), jnp.asarray(ew),
            w2_, jnp.asarray(b2), in_ir, out_ir, True,
        )
        return jnp.sum(out**2)

    def loss_ref(w2_):
        w = (jnp.asarray(h) @ w2_ + jnp.asarray(b2)) * jnp.asarray(ew)[:, None]
        return jnp.sum(tp(jnp.asarray(x), jnp.asarray(sh), w) ** 2)

    g1 = jax.grad(loss_fused)(jnp.asarray(w2))
    g2 = jax.grad(loss_ref)(jnp.asarray(w2))
    scale = np.abs(np.asarray(g2)).max() + 1e-3
    np.testing.assert_allclose(
        np.asarray(g1) / scale, np.asarray(g2) / scale, atol=3e-2
    )
