"""Model building blocks: distance smearing, edge MLPs, masked irreps batch
norm, and the tensor-product conv message layer.

Parity targets (reference):
- GaussianSmearing             models/score_model.py:661-671
- TensorProductConvLayer       models/score_model.py:84-125
- e3nn.nn.BatchNorm            used in every conv layer

TPU-native notes: everything is batch-first ([B, nodes/edges, ...]) with
explicit masks; batch-norm statistics are masked so padded nodes contribute
nothing; the conv layer only *computes messages* — each call site reduces
them with the aggregation that matches its edge family (dense pair block,
K-neighbor list, or scatter), which keeps the reductions axis-local and
MXU/VPU friendly.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.irreps import Irreps
from ..ops.tensor_product import make_tensor_product

Array = jax.Array


class GaussianSmearing(nn.Module):
    """Distance -> RBF embedding on a fixed linspace grid."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist: Array) -> Array:
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        diff = dist[..., None] - offset
        return jnp.exp(coeff * diff * diff)


class MLP(nn.Module):
    """Linear-ReLU-Dropout-Linear stack (the reference's nn.Sequential edge
    embedders and final layers)."""

    features: Sequence[int]
    dropout: float = 0.0
    activate_final: bool = False
    use_bias: bool = True
    final_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias)(x)
            last = i == len(self.features) - 1
            if not last or self.activate_final:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if last and self.final_activation is not None:
                x = self.final_activation(x)
        return x


class IrrepsBatchNorm(nn.Module):
    """Masked per-irrep batch normalization with running statistics.

    Semantics follow e3nn.nn.BatchNorm (normalization='component',
    reduce='mean', momentum 0.1, affine): scalars are mean-subtracted and
    variance-normalized; l>0 blocks are normalized by the running mean of
    their component-mean squared norms; affine weight per mul (bias only for
    scalars).  Statistics are masked means over [B, N] real nodes.
    """

    irreps: Irreps
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, mask: Array, *, use_running_average: bool = False) -> Array:
        irreps = Irreps.parse(self.irreps)
        m = mask.astype(x.dtype)  # [B, N]
        denom = jnp.maximum(jnp.sum(m), 1.0)

        out_parts = []
        for bi, ((mul, ir), sl) in enumerate(zip(irreps, irreps.slices())):
            blk = x[..., sl].reshape(x.shape[:-1] + (mul, ir.dim))

            ra_mean = self.variable(
                "batch_stats", f"mean_{bi}", lambda: jnp.zeros((mul,))
            )
            ra_var = self.variable(
                "batch_stats", f"var_{bi}", lambda: jnp.ones((mul,))
            )

            if ir.l == 0:
                if use_running_average:
                    mean = ra_mean.value
                else:
                    mean = jnp.sum(blk[..., 0] * m[..., None], axis=(0, 1)) / denom
                    ra_mean.value = (
                        (1 - self.momentum) * ra_mean.value + self.momentum * mean
                    )
                blk = blk - mean[:, None]

            # component-mean squared norm per mul channel
            if use_running_average:
                var = ra_var.value
            else:
                norm2 = jnp.mean(blk * blk, axis=-1)  # [B, N, mul]
                var = jnp.sum(norm2 * m[..., None], axis=(0, 1)) / denom
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var

            weight = self.param(f"weight_{bi}", nn.initializers.ones, (mul,))
            inv = jax.lax.rsqrt(var + self.eps) * weight
            blk = blk * inv[:, None]
            if ir.l == 0:
                bias = self.param(f"bias_{bi}", nn.initializers.zeros, (mul,))
                blk = blk + bias[:, None]
            out_parts.append(blk.reshape(x.shape[:-1] + (mul * ir.dim,)))
        return jnp.concatenate(out_parts, axis=-1)


class TPConv(nn.Module):
    """Edge-message layer: fc(edge_attr) -> per-edge TP weights -> messages.

    __call__(x_dst, edge_sh, edge_attr, edge_weight) returns per-edge
    messages with the same leading shape as edge_attr; the caller aggregates
    (masked mean) onto destination nodes and applies IrrepsBatchNorm.

    reference: TensorProductConvLayer fc+tp (models/score_model.py:100-114).
    """

    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    hidden_features: Optional[int] = None
    dropout: float = 0.0
    faster: bool = True
    low_precision_weights: bool = False
    fused: bool = True  # use the Pallas fused kernel on TPU (lmax=1 path)
    # cast the raw edge-attr concat to bf16 and run fc1 as a bf16 MXU
    # matmul: the [B, N, K, D] attr tensors dominate XLA-side HBM traffic
    # (ROADMAP r2 perf candidate); h is consumed in bf16 by the fused
    # kernel anyway, so downstream numerics are unchanged on that path
    bf16_attr: bool = False

    @nn.compact
    def __call__(
        self,
        x_dst: Array,  # [..., in_dim] gathered destination-node features
        edge_sh: Array,  # [..., sh_dim]
        edge_attr: Array,  # [..., n_edge_features]
        edge_weight: Array | float = 1.0,
        *,
        deterministic: bool = True,
        return_parts: bool = False,
    ) -> Array:
        from ..ops.irreps import Irreps as _Irreps
        from ..ops.pallas_tp import backend_is_tpu, fused_tp_messages

        tp = make_tensor_product(self.in_irreps, self.sh_irreps, self.out_irreps,
                                 self.faster, self.low_precision_weights)
        hidden = self.hidden_features or self.n_edge_features

        # first MLP layer (shared param layout between both execution paths)
        if self.bf16_attr:
            edge_attr = edge_attr.astype(jnp.bfloat16)
            h = nn.Dense(hidden, name="fc1", dtype=jnp.bfloat16)(edge_attr)
            h = nn.relu(h).astype(jnp.float32)
        else:
            h = nn.Dense(hidden, name="fc1")(edge_attr)
            h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        w2 = self.param(
            "fc2_kernel", nn.initializers.lecun_normal(), (hidden, tp.weight_numel)
        )
        b2 = self.param("fc2_bias", nn.initializers.zeros, (tp.weight_numel,))

        if return_parts:
            # caller batches several same-irreps families into ONE fused
            # kernel launch (ops/pallas_tp.py::fused_tp_messages_multi)
            return h, w2, b2

        # fused kernels: the lmax=1 fast path has hand-written fwd+bwd Pallas
        # kernels (ops/pallas_tp.py, ops/pallas_tp_bwd.py); the general CG
        # path (second-order reps / sh_lmax=2, faster=False) has a fused
        # Pallas forward with an XLA-recompute backward (ops/pallas_tp_fc.py)
        use_fused = self.fused and self.faster and backend_is_tpu()
        use_fused_fc = (
            self.fused and not self.faster and backend_is_tpu()
            and all(mul == 1 for mul, _ in _Irreps.parse(self.sh_irreps))
        )
        if use_fused or use_fused_fc:
            lead = h.shape[:-1]
            if isinstance(edge_weight, float):
                ew = jnp.full(lead, edge_weight, jnp.float32)
            else:
                ew = jnp.broadcast_to(edge_weight, lead)
            flat = (
                h.reshape(-1, hidden),
                x_dst.reshape(-1, x_dst.shape[-1]),
                edge_sh.reshape(-1, edge_sh.shape[-1]),
                ew.reshape(-1),
                w2, b2,
            )
            from ..ops.pallas_tp import fused_interpret

            interp = fused_interpret()
            if use_fused:
                msgs = fused_tp_messages(
                    *flat,
                    str(_Irreps.parse(self.in_irreps)),
                    str(_Irreps.parse(self.out_irreps)),
                    interp,
                )
            else:
                from ..ops.pallas_tp_fc import fused_fc_tp_messages

                msgs = fused_fc_tp_messages(
                    *flat,
                    str(_Irreps.parse(self.in_irreps)),
                    str(_Irreps.parse(self.sh_irreps)),
                    str(_Irreps.parse(self.out_irreps)),
                    interp,
                )
            return msgs.reshape(lead + (msgs.shape[-1],))

        w = h @ w2 + b2
        if not isinstance(edge_weight, float):
            w = w * edge_weight[..., None]
        elif edge_weight != 1.0:
            w = w * edge_weight
        if self.low_precision_weights:
            # the [edges, weight_numel] tensor dominates HBM traffic; store
            # it in bf16 (weights are invariant scalars — see ops docstring)
            w = w.astype(jnp.bfloat16)
        return tp(x_dst, edge_sh, w)
