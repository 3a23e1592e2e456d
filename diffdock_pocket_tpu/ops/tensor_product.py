"""Equivariant tensor products over concatenated-irreps feature arrays.

Three flavours, mirroring what the reference models use:

- ``FasterTensorProduct``: the lmax=1 scalar/dot/cross decomposition used on
  every hot conv (reference: models/layers.py:8-85; active in all published
  configs via --sh_lmax 1).  Fresh JAX implementation over [..., dim] arrays;
  the per-edge weight application is grouped into one batched matmul per
  output irrep type so XLA can fuse it behind the edge-MLP matmul.
- ``FullyConnectedTensorProduct``: generic CG-based weighted TP for arbitrary
  irreps (reference: o3.FullyConnectedTensorProduct used when sh_lmax=2 and
  in the torsion heads).  CG tensors come from ops/wigner.py.
- ``FullTensorProduct``: unweighted all-paths product (reference:
  o3.FullTensorProduct, torsion-head ``sh (x) 2e`` composition,
  models/score_model.py:302).

Normalization conventions ('component' + fan-in weight scaling):
- path output = sqrt(2 l3 + 1) * einsum(w3j_orthonormal, x, y): this exactly
  reproduces the reference FasterTensorProduct factors (scalar-mul 1,
  dot 1/sqrt(3), cross 1/sqrt(2)).
- per-output-block weights are divided by sqrt(total fan-in), as in
  models/layers.py:63.

These are plain Python classes holding *static* metadata; __call__ is pure
jnp and jit/vmap-safe.  Weights are supplied per call (they come from the
edge MLPs), so the classes are stateless.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

# Tensor-product einsums are precision-critical (equivariance error compounds
# across 6 conv layers); XLA's default matmul precision is bf16-class, so all
# TP contractions force fp32.  The FLOP-dominant edge MLPs elsewhere keep the
# fast default.
_PREC = jax.lax.Precision.HIGHEST


def _einsum(eq, *args):
    return jnp.einsum(eq, *args, precision=_PREC)


def _einsum_fast(eq, *args):
    """bf16-input einsum accumulating in fp32 — used for the per-edge weight
    application when ``low_precision_weights`` is on.  The per-edge weights
    are rotation-invariant scalars, so bf16 here costs ~0.3% noise and no
    equivariance; it halves the dominant HBM traffic ([E, weight_numel]
    tensors) and doubles MXU rate."""
    cast = [a.astype(jnp.bfloat16) for a in args]
    return jnp.einsum(eq, *cast, preferred_element_type=jnp.float32)

from .irreps import Irrep, Irreps
from .wigner import real_wigner_3j

Array = jax.Array


def _split_blocks(x: Array, irreps: Irreps) -> list[Array]:
    """Split [..., dim] into per-block arrays [..., mul, 2l+1]."""
    out = []
    for (mul, ir), sl in zip(irreps, irreps.slices()):
        out.append(x[..., sl].reshape(x.shape[:-1] + (mul, ir.dim)))
    return out


def _merge_blocks(blocks: list[Array], irreps: Irreps) -> Array:
    parts = []
    for b, (mul, ir) in zip(blocks, irreps):
        parts.append(b.reshape(b.shape[:-2] + (mul * ir.dim,)))
    return jnp.concatenate(parts, axis=-1)


class FasterTensorProduct:
    """(0e/1o/1e/0o multiplicities) (x) (1x0e + 1x1o) -> (0e/1o/1e/0o).

    Inputs: ``x`` [..., in_dim], ``sh`` [..., 4], ``weight`` [..., numel].
    """

    _KEYS = ("0e", "1o", "1e", "0o")

    def __init__(self, in_irreps, sh_irreps, out_irreps, low_precision_weights=False):
        self.in_irreps = Irreps.parse(in_irreps)
        self.out_irreps = Irreps.parse(out_irreps)
        self.low_precision_weights = low_precision_weights
        sh = Irreps.parse(sh_irreps)
        assert sh.dim == 4 and sh.blocks[0][1].l == 0, "sh must be 1x0e+1x1o"

        def muls(irreps):
            d = {k: 0 for k in self._KEYS}
            for mul, ir in irreps:
                assert ir.l <= 1, "FasterTensorProduct is an lmax=1 fast path"
                d[str(ir)] += mul
            return d

        self.in_muls = muls(self.in_irreps)
        self.out_muls = muls(self.out_irreps)
        im, om = self.in_muls, self.out_muls
        # fan-in composition per output type (order fixed; documented here):
        #   0e <- [0e*s, 1o.v]         1o <- [0e(x)v, 1o*s, 1e x v]
        #   1e <- [1o x v, 1e*s, 0o(x)v]   0o <- [1e.v, 0o*s]
        self.weight_shapes = {
            "0e": (im["0e"] + im["1o"], om["0e"]),
            "1o": (im["0e"] + im["1o"] + im["1e"], om["1o"]),
            "1e": (im["1o"] + im["1e"] + im["0o"], om["1e"]),
            "0o": (im["1e"] + im["0o"], om["0o"]),
        }
        self.weight_numel = sum(a * b for a, b in self.weight_shapes.values())

    def __call__(self, x: Array, sh: Array, weight: Array) -> Array:
        xb: dict[str, Array] = {}
        for (mul, ir), sl in zip(self.in_irreps, self.in_irreps.slices()):
            key = str(ir)
            blk = x[..., sl]
            if ir.l == 1:
                blk = blk.reshape(blk.shape[:-1] + (mul, 3))
            prev = xb.get(key)
            xb[key] = blk if prev is None else jnp.concatenate([prev, blk], axis=-2 if ir.l else -1)

        s = sh[..., 0]
        v = sh[..., 1:]
        s_ = s[..., None]
        v_ = v[..., None, :]  # broadcast over mul axis

        cand: dict[str, list[Array]] = {k: [] for k in self._KEYS}
        inv_sqrt3 = 1.0 / math.sqrt(3.0)
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        if "0e" in xb:
            cand["0e"].append(xb["0e"] * s_)
            cand["1o"].append(xb["0e"][..., None] * v_)
        if "1o" in xb:
            cand["0e"].append(jnp.sum(xb["1o"] * v_, axis=-1) * inv_sqrt3)
            cand["1o"].append(xb["1o"] * s_[..., None])
            cand["1e"].append(jnp.cross(xb["1o"], v_) * inv_sqrt2)
        if "1e" in xb:
            cand["1o"].append(jnp.cross(xb["1e"], v_) * inv_sqrt2)
            cand["1e"].append(xb["1e"] * s_[..., None])
            cand["0o"].append(jnp.sum(xb["1e"] * v_, axis=-1) * inv_sqrt3)
        if "0o" in xb:
            cand["1e"].append(xb["0o"][..., None] * v_)
            cand["0o"].append(xb["0o"] * s_)

        # weight slices, in _KEYS order
        wdict = {}
        start = 0
        for key in self._KEYS:
            fin, fout = self.weight_shapes[key]
            n = fin * fout
            wdict[key] = weight[..., start : start + n].reshape(
                weight.shape[:-1] + (fin, fout)
            ) / math.sqrt(max(fin, 1))
            start += n

        ein = _einsum_fast if self.low_precision_weights else _einsum
        outs: dict[str, Array] = {}
        for key in self._KEYS:
            if not cand[key] or self.out_muls[key] == 0:
                continue
            if key in ("0e", "0o"):
                z = jnp.concatenate(cand[key], axis=-1)  # [..., fin]
                outs[key] = ein("...i,...io->...o", z, wdict[key])
            else:
                z = jnp.concatenate(cand[key], axis=-2)  # [..., fin, 3]
                outs[key] = ein("...ic,...io->...oc", z, wdict[key])

        parts = []
        for mul, ir in self.out_irreps:
            key = str(ir)
            o = outs.get(key)
            if o is None:
                parts.append(jnp.zeros(x.shape[:-1] + (mul * ir.dim,), x.dtype))
            else:
                parts.append(o.reshape(o.shape[: -2 if ir.l else -1] + (mul * ir.dim,)))
        return jnp.concatenate(parts, axis=-1)


class FullyConnectedTensorProduct:
    """Generic weighted CG tensor product x (x) sh -> out.

    ``sh`` blocks must have multiplicity 1 (true for all reference usages —
    spherical harmonics and their unweighted products)."""

    def __init__(self, in_irreps, sh_irreps, out_irreps, low_precision_weights=False):
        self.in_irreps = Irreps.parse(in_irreps)
        self.sh_irreps = Irreps.parse(sh_irreps)
        self.out_irreps = Irreps.parse(out_irreps)
        self.low_precision_weights = low_precision_weights
        for mul, _ in self.sh_irreps:
            assert mul == 1, "sh multiplicities must be 1"

        # enumerate paths per output block
        self.paths: list[list[tuple[int, int, np.ndarray]]] = []  # per out blk
        self.fan_in: list[int] = []
        for ko, (mul_o, ir_o) in enumerate(self.out_irreps):
            plist = []
            fin = 0
            for ki, (mul_i, ir_i) in enumerate(self.in_irreps):
                for ks, (_, ir_s) in enumerate(self.sh_irreps):
                    if ir_i.p * ir_s.p != ir_o.p:
                        continue
                    if not (abs(ir_i.l - ir_s.l) <= ir_o.l <= ir_i.l + ir_s.l):
                        continue
                    cg = real_wigner_3j(ir_i.l, ir_s.l, ir_o.l) * math.sqrt(ir_o.dim)
                    plist.append((ki, ks, cg.astype(np.float32)))
                    fin += mul_i
            self.paths.append(plist)
            self.fan_in.append(fin)
        self.weight_numel = sum(
            self.fan_in[k] * mul_o for k, (mul_o, _) in enumerate(self.out_irreps)
        )

    def __call__(self, x: Array, sh: Array, weight: Array) -> Array:
        xin = _split_blocks(x, self.in_irreps)
        shin = _split_blocks(sh, self.sh_irreps)  # each [..., 1, 2l+1]

        out_blocks = []
        wstart = 0
        for ko, (mul_o, ir_o) in enumerate(self.out_irreps):
            plist = self.paths[ko]
            fin = self.fan_in[ko]
            if not plist or fin == 0:
                out_blocks.append(jnp.zeros(x.shape[:-1] + (mul_o, ir_o.dim), x.dtype))
                continue
            msgs = []
            for ki, ks, cg in plist:
                xi = xin[ki]  # [..., mul_i, di]
                ss = shin[ks][..., 0, :]  # [..., ds]
                m = _einsum("...ua,...b,abc->...uc", xi, ss, jnp.asarray(cg))
                msgs.append(m)
            z = jnp.concatenate(msgs, axis=-2)  # [..., fin, do]
            n = fin * mul_o
            w = weight[..., wstart : wstart + n].reshape(
                weight.shape[:-1] + (fin, mul_o)
            ) / math.sqrt(fin)
            wstart += n
            ein = _einsum_fast if self.low_precision_weights else _einsum
            out_blocks.append(ein("...uc,...uo->...oc", z, w))
        return _merge_blocks(out_blocks, self.out_irreps)


class FullTensorProduct:
    """Unweighted all-paths product of two mul-1 irreps sets (e.g. sh (x) 2e).

    Output irreps are sorted+simplified-ordered (by (l, p)), matching how the
    reference feeds ``final_tp_tor.irreps_out`` into the torsion bond conv.
    """

    def __init__(self, irreps1, irreps2):
        self.irreps1 = Irreps.parse(irreps1)
        self.irreps2 = Irreps.parse(irreps2)
        for mul, _ in list(self.irreps1) + list(self.irreps2):
            assert mul == 1, "FullTensorProduct supports mul-1 inputs"
        raw: list[tuple[int, int, Irrep]] = []
        for k1, (_, ir1) in enumerate(self.irreps1):
            for k2, (_, ir2) in enumerate(self.irreps2):
                for l3 in range(abs(ir1.l - ir2.l), ir1.l + ir2.l + 1):
                    raw.append((k1, k2, Irrep(l3, ir1.p * ir2.p)))
        # sort outputs by (l, p) for a deterministic, e3nn-like layout
        raw.sort(key=lambda t: (t[2].l, -t[2].p))
        self.path_list = raw
        self.irreps_out = Irreps(tuple((1, ir) for _, _, ir in raw))

    def __call__(self, x1: Array, x2: Array) -> Array:
        b1 = _split_blocks(x1, self.irreps1)
        b2 = _split_blocks(x2, self.irreps2)
        parts = []
        for k1, k2, ir3 in self.path_list:
            ir1 = self.irreps1.blocks[k1][1]
            ir2 = self.irreps2.blocks[k2][1]
            cg = real_wigner_3j(ir1.l, ir2.l, ir3.l) * math.sqrt(ir3.dim)
            m = _einsum(
                "...a,...b,abc->...c",
                b1[k1][..., 0, :],
                b2[k2][..., 0, :],
                jnp.asarray(cg.astype(np.float32)),
            )
            parts.append(m)
        return jnp.concatenate(parts, axis=-1)


def make_tensor_product(in_irreps, sh_irreps, out_irreps, faster: bool,
                        low_precision_weights: bool = False):
    """Factory mirroring TensorProductConvLayer's choice
    (reference: models/score_model.py:95-98)."""
    if faster:
        return FasterTensorProduct(in_irreps, sh_irreps, out_irreps, low_precision_weights)
    return FullyConnectedTensorProduct(in_irreps, sh_irreps, out_irreps, low_precision_weights)
