"""All-atom SE(3)-equivariant score/confidence model (the flagship).

Capability parity with the reference all-atom TensorProductScoreModel
(models/all_atom_score_model.py:21-653): three node types (ligand atoms,
receptor residues, receptor atoms), 9 tensor-product convs per layer
(3 intra + 6 directed cross), last-layer skip optimisation, center conv for
tr/rot scores with sigma-conditioned magnitude MLPs, pseudotorque bond convs
for ligand torsions and side-chain chi angles, and a confidence mode with
pooled ligand + flexible-atom scalars.

TPU-native redesign (vs. the reference's per-forward torch_cluster graphs and
scatter ops):
- batch-first padded arrays with masks ([B, NL/NR/NA, ...]); jit compiles
  once per bucket;
- ligand radius graph / atom kNN graph / lig-atom cross edges are fixed-K
  nearest-neighbor lists built on device (ops/neighbors.py);
- lig<->rec cross edges use a *dense pair block* [B, NL, NR] with a
  (sigma-dependent) adjacency mask — pocket-scale sizes make all-pairs
  cheaper and far more MXU-friendly than gather/scatter edge lists;
- reversed edge families (al, ra) use batched segment means;
- sigma embeddings are computed once per graph and broadcast (every node of a
  graph shares t);
- so3/torus score norms are HBM-resident table lookups passed in by the
  caller — no host round trips (the reference calls .cpu() on every forward,
  all_atom_score_model.py:384,407,433).

Known deviation (documented): the reference's non-fixed center conv indexes
ligand node features by *graph id* (all_atom_score_model.py:362, a known
quirk); we always use the ligand atom's own features (the fixed_center_conv=
True semantics), which is the sensible variant in a batch-first layout.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import diffusion
from ..graph import ComplexGraph
from ..ops import aggregate, neighbors, spherical
from ..ops.irreps import Irreps, feature_ladder, sh_irreps
from ..ops.tensor_product import FullTensorProduct
from .config import ModelConfig
from .encoders import AtomEncoder
from .layers import MLP, GaussianSmearing, IrrepsBatchNorm, TPConv
from ..data.chem import (
    LIG_FEATURE_DIMS,
    REC_ATOM_FEATURE_DIMS,
    REC_RESIDUE_FEATURE_DIMS,
)

Array = jax.Array


def _broadcast_nodes(x: Array, n: int) -> Array:
    """[B, D] -> [B, n, D]."""
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], n, x.shape[-1]))


def _pad_features(x: Array, dim: int) -> Array:
    if x.shape[-1] == dim:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dim - x.shape[-1])])


class AllAtomScoreModel(nn.Module):
    cfg: ModelConfig

    def _smooth_weight(self, d: Array, max_norm) -> Array:
        """Cosine edge down-weighting (reference get_edge_weight,
        all_atom_score_model.py:438-442); 1.0 when smooth_edges is off."""
        if not self.cfg.smooth_edges:
            return jnp.ones_like(d)
        x = jnp.clip(d * jnp.pi / max_norm, a_max=jnp.pi)
        return 0.5 * (jnp.cos(x) + 1.0)

    @nn.compact
    def __call__(
        self,
        g: ComplexGraph,  # batched [B, ...]
        t: dict[str, Array],  # 'tr','rot','tor','sc_tor' each [B]
        score_norms: Optional[dict[str, Array]] = None,  # 'rot','tor','sc_tor' [B]
        *,
        train: bool = False,
    ):
        cfg = self.cfg
        det = not train
        ura = not train  # batch-norm running averages at eval
        B, NL = g.lig_pos.shape[:2]
        NR = g.rec_pos.shape[1]
        NA = g.atom_pos.shape[1]
        ns, nv = cfg.ns, cfg.nv

        # sigmas from t in every mode (reference derives them through
        # t_to_sigma for the confidence model too — the dynamic cross cutoff
        # depends on sigma_tr, which matters for trajectory-step confidence
        # training where t > 0)
        sigma_tr, sigma_rot, sigma_tor, sigma_sc = cfg.sigma.t_to_sigma(
            t["tr"], t["rot"], t["tor"], t["sc_tor"]
        )

        # ---- sigma embedding (graph level; all nodes share t) -------------
        emb_fn = diffusion.make_timestep_embedding(
            cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale
        )
        if cfg.separate_noise_schedule:
            temb = jnp.concatenate(
                [emb_fn(t[k]) for k in ("tr", "rot", "tor", "sc_tor")], axis=-1
            )
        elif cfg.asyncronous_noise_schedule:
            # embed the base schedule time (reference score_model.py:485-486)
            temb = emb_fn(t["t"])
        else:
            temb = emb_fn(t["tr"])  # [B, D]
        D = temb.shape[-1]

        # ---- RBF expansions ----------------------------------------------
        rbf_lig = GaussianSmearing(0.0, cfg.lig_max_radius, cfg.distance_embed_dim)
        rbf_rec = GaussianSmearing(0.0, cfg.rec_max_radius, cfg.distance_embed_dim)
        rbf_cross = GaussianSmearing(0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim)

        # ---- node encoders ------------------------------------------------
        lig_x = AtomEncoder(ns, LIG_FEATURE_DIMS, cfg.use_old_atom_encoder)(
            g.lig_feat, _broadcast_nodes(temb, NL)
        )
        rec_feat = g.rec_feat
        if cfg.no_aminoacid_identities:
            rec_feat = rec_feat * 0
        rec_extra = jnp.concatenate(
            [_broadcast_nodes(temb, NR), g.rec_esm], axis=-1
        )
        rec_x = AtomEncoder(ns, REC_RESIDUE_FEATURE_DIMS, cfg.use_old_atom_encoder)(
            rec_feat, rec_extra
        )
        atom_x = AtomEncoder(ns, REC_ATOM_FEATURE_DIMS, cfg.use_old_atom_encoder)(
            g.atom_feat, _broadcast_nodes(temb, NA)
        )

        sh_dim = (cfg.sh_lmax + 1) ** 2
        shl = lambda vec: spherical.sh_ladder(cfg.sh_lmax, vec)

        # ==================================================================
        # Edge families (built once; geometry is fixed during one forward)
        # ==================================================================

        # -- ligand bond edges [B, EB] -------------------------------------
        bsrc, bdst = g.lig_bond_index[..., 0], g.lig_bond_index[..., 1]
        bond_vec = neighbors.gather_nodes(g.lig_pos, bdst) - neighbors.gather_nodes(g.lig_pos, bsrc)
        bond_d = jnp.linalg.norm(bond_vec, axis=-1)
        EB = bsrc.shape[1]
        bond_raw = jnp.concatenate(
            [g.lig_bond_attr, _broadcast_nodes(temb, EB), rbf_lig(bond_d)], axis=-1
        )
        bond_sh = shl(bond_vec)
        bond_w = self._smooth_weight(bond_d, cfg.lig_max_radius)

        # -- ligand radius K-list [B, NL, KL] ------------------------------
        lnbr_idx, lnbr_ok = neighbors.topk_neighbors(
            g.lig_pos, g.lig_mask, g.lig_pos, g.lig_mask,
            cfg.lig_max_neighbors, cutoff=cfg.lig_max_radius, exclude_self=True,
            approx=cfg.approx_neighbor_search,
        )
        lnbr_vec = neighbors.gather_nodes(g.lig_pos, lnbr_idx) - g.lig_pos[:, :, None, :]
        lnbr_d = jnp.linalg.norm(lnbr_vec, axis=-1)
        KL = cfg.lig_max_neighbors
        lnbr_raw = jnp.concatenate(
            [
                jnp.zeros((B, NL, KL, cfg.in_lig_edge_features)),
                jnp.broadcast_to(temb[:, None, None, :], (B, NL, KL, D)),
                rbf_lig(lnbr_d),
            ],
            axis=-1,
        )
        lnbr_sh = shl(lnbr_vec)
        lnbr_w = self._smooth_weight(lnbr_d, cfg.lig_max_radius)

        lig_edge_mlp = MLP([ns, ns], dropout=cfg.dropout)
        bond_attr = lig_edge_mlp(bond_raw, deterministic=det)
        lnbr_attr = lig_edge_mlp(lnbr_raw, deterministic=det)

        # heavy = rec-intra + atom-intra families on.  The skip variant
        # (cfg.skip_heavy_intra) still CONSTRUCTS every submodule in the
        # same order — flax auto-names (MLP_0, MLP_1, ...) are assigned at
        # creation, so gating only the calls keeps the parameter tree
        # weight-compatible with the full model.
        heavy = not cfg.skip_heavy_intra

        # -- receptor residue K-list [B, NR, KR] (precomputed on host) -----
        rnbr_mlp = MLP([ns, ns], dropout=cfg.dropout)
        if heavy:
            rnbr_idx, rnbr_ok = g.rec_nbr_idx, g.rec_nbr_mask
            rnbr_vec = neighbors.gather_nodes(g.rec_pos, rnbr_idx) - g.rec_pos[:, :, None, :]
            rnbr_d = jnp.linalg.norm(rnbr_vec, axis=-1)
            KR = rnbr_idx.shape[-1]
            rnbr_raw = jnp.concatenate(
                [jnp.broadcast_to(temb[:, None, None, :], (B, NR, KR, D)), rbf_rec(rnbr_d)],
                axis=-1,
            )
            rnbr_sh = shl(rnbr_vec)
            rnbr_w = self._smooth_weight(rnbr_d, cfg.rec_max_radius)
            rnbr_attr = rnbr_mlp(rnbr_raw, deterministic=det)

        # -- receptor atom kNN K-list [B, NA, KA] (rebuilt every forward —
        #    side-chain atoms move during sampling; reference all_atom:524)
        anbr_mlp = MLP([ns, ns], dropout=cfg.dropout)
        if heavy:
            anbr_idx, anbr_ok = neighbors.topk_neighbors(
                g.atom_pos, g.atom_mask, g.atom_pos, g.atom_mask,
                cfg.atom_max_neighbors, exclude_self=True,
                approx=cfg.approx_neighbor_search,
            )
            anbr_vec = neighbors.gather_nodes(g.atom_pos, anbr_idx) - g.atom_pos[:, :, None, :]
            anbr_d = jnp.linalg.norm(anbr_vec, axis=-1)
            KA = cfg.atom_max_neighbors
            anbr_raw = jnp.concatenate(
                [jnp.broadcast_to(temb[:, None, None, :], (B, NA, KA, D)), rbf_lig(anbr_d)],
                axis=-1,
            )
            anbr_sh = shl(anbr_vec)
            anbr_w = self._smooth_weight(anbr_d, cfg.lig_max_radius)
            anbr_attr = anbr_mlp(anbr_raw, deterministic=det)

        # -- lig<->rec cross pair block ------------------------------------
        # dense [B, NL, NR] (reference radius() semantics) or top-K capped
        # lists per direction (cross_lig_rec_max_neighbors > 0)
        if cfg.dynamic_max_cross:
            cross_cutoff = sigma_tr * 3.0 + 20.0  # [B]
        else:
            cross_cutoff = jnp.full((B,), cfg.cross_max_distance)
        KLR = cfg.cross_lig_rec_max_neighbors
        KRL = cfg.cross_rec_lig_max_neighbors
        if bool(KLR) != bool(KRL):
            raise ValueError(
                "cross_lig_rec_max_neighbors and cross_rec_lig_max_neighbors "
                "must be set together (the dense reverse family reuses the "
                "dense pair block)"
            )
        lr_mlp = MLP([ns, ns], dropout=cfg.dropout)
        if KLR:
            lr_idx, lr_ok = neighbors.topk_neighbors(
                g.lig_pos, g.lig_mask, g.rec_pos, g.rec_mask, KLR,
                cutoff=cross_cutoff, approx=True,
            )
            lr_vec = (
                neighbors.gather_nodes(g.rec_pos, lr_idx)
                - g.lig_pos[:, :, None, :]
            )  # rec - lig
            lr_cols = KLR
        else:
            lr_idx = None
            lr_vec = g.rec_pos[:, None, :, :] - g.lig_pos[:, :, None, :]
            lr_cols = NR
        lr_d = jnp.linalg.norm(lr_vec, axis=-1)
        if not KLR:
            lr_ok = (
                g.lig_mask[:, :, None]
                & g.rec_mask[:, None, :]
                & (lr_d < cross_cutoff[:, None, None])
            )
        lr_raw = jnp.concatenate(
            [
                jnp.broadcast_to(temb[:, None, None, :], (B, NL, lr_cols, D)),
                rbf_cross(lr_d),
            ],
            axis=-1,
        )
        lr_sh = shl(lr_vec)
        lr_w = self._smooth_weight(lr_d, cross_cutoff[:, None, None])
        lr_attr = lr_mlp(lr_raw, deterministic=det)
        if KRL:
            # reverse direction gets its own capped list (per rec residue)
            rl_idx, rl_ok = neighbors.topk_neighbors(
                g.rec_pos, g.rec_mask, g.lig_pos, g.lig_mask, KRL,
                cutoff=cross_cutoff, approx=True,
            )
            rl_vec = (
                g.rec_pos[:, :, None, :]
                - neighbors.gather_nodes(g.lig_pos, rl_idx)
            )  # rec - lig (same edge orientation as the dense block)
            rl_d = jnp.linalg.norm(rl_vec, axis=-1)
            rl_raw = jnp.concatenate(
                [
                    jnp.broadcast_to(temb[:, None, None, :], (B, NR, KRL, D)),
                    rbf_cross(rl_d),
                ],
                axis=-1,
            )
            rl_sh = shl(rl_vec)
            rl_w = self._smooth_weight(rl_d, cross_cutoff[:, None, None])
            rl_attr_base = lr_mlp(rl_raw, deterministic=det)
        else:
            rl_idx = None

        # -- lig->atom K-list [B, NL, KLA] (cutoff = lig radius) -----------
        la_idx, la_ok = neighbors.topk_neighbors(
            g.lig_pos, g.lig_mask, g.atom_pos, g.atom_mask,
            cfg.cross_lig_atom_max_neighbors, cutoff=cfg.lig_max_radius,
            approx=cfg.approx_neighbor_search,
        )
        la_vec = neighbors.gather_nodes(g.atom_pos, la_idx) - g.lig_pos[:, :, None, :]
        la_d = jnp.linalg.norm(la_vec, axis=-1)
        KLA = cfg.cross_lig_atom_max_neighbors
        la_raw = jnp.concatenate(
            [jnp.broadcast_to(temb[:, None, None, :], (B, NL, KLA, D)), rbf_cross(la_d)],
            axis=-1,
        )
        la_sh = shl(la_vec)
        la_w = self._smooth_weight(la_d, cfg.lig_max_radius)
        la_attr = MLP([ns, ns], dropout=cfg.dropout)(la_raw, deterministic=det)

        # -- atom->residue membership edges [B, NA] ------------------------
        ar_vec = neighbors.gather_nodes(g.rec_pos, g.atom_res_index) - g.atom_pos
        ar_d = jnp.linalg.norm(ar_vec, axis=-1)
        ar_raw = jnp.concatenate(
            [_broadcast_nodes(temb, NA), rbf_rec(ar_d)], axis=-1
        )
        ar_sh = shl(ar_vec)
        ar_attr = MLP([ns, ns], dropout=cfg.dropout)(ar_raw, deterministic=det)

        # ==================================================================
        # Convolution stack
        # ==================================================================
        ladder = feature_ladder(ns, nv, cfg.use_second_order_repr)
        faster = cfg.sh_lmax == 1 and not cfg.use_second_order_repr
        shirr = str(sh_irreps(cfg.sh_lmax))

        def scal(x):
            return x[..., :ns]

        from ..ops.pallas_tp import backend_is_tpu, fused_tp_messages_multi
        from ..ops.pallas_tp_fc import fused_fc_tp_messages_multi

        # all conv families of a layer share irreps -> batch them into ONE
        # fused kernel launch; the lmax=1 fast path and the general CG path
        # (second-order reps) have separate kernels but the same batching
        batch_families = cfg.batch_conv_families and backend_is_tpu()

        def run_convs(specs, in_ir, out_ir):
            """Run conv families [(module, x_dst, sh, attr, ew), ...].

            On TPU all families of a layer share irreps and launch as ONE
            fused Pallas kernel (fused_tp_messages_multi, or the general
            fused_fc_tp_messages_multi on the second-order path) — ~10x
            fewer launches/DMA stalls per layer; elsewhere falls back to the
            per-family TPConv paths (identical math)."""
            if not batch_families:
                return [c(x, s, a, w, deterministic=det) for c, x, s, a, w in specs]
            parts, leads = [], []
            for c, x, s, a, w in specs:
                h, w2, b2 = c(x, s, a, w, deterministic=det, return_parts=True)
                lead = h.shape[:-1]
                leads.append(lead)
                if isinstance(w, float):
                    ew = jnp.full(lead, w, jnp.float32)
                else:
                    ew = jnp.broadcast_to(w, lead).astype(jnp.float32)
                parts.append((
                    h.reshape(-1, h.shape[-1]),
                    x.reshape(-1, x.shape[-1]),
                    s.reshape(-1, s.shape[-1]),
                    ew.reshape(-1),
                    w2, b2,
                ))
            from ..ops.pallas_tp import fused_interpret

            interp = fused_interpret()
            if faster:
                outs = fused_tp_messages_multi(
                    tuple(parts), str(Irreps.parse(in_ir)),
                    str(Irreps.parse(out_ir)), interp
                )
            else:
                outs = fused_fc_tp_messages_multi(
                    tuple(parts), str(Irreps.parse(in_ir)), shirr,
                    str(Irreps.parse(out_ir)), interp
                )
            return [o.reshape(lead + (o.shape[-1],)) for o, lead in zip(outs, leads)]

        for l in range(cfg.num_conv_layers):
            in_ir = str(ladder[min(l, 3)])
            out_ir = str(ladder[min(l + 1, 3)])
            out_dim = Irreps.parse(out_ir).dim

            def conv(name):
                return TPConv(
                    in_irreps=in_ir, sh_irreps=shirr, out_irreps=out_ir,
                    n_edge_features=3 * ns, dropout=cfg.dropout, faster=faster,
                    low_precision_weights=cfg.low_precision_weights,
                    bf16_attr=cfg.bf16_edge_attr,
                    name=f"conv_{l}_{name}",
                )

            def bn(name):
                if not cfg.batch_norm:
                    return lambda x, mask: x
                mod = IrrepsBatchNorm(out_ir, name=f"bn_{l}_{name}")
                return lambda x, mask: mod(x, mask, use_running_average=ura)

            last = l == cfg.num_conv_layers - 1
            do_atom = cfg.flexible_sidechains or not last
            conv_lig = conv("lig")

            # ---- family inputs (gathers/concats; all read LAST layer's
            #      features, so messages can be computed in one batch) ------
            xg_b = neighbors.gather_nodes(lig_x, bdst)
            attr_b = jnp.concatenate(
                [bond_attr, scal(neighbors.gather_nodes(lig_x, bsrc)), scal(xg_b)], -1
            )
            xg_r = neighbors.gather_nodes(lig_x, lnbr_idx)
            attr_r = jnp.concatenate(
                [lnbr_attr, jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, KL, ns)), scal(xg_r)], -1
            )
            if lr_idx is not None:
                xg_lr = neighbors.gather_nodes(rec_x, lr_idx)
                attr_lr = jnp.concatenate(
                    [
                        lr_attr,
                        jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, lr_cols, ns)),
                        scal(xg_lr),
                    ],
                    -1,
                )
                x_lr = xg_lr
            else:
                attr_lr = jnp.concatenate(
                    [
                        lr_attr,
                        jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, NR, ns)),
                        jnp.broadcast_to(scal(rec_x)[:, None, :, :], (B, NL, NR, ns)),
                    ],
                    -1,
                )
                x_lr = jnp.broadcast_to(rec_x[:, None, :, :], (B, NL, NR, rec_x.shape[-1]))
            xg_la = neighbors.gather_nodes(atom_x, la_idx)
            attr_la = jnp.concatenate(
                [la_attr, jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, KLA, ns)), scal(xg_la)], -1
            )
            names = ["bond", "lnbr", "lr", "la"]
            specs = [
                (conv_lig, xg_b, bond_sh, attr_b, bond_w),      # lig intra: bonds
                (conv_lig, xg_r, lnbr_sh, attr_r, lnbr_w),      # lig intra: radius
                (conv("lr"), x_lr, lr_sh, attr_lr, lr_w),       # rec -> lig
                (conv("la"), xg_la, la_sh, attr_la, la_w),      # atom -> lig
            ]
            if do_atom:
                if heavy:
                    xg_a = neighbors.gather_nodes(atom_x, anbr_idx)
                    attr_a = jnp.concatenate(
                        [anbr_attr, jnp.broadcast_to(scal(atom_x)[:, :, None, :], (B, NA, KA, ns)), scal(xg_a)], -1
                    )
                    names.append("atom")
                    specs.append((conv("atom"), xg_a, anbr_sh, attr_a, anbr_w))
                attr_al = jnp.concatenate(
                    [la_attr, scal(xg_la), jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, KLA, ns))], -1
                )
                x_al = jnp.broadcast_to(lig_x[:, :, None, :], (B, NL, KLA, lig_x.shape[-1]))
                xg_ar = neighbors.gather_nodes(rec_x, g.atom_res_index)
                attr_ar = jnp.concatenate([ar_attr, scal(atom_x), scal(xg_ar)], -1)
                names += ["al", "ar"]
                specs += [
                    (conv("al"), x_al, la_sh, attr_al, la_w),       # lig -> atom
                    (conv("ar"), xg_ar, ar_sh, attr_ar, 1.0),       # rec -> atom
                ]
                if not last:
                    if heavy:
                        xg_rr = neighbors.gather_nodes(rec_x, rnbr_idx)
                        attr_rr = jnp.concatenate(
                            [rnbr_attr, jnp.broadcast_to(scal(rec_x)[:, :, None, :], (B, NR, KR, ns)), scal(xg_rr)], -1
                        )
                    if rl_idx is not None:
                        xg_rl = neighbors.gather_nodes(lig_x, rl_idx)
                        attr_rl = jnp.concatenate(
                            [
                                rl_attr_base,
                                jnp.broadcast_to(
                                    scal(rec_x)[:, :, None, :], (B, NR, KRL, ns)
                                ),
                                scal(xg_rl),
                            ],
                            -1,
                        )
                        x_rl = xg_rl
                        rl_sh_use, rl_w_use = rl_sh, rl_w
                    else:
                        attr_rl = jnp.concatenate(
                            [
                                lr_attr,
                                jnp.broadcast_to(scal(rec_x)[:, None, :, :], (B, NL, NR, ns)),
                                jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, NR, ns)),
                            ],
                            -1,
                        )
                        x_rl = jnp.broadcast_to(lig_x[:, :, None, :], (B, NL, NR, lig_x.shape[-1]))
                        rl_sh_use, rl_w_use = lr_sh, lr_w
                    attr_ra = jnp.concatenate([ar_attr, scal(xg_ar), scal(atom_x)], -1)
                    if heavy:
                        names.append("rec")
                        specs.append((conv("rec"), xg_rr, rnbr_sh, attr_rr, rnbr_w))
                    names += ["rl", "ra"]
                    specs += [
                        (conv("rl"), x_rl, rl_sh_use, attr_rl, rl_w_use),  # lig -> rec
                        (conv("ra"), atom_x, ar_sh, attr_ra, 1.0),       # atom -> rec
                    ]

            msgs = dict(zip(names, run_convs(specs, in_ir, out_ir)))
            m_b, m_r, m_lr, m_la = (msgs[n] for n in ("bond", "lnbr", "lr", "la"))

            # ---- LIGAND update (lig intra + lr + la) ---------------------
            sum_b = aggregate.scatter_sum_batched(m_b, bsrc, g.lig_bond_mask, NL)
            cnt_b = aggregate.scatter_sum_batched(
                jnp.ones(bsrc.shape + (1,)), bsrc, g.lig_bond_mask, NL
            )[..., 0]
            sum_r = aggregate.masked_sum(m_r, lnbr_ok, axis=2)
            cnt_r = jnp.sum(lnbr_ok, axis=2)
            lig_update = (sum_b + sum_r) / jnp.maximum(cnt_b + cnt_r, 1.0)[..., None]
            lig_update = bn("lig")(lig_update, g.lig_mask)

            lr_update = aggregate.masked_mean(m_lr, lr_ok, axis=2)
            lr_update = bn("lr")(lr_update, g.lig_mask)

            la_update = aggregate.masked_mean(m_la, la_ok, axis=2)
            la_update = bn("la")(la_update, g.lig_mask)

            if do_atom:
                # ---- ATOM update (atom intra + al + ar) ------------------
                m_al, m_ar = msgs["al"], msgs["ar"]
                if heavy:
                    atom_update = aggregate.masked_mean(msgs["atom"], anbr_ok, axis=2)
                    atom_update = bn("atom")(atom_update, g.atom_mask)
                else:
                    atom_update = 0.0

                al_update = aggregate.scatter_mean_batched(
                    m_al.reshape(B, NL * KLA, -1),
                    la_idx.reshape(B, NL * KLA),
                    (la_ok & g.lig_mask[:, :, None]).reshape(B, NL * KLA),
                    NA,
                )
                al_update = bn("al")(al_update, g.atom_mask)

                ar_update = m_ar * g.atom_mask[..., None]
                ar_update = bn("ar")(ar_update, g.atom_mask)

                if not last:
                    # ---- RECEPTOR update (rec intra + rl + ra) -----------
                    m_rl, m_ra = msgs["rl"], msgs["ra"]
                    if heavy:
                        rec_update = aggregate.masked_mean(msgs["rec"], rnbr_ok, axis=2)
                        rec_update = bn("rec")(rec_update, g.rec_mask)
                    else:
                        rec_update = 0.0

                    if rl_idx is not None:
                        rl_update = aggregate.masked_mean(m_rl, rl_ok, axis=2)
                    else:
                        rl_update = aggregate.masked_mean(m_rl, lr_ok, axis=1)
                    rl_update = bn("rl")(rl_update, g.rec_mask)

                    ra_update = aggregate.scatter_mean_batched(
                        m_ra, g.atom_res_index, g.atom_mask, NR
                    )
                    ra_update = bn("ra")(ra_update, g.rec_mask)

            # ---- residual adds with feature growth -----------------------
            lig_x = _pad_features(lig_x, out_dim) + lig_update + lr_update + la_update
            if cfg.flexible_sidechains or not last:
                atom_x = _pad_features(atom_x, out_dim) + atom_update + al_update + ar_update
                if not last:
                    rec_x = _pad_features(rec_x, out_dim) + rec_update + rl_update + ra_update

        # ==================================================================
        # Heads
        # ==================================================================
        num_sc_bonds_mask = g.sc_bond_mask  # [B, S]

        if cfg.confidence_mode:
            if cfg.num_conv_layers >= 3:
                scalar_lig = jnp.concatenate([lig_x[..., :ns], lig_x[..., -ns:]], -1)
            else:
                scalar_lig = lig_x[..., :ns]
            pooled = aggregate.masked_mean(scalar_lig, g.lig_mask, axis=1)  # [B, 2ns]
            conf_in = pooled
            if cfg.flexible_sidechains:
                # atoms at the endpoints of flexible chi bonds (reference
                # get_sc_tor_bonds(...).unique(), all_atom:337)
                flex_mask = jnp.zeros((B, NA), dtype=bool)
                for side in range(2):
                    flex_mask = jax.vmap(
                        lambda fm, idx, ok: fm.at[idx].max(ok)
                    )(flex_mask, g.sc_bond_index[..., side], g.sc_bond_mask)
                if cfg.num_conv_layers >= 3:
                    scalar_atom = jnp.concatenate([atom_x[..., :ns], atom_x[..., -ns:]], -1)
                else:
                    scalar_atom = atom_x[..., :ns]
                pooled_atom = aggregate.masked_mean(scalar_atom, flex_mask & g.atom_mask, axis=1)
                any_flex = jnp.any(num_sc_bonds_mask, axis=1)[:, None]
                pooled_atom = jnp.where(any_flex, pooled_atom, 0.0)
                conf_in = jnp.concatenate([conf_in, pooled_atom], -1)

            if cfg.parallel > 1:
                # `parallel` pose replicas per complex: the leading batch is
                # B * parallel; the filtering logit stays per-pose while the
                # affinity head aggregates pose features per complex
                # (reference all_atom_score_model.py:346-352)
                n_out = 1 + ns if cfg.affinity_prediction else cfg.num_confidence_outputs
            else:
                n_out = cfg.num_confidence_outputs + (1 if cfg.affinity_prediction else 0)
            h = conf_in
            for i, f in enumerate([ns, ns]):
                h = nn.Dense(f)(h)
                if not cfg.confidence_no_batchnorm:
                    if cfg.parallel > 1:
                        # LayerNorm in parallel mode (deviation from the
                        # reference's BatchNorm1d, :136-146): the batch is
                        # B/parallel complexes x parallel NEAR-IDENTICAL
                        # pose replicas, so per-feature batch statistics
                        # have ~B/parallel effective samples (2 at the
                        # affinity journey's batch size) and the running
                        # averages diverge from the degenerate batch stats
                        # (measured: val BCE ~300 with train BCE ~1 while
                        # the same trunk at parallel=1/batch 16 evals fine).
                        h = nn.LayerNorm()(h)
                    else:
                        h = nn.BatchNorm(use_running_average=ura, momentum=0.9)(h)
                h = nn.relu(h)
                h = nn.Dropout(cfg.confidence_dropout)(h, deterministic=det)
            confidence = nn.Dense(n_out)(h)

            if cfg.parallel > 1 and cfg.affinity_prediction:
                P = cfg.parallel
                assert B % P == 0, "batch must be complexes x parallel"
                filtering = confidence[:, 0].reshape(B // P, P)
                feats = confidence[:, 1:].reshape(B // P, P, ns)
                aggs = []
                for agg in cfg.parallel_aggregators.split(" "):
                    if agg == "mean":
                        aggs.append(feats.mean(axis=1))
                    elif agg == "max":
                        aggs.append(feats.max(axis=1))
                    elif agg == "min":
                        aggs.append(feats.min(axis=1))
                    elif agg == "std":
                        # sqrt(var)+eps form: plain .std has a NaN gradient
                        # when the P pose replicas happen to be identical
                        # (duplicate poses occur when a complex has fewer
                        # generated poses than `parallel`)
                        aggs.append(jnp.sqrt(feats.var(axis=1) + 1e-8))
                aff_in = jnp.concatenate(aggs, axis=-1)
                ha = aff_in
                for f in (ns, ns):
                    ha = nn.Dense(f)(ha)
                    if not cfg.confidence_no_batchnorm:
                        # LayerNorm, NOT BatchNorm (deviation from reference
                        # all_atom_score_model.py:148-159 BatchNorm1d): this
                        # head's batch axis is B/parallel COMPLEXES (2 at the
                        # journey batch size), and its inputs are cross-pose
                        # aggregates whose per-feature batch variance
                        # collapses when the sampler's poses converge (std
                        # aggregator ~ 0 for every complex).  BatchNorm then
                        # degenerates: train mode normalizes 2-sample batches
                        # to exactly +-1 while the running variance decays
                        # toward 0, so eval mode amplifies by
                        # rsqrt(var+eps) ~ 300 per layer (observed: val
                        # affinity MSE ~1e9 with train z-loss ~0.9).
                        # LayerNorm is batch-size independent and has no
                        # train/eval statistics gap.
                        ha = nn.LayerNorm()(ha)
                    ha = nn.relu(ha)
                    ha = nn.Dropout(cfg.confidence_dropout)(ha, deterministic=det)
                affinity = nn.Dense(1)(ha)[..., 0]
                return filtering, affinity

            if n_out == 1:
                confidence = confidence[..., 0]
            return confidence

        # ---- center conv -> tr/rot vectors --------------------------------
        lig_w = g.lig_mask.astype(lig_x.dtype)
        center = aggregate.masked_mean(g.lig_pos, g.lig_mask, axis=1)  # [B, 3]
        c_vec = g.lig_pos - center[:, None, :]
        c_d = jnp.linalg.norm(c_vec, axis=-1)
        rbf_center = GaussianSmearing(0.0, cfg.center_max_distance, cfg.distance_embed_dim)
        c_raw = jnp.concatenate([rbf_center(c_d), _broadcast_nodes(temb, NL)], -1)
        c_attr = MLP([ns, ns], dropout=cfg.dropout)(c_raw, deterministic=det)
        c_attr = jnp.concatenate([c_attr, lig_x[..., :ns]], -1)
        c_sh = shl(c_vec)
        final_out = "2x1o + 2x1e" if not cfg.odd_parity else "1x1o + 1x1e"
        m_c = TPConv(
            in_irreps=str(ladder[min(cfg.num_conv_layers, 3)]),
            sh_irreps=shirr, out_irreps=final_out,
            n_edge_features=2 * ns, dropout=cfg.dropout, faster=faster,
            low_precision_weights=cfg.low_precision_weights,
            name="final_conv",
        )(lig_x, c_sh, c_attr, 1.0, deterministic=det)
        global_pred = aggregate.masked_mean(m_c, g.lig_mask, axis=1)  # [B, 12]
        if cfg.batch_norm:
            global_pred = IrrepsBatchNorm(final_out, name="bn_final")(
                global_pred[:, None, :], jnp.ones((B, 1), bool), use_running_average=ura
            )[:, 0, :]

        if cfg.odd_parity:
            tr_pred, rot_pred = global_pred[:, :3], global_pred[:, 3:6]
        else:
            tr_pred = global_pred[:, :3] + global_pred[:, 6:9]
            rot_pred = global_pred[:, 3:6] + global_pred[:, 9:12]

        # magnitude MLPs conditioned on |v| and the sigma embedding
        graph_temb = temb
        tr_norm = jnp.linalg.norm(tr_pred, axis=-1, keepdims=True)
        tr_mag = MLP([ns, 1], dropout=cfg.dropout, name="tr_final")(
            jnp.concatenate([tr_norm, graph_temb], -1), deterministic=det
        )
        tr_pred = tr_pred / jnp.maximum(tr_norm, 1e-12) * tr_mag
        rot_norm = jnp.linalg.norm(rot_pred, axis=-1, keepdims=True)
        rot_mag = MLP([ns, 1], dropout=cfg.dropout, name="rot_final")(
            jnp.concatenate([rot_norm, graph_temb], -1), deterministic=det
        )
        rot_pred = rot_pred / jnp.maximum(rot_norm, 1e-12) * rot_mag

        if cfg.scale_by_sigma:
            assert score_norms is not None, "scale_by_sigma needs table lookups"
            tr_pred = tr_pred / sigma_tr[:, None]
            rot_pred = rot_pred * score_norms["rot"][:, None]

        # ---- ligand torsion head -----------------------------------------
        T = g.tor_bond_index.shape[1]
        if cfg.no_torsion:
            tor_pred = jnp.zeros((B, T))
        else:
            tor_pred = self._pseudotorque_head(
                "tor", g.lig_pos, g.lig_mask, lig_x, g.tor_bond_index,
                g.tor_bond_mask, ladder, rbf_lig, det, ura,
            )
            if cfg.scale_by_sigma:
                tor_pred = tor_pred * jnp.sqrt(score_norms["tor"])[:, None]

        # ---- side-chain torsion head -------------------------------------
        S = g.sc_bond_index.shape[1]
        if not cfg.flexible_sidechains:
            sc_pred = jnp.zeros((B, S))
        else:
            sc_pred = self._pseudotorque_head(
                "sc_tor", g.atom_pos, g.atom_mask, atom_x, g.sc_bond_index,
                g.sc_bond_mask, ladder, rbf_lig, det, ura,
            )
            if cfg.scale_by_sigma:
                sc_pred = sc_pred * jnp.sqrt(score_norms["sc_tor"])[:, None]

        return tr_pred, rot_pred, tor_pred, sc_pred

    def _pseudotorque_head(
        self, name, pos, mask, node_x, bond_index, bond_mask, ladder, rbf, det, ura
    ):
        """Shared ligand-torsion / side-chain-torsion pseudotorque conv
        (reference build_bond_conv_graph + tor_bond_conv,
        all_atom_score_model.py:390-434, 601-636).

        Top-K bond-to-node neighbor lists within lig_max_radius.  The
        reference's radius() calls here keep torch_cluster's default
        max_num_neighbors=32, so K=bond_conv_max_neighbors=32 is faithful
        (nearest-32 rather than first-32-found) and avoids a dense
        [bonds, atoms] block — the all-atom side-chain head drops from
        ~295k to ~8k edges at 3dpf/B=8 sizes (~18 ms -> ~1 ms).
        """
        cfg = self.cfg
        ns = cfg.ns
        B, N = pos.shape[:2]
        T = bond_index.shape[1]
        K = min(N, cfg.bond_conv_max_neighbors)

        pu = neighbors.gather_nodes(pos, bond_index[..., 0])
        pv = neighbors.gather_nodes(pos, bond_index[..., 1])
        bond_pos = 0.5 * (pu + pv)  # [B, T, 3]
        bond_vec = pv - pu

        idx, ok = neighbors.topk_neighbors(
            bond_pos, bond_mask, pos, mask, K, cutoff=cfg.lig_max_radius,
            approx=cfg.approx_neighbor_search,
        )  # [B, T, K]
        vec = neighbors.gather_nodes(pos, idx) - bond_pos[:, :, None, :]
        d = jnp.linalg.norm(vec, axis=-1)
        raw = rbf(d)
        attr = MLP([ns, ns], dropout=cfg.dropout, name=f"{name}_edge_mlp")(
            raw, deterministic=det
        )
        bond_attr_full = neighbors.gather_nodes(node_x, bond_index[..., 0]) + \
            neighbors.gather_nodes(node_x, bond_index[..., 1])  # [B, T, dim]
        xg = neighbors.gather_nodes(node_x, idx)  # [B, T, K, dim]
        attr = jnp.concatenate(
            [
                attr,
                xg[..., :ns],
                jnp.broadcast_to(bond_attr_full[:, :, None, :ns], (B, T, K, ns)),
            ],
            -1,
        )

        shv = spherical.sh_ladder(cfg.sh_lmax, vec)
        bond_sh2 = spherical.sh_single(2, bond_vec)  # '2e' of the bond axis
        ftp = FullTensorProduct(str(sh_irreps(cfg.sh_lmax)), "1x2e")
        edge_sh = ftp(shv, jnp.broadcast_to(bond_sh2[:, :, None, :], shv.shape[:-1] + (5,)))

        out_ir = f"{ns}x0o + {ns}x0e" if not cfg.odd_parity else f"{ns}x0o"
        m = TPConv(
            in_irreps=str(ladder[min(cfg.num_conv_layers, 3)]),
            sh_irreps=str(ftp.irreps_out), out_irreps=out_ir,
            n_edge_features=3 * ns, dropout=cfg.dropout, faster=False,
            low_precision_weights=cfg.low_precision_weights,
            name=f"{name}_bond_conv",
        )(
            xg, edge_sh, attr, self._smooth_weight(d, cfg.lig_max_radius),
            deterministic=det,
        )
        agg = aggregate.masked_mean(m, ok, axis=2)  # [B, T, 2ns]
        if cfg.batch_norm:
            agg = IrrepsBatchNorm(out_ir, name=f"bn_{name}_bond")(
                agg, bond_mask, use_running_average=ura
            )
        h = nn.Dense(ns, use_bias=False, name=f"{name}_final_0")(agg)
        h = jnp.tanh(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=det)
        out = nn.Dense(1, use_bias=False, name=f"{name}_final_1")(h)
        return out[..., 0]
