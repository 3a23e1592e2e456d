"""C-alpha (coarse-grained) SE(3)-equivariant score/confidence model.

Capability parity with the reference CG TensorProductScoreModel
(models/score_model.py:127-658): two node types (ligand atoms, receptor
residues), per layer 2 intra + 2 directed cross convs, last-layer receptor
skip, center conv for tr/rot, pseudotorque bond conv for ligand torsions,
confidence mode.  (The optional miscellaneous-atom node type of the reference
is subsumed by the all-atom model here; include_miscellaneous_atoms is
accepted in the config for yml compatibility but routes to the all-atom
pathway.)

Shares all building blocks with the all-atom model; see
all_atom_score_model.py for the TPU-native design notes (dense pair blocks,
K-lists, masked batch norms, graph-level sigma embeddings).
"""
from __future__ import annotations

from typing import Optional

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
from ..data.chem import LIG_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS

Array = jax.Array


def _broadcast_nodes(x: Array, n: int) -> Array:
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], n, x.shape[-1]))


def _pad_features(x: Array, dim: int) -> Array:
    if x.shape[-1] == dim:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dim - x.shape[-1])])


class CGScoreModel(nn.Module):
    cfg: ModelConfig

    def _smooth_weight(self, d, max_norm):
        if not self.cfg.smooth_edges:
            return jnp.ones_like(d)
        x = jnp.clip(d * jnp.pi / max_norm, a_max=jnp.pi)
        return 0.5 * (jnp.cos(x) + 1.0)

    @nn.compact
    def __call__(
        self,
        g: ComplexGraph,
        t: dict[str, Array],
        score_norms: Optional[dict[str, Array]] = None,
        *,
        train: bool = False,
    ):
        cfg = self.cfg
        det = not train
        ura = not train
        B, NL = g.lig_pos.shape[:2]
        NR = g.rec_pos.shape[1]
        ns, nv = cfg.ns, cfg.nv

        # sigmas via t_to_sigma in every mode (see all_atom_score_model note)
        sigma_tr, sigma_rot, sigma_tor, _ = cfg.sigma.t_to_sigma(
            t["tr"], t["rot"], t["tor"], t["sc_tor"]
        )

        emb_fn = diffusion.make_timestep_embedding(
            cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale
        )
        if cfg.separate_noise_schedule:
            temb = jnp.concatenate(
                [emb_fn(t[k]) for k in ("tr", "rot", "tor")], axis=-1
            )
        elif cfg.asyncronous_noise_schedule:
            # embed the base schedule time (reference score_model.py:485-486)
            temb = emb_fn(t["t"])
        else:
            temb = emb_fn(t["tr"])
        D = temb.shape[-1]

        rbf_lig = GaussianSmearing(0.0, cfg.lig_max_radius, cfg.distance_embed_dim)
        rbf_rec = GaussianSmearing(0.0, cfg.rec_max_radius, cfg.distance_embed_dim)
        rbf_cross = GaussianSmearing(0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim)

        lig_x = AtomEncoder(ns, LIG_FEATURE_DIMS, cfg.use_old_atom_encoder)(
            g.lig_feat, _broadcast_nodes(temb, NL)
        )
        rec_feat = g.rec_feat * 0 if cfg.no_aminoacid_identities else g.rec_feat
        rec_extra = jnp.concatenate([_broadcast_nodes(temb, NR), g.rec_esm], axis=-1)
        rec_x = AtomEncoder(ns, REC_RESIDUE_FEATURE_DIMS, cfg.use_old_atom_encoder)(
            rec_feat, rec_extra
        )

        shl = lambda vec: spherical.sh_ladder(cfg.sh_lmax, vec)

        # ---- edge families ----------------------------------------------
        bsrc, bdst = g.lig_bond_index[..., 0], g.lig_bond_index[..., 1]
        bond_vec = neighbors.gather_nodes(g.lig_pos, bdst) - neighbors.gather_nodes(g.lig_pos, bsrc)
        bond_d = jnp.linalg.norm(bond_vec, axis=-1)
        EB = bsrc.shape[1]
        bond_raw = jnp.concatenate(
            [g.lig_bond_attr, _broadcast_nodes(temb, EB), rbf_lig(bond_d)], -1
        )
        bond_sh = shl(bond_vec)
        bond_w = self._smooth_weight(bond_d, cfg.lig_max_radius)

        lnbr_idx, lnbr_ok = neighbors.topk_neighbors(
            g.lig_pos, g.lig_mask, g.lig_pos, g.lig_mask,
            cfg.lig_max_neighbors, cutoff=cfg.lig_max_radius, exclude_self=True,
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
            -1,
        )
        lnbr_sh = shl(lnbr_vec)
        lnbr_w = self._smooth_weight(lnbr_d, cfg.lig_max_radius)
        lig_edge_mlp = MLP([ns, ns], dropout=cfg.dropout)
        bond_attr = lig_edge_mlp(bond_raw, deterministic=det)
        lnbr_attr = lig_edge_mlp(lnbr_raw, deterministic=det)

        rnbr_idx, rnbr_ok = g.rec_nbr_idx, g.rec_nbr_mask
        rnbr_vec = neighbors.gather_nodes(g.rec_pos, rnbr_idx) - g.rec_pos[:, :, None, :]
        rnbr_d = jnp.linalg.norm(rnbr_vec, axis=-1)
        KR = rnbr_idx.shape[-1]
        rnbr_raw = jnp.concatenate(
            [jnp.broadcast_to(temb[:, None, None, :], (B, NR, KR, D)), rbf_rec(rnbr_d)], -1
        )
        rnbr_sh = shl(rnbr_vec)
        rnbr_w = self._smooth_weight(rnbr_d, cfg.rec_max_radius)
        rnbr_attr = MLP([ns, ns], dropout=cfg.dropout)(rnbr_raw, deterministic=det)

        if cfg.dynamic_max_cross:
            cross_cutoff = sigma_tr * 3.0 + 20.0
        else:
            cross_cutoff = jnp.full((B,), cfg.cross_max_distance)
        lr_vec = g.rec_pos[:, None, :, :] - g.lig_pos[:, :, None, :]
        lr_d = jnp.linalg.norm(lr_vec, axis=-1)
        lr_ok = (
            g.lig_mask[:, :, None]
            & g.rec_mask[:, None, :]
            & (lr_d < cross_cutoff[:, None, None])
        )
        lr_raw = jnp.concatenate(
            [jnp.broadcast_to(temb[:, None, None, :], (B, NL, NR, D)), rbf_cross(lr_d)], -1
        )
        lr_sh = shl(lr_vec)
        lr_w = self._smooth_weight(lr_d, cross_cutoff[:, None, None])
        lr_attr = MLP([ns, ns], dropout=cfg.dropout)(lr_raw, deterministic=det)

        # ---- conv stack --------------------------------------------------
        ladder = feature_ladder(ns, nv, cfg.use_second_order_repr)
        faster = cfg.sh_lmax == 1 and not cfg.use_second_order_repr
        shirr = str(sh_irreps(cfg.sh_lmax))
        scal = lambda x: x[..., :ns]

        for l in range(cfg.num_conv_layers):
            in_ir = str(ladder[min(l, 3)])
            out_ir = str(ladder[min(l + 1, 3)])
            out_dim = Irreps.parse(out_ir).dim
            mk = lambda name: TPConv(
                in_irreps=in_ir, sh_irreps=shirr, out_irreps=out_ir,
                n_edge_features=3 * ns, dropout=cfg.dropout, faster=faster,
                low_precision_weights=cfg.low_precision_weights,
                name=f"conv_{l}_{name}",
            )
            def bn(name):
                if not cfg.batch_norm:
                    return lambda x, mask: x
                mod = IrrepsBatchNorm(out_ir, name=f"bn_{l}_{name}")
                return lambda x, mask: mod(x, mask, use_running_average=ura)

            last = l == cfg.num_conv_layers - 1
            conv_lig = mk("lig")

            xg_b = neighbors.gather_nodes(lig_x, bdst)
            attr_b = jnp.concatenate(
                [bond_attr, scal(neighbors.gather_nodes(lig_x, bsrc)), scal(xg_b)], -1
            )
            m_b = conv_lig(xg_b, bond_sh, attr_b, bond_w, deterministic=det)
            sum_b = aggregate.scatter_sum_batched(m_b, bsrc, g.lig_bond_mask, NL)
            cnt_b = aggregate.scatter_sum_batched(
                jnp.ones(bsrc.shape + (1,)), bsrc, g.lig_bond_mask, NL
            )[..., 0]
            xg_r = neighbors.gather_nodes(lig_x, lnbr_idx)
            attr_r = jnp.concatenate(
                [lnbr_attr, jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, KL, ns)), scal(xg_r)], -1
            )
            m_r = conv_lig(xg_r, lnbr_sh, attr_r, lnbr_w, deterministic=det)
            lig_update = (sum_b + aggregate.masked_sum(m_r, lnbr_ok, axis=2)) / jnp.maximum(
                cnt_b + jnp.sum(lnbr_ok, axis=2), 1.0
            )[..., None]
            lig_update = bn("lig")(lig_update, g.lig_mask)

            attr_lr = jnp.concatenate(
                [
                    lr_attr,
                    jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, NR, ns)),
                    jnp.broadcast_to(scal(rec_x)[:, None, :, :], (B, NL, NR, ns)),
                ],
                -1,
            )
            m_lr = mk("lr")(
                jnp.broadcast_to(rec_x[:, None, :, :], (B, NL, NR, rec_x.shape[-1])),
                lr_sh, attr_lr, lr_w, deterministic=det,
            )
            lr_update = bn("lr")(aggregate.masked_mean(m_lr, lr_ok, axis=2), g.lig_mask)

            if not last:
                xg_rr = neighbors.gather_nodes(rec_x, rnbr_idx)
                attr_rr = jnp.concatenate(
                    [rnbr_attr, jnp.broadcast_to(scal(rec_x)[:, :, None, :], (B, NR, KR, ns)), scal(xg_rr)], -1
                )
                m_rr = mk("rec")(xg_rr, rnbr_sh, attr_rr, rnbr_w, deterministic=det)
                rec_update = bn("rec")(aggregate.masked_mean(m_rr, rnbr_ok, axis=2), g.rec_mask)

                attr_rl = jnp.concatenate(
                    [
                        lr_attr,
                        jnp.broadcast_to(scal(rec_x)[:, None, :, :], (B, NL, NR, ns)),
                        jnp.broadcast_to(scal(lig_x)[:, :, None, :], (B, NL, NR, ns)),
                    ],
                    -1,
                )
                m_rl = mk("rl")(
                    jnp.broadcast_to(lig_x[:, :, None, :], (B, NL, NR, lig_x.shape[-1])),
                    lr_sh, attr_rl, lr_w, deterministic=det,
                )
                rl_update = bn("rl")(aggregate.masked_mean(m_rl, lr_ok, axis=1), g.rec_mask)

            lig_x = _pad_features(lig_x, out_dim) + lig_update + lr_update
            if not last:
                rec_x = _pad_features(rec_x, out_dim) + rec_update + rl_update

        # ---- heads -------------------------------------------------------
        if cfg.confidence_mode:
            if cfg.num_conv_layers >= 3:
                scalar_lig = jnp.concatenate([lig_x[..., :ns], lig_x[..., -ns:]], -1)
            else:
                scalar_lig = lig_x[..., :ns]
            pooled = aggregate.masked_mean(scalar_lig, g.lig_mask, axis=1)
            n_out = cfg.num_confidence_outputs + (1 if cfg.affinity_prediction else 0)
            h = pooled
            for f in (ns, ns):
                h = nn.Dense(f)(h)
                if not cfg.confidence_no_batchnorm:
                    h = nn.BatchNorm(use_running_average=ura, momentum=0.9)(h)
                h = nn.relu(h)
                h = nn.Dropout(cfg.confidence_dropout)(h, deterministic=det)
            confidence = nn.Dense(n_out)(h)
            if n_out == 1:
                confidence = confidence[..., 0]
            return confidence

        center = aggregate.masked_mean(g.lig_pos, g.lig_mask, axis=1)
        c_vec = g.lig_pos - center[:, None, :]
        c_d = jnp.linalg.norm(c_vec, axis=-1)
        rbf_center = GaussianSmearing(0.0, cfg.center_max_distance, cfg.distance_embed_dim)
        c_raw = jnp.concatenate([rbf_center(c_d), _broadcast_nodes(temb, NL)], -1)
        c_attr = MLP([ns, ns], dropout=cfg.dropout)(c_raw, deterministic=det)
        c_attr = jnp.concatenate([c_attr, lig_x[..., :ns]], -1)
        final_out = "2x1o + 2x1e" if not cfg.odd_parity else "1x1o + 1x1e"
        m_c = TPConv(
            in_irreps=str(ladder[min(cfg.num_conv_layers, 3)]),
            sh_irreps=shirr, out_irreps=final_out,
            n_edge_features=2 * ns, dropout=cfg.dropout, faster=faster,
            low_precision_weights=cfg.low_precision_weights,
            name="final_conv",
        )(lig_x, shl(c_vec), c_attr, 1.0, deterministic=det)
        global_pred = aggregate.masked_mean(m_c, g.lig_mask, axis=1)
        if cfg.batch_norm:
            global_pred = IrrepsBatchNorm(final_out, name="bn_final")(
                global_pred[:, None, :], jnp.ones((B, 1), bool), use_running_average=ura
            )[:, 0, :]

        if cfg.odd_parity:
            tr_pred, rot_pred = global_pred[:, :3], global_pred[:, 3:6]
        else:
            tr_pred = global_pred[:, :3] + global_pred[:, 6:9]
            rot_pred = global_pred[:, 3:6] + global_pred[:, 9:12]

        tr_norm = jnp.linalg.norm(tr_pred, axis=-1, keepdims=True)
        tr_mag = MLP([ns, 1], dropout=cfg.dropout, name="tr_final")(
            jnp.concatenate([tr_norm, temb], -1), deterministic=det
        )
        tr_pred = tr_pred / jnp.maximum(tr_norm, 1e-12) * tr_mag
        rot_norm = jnp.linalg.norm(rot_pred, axis=-1, keepdims=True)
        rot_mag = MLP([ns, 1], dropout=cfg.dropout, name="rot_final")(
            jnp.concatenate([rot_norm, temb], -1), deterministic=det
        )
        rot_pred = rot_pred / jnp.maximum(rot_norm, 1e-12) * rot_mag

        if cfg.scale_by_sigma:
            assert score_norms is not None
            tr_pred = tr_pred / sigma_tr[:, None]
            rot_pred = rot_pred * score_norms["rot"][:, None]

        T = g.tor_bond_index.shape[1]
        if cfg.no_torsion:
            tor_pred = jnp.zeros((B, T))
        else:
            tor_pred = self._tor_head(g, lig_x, ladder, rbf_lig, det, ura)
            if cfg.scale_by_sigma:
                tor_pred = tor_pred * jnp.sqrt(score_norms["tor"])[:, None]

        sc_pred = jnp.zeros((B, g.sc_bond_index.shape[1]))
        return tr_pred, rot_pred, tor_pred, sc_pred

    def _tor_head(self, g, lig_x, ladder, rbf, det, ura):
        cfg = self.cfg
        ns = cfg.ns
        B, NL = g.lig_pos.shape[:2]
        T = g.tor_bond_index.shape[1]
        pu = neighbors.gather_nodes(g.lig_pos, g.tor_bond_index[..., 0])
        pv = neighbors.gather_nodes(g.lig_pos, g.tor_bond_index[..., 1])
        bond_pos = 0.5 * (pu + pv)
        bond_vec = pv - pu
        vec = g.lig_pos[:, None, :, :] - bond_pos[:, :, None, :]
        d = jnp.linalg.norm(vec, axis=-1)
        ok = g.tor_bond_mask[:, :, None] & g.lig_mask[:, None, :] & (d < cfg.lig_max_radius)
        attr = MLP([ns, ns], dropout=cfg.dropout, name="tor_edge_mlp")(
            rbf(d), deterministic=det
        )
        bond_attr_full = neighbors.gather_nodes(lig_x, g.tor_bond_index[..., 0]) + \
            neighbors.gather_nodes(lig_x, g.tor_bond_index[..., 1])
        attr = jnp.concatenate(
            [
                attr,
                jnp.broadcast_to(lig_x[:, None, :, :ns], (B, T, NL, ns)),
                jnp.broadcast_to(bond_attr_full[:, :, None, :ns], (B, T, NL, ns)),
            ],
            -1,
        )
        shv = spherical.sh_ladder(cfg.sh_lmax, vec)
        bond_sh2 = spherical.sh_single(2, bond_vec)
        ftp = FullTensorProduct(str(sh_irreps(cfg.sh_lmax)), "1x2e")
        edge_sh = ftp(shv, jnp.broadcast_to(bond_sh2[:, :, None, :], shv.shape[:-1] + (5,)))
        out_ir = f"{ns}x0o + {ns}x0e" if not cfg.odd_parity else f"{ns}x0o"
        m = TPConv(
            in_irreps=str(ladder[min(cfg.num_conv_layers, 3)]),
            sh_irreps=str(ftp.irreps_out), out_irreps=out_ir,
            n_edge_features=3 * ns, dropout=cfg.dropout, faster=False,
            low_precision_weights=cfg.low_precision_weights,
            name="tor_bond_conv",
        )(
            jnp.broadcast_to(lig_x[:, None, :, :], (B, T, NL, lig_x.shape[-1])),
            edge_sh, attr, self._smooth_weight(d, cfg.lig_max_radius),
            deterministic=det,
        )
        agg = aggregate.masked_mean(m, ok, axis=2)
        if cfg.batch_norm:
            agg = IrrepsBatchNorm(out_ir, name="bn_tor_bond")(
                agg, g.tor_bond_mask, use_running_average=ura
            )
        h = nn.Dense(ns, use_bias=False, name="tor_final_0")(agg)
        h = jnp.tanh(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=det)
        return nn.Dense(1, use_bias=False, name="tor_final_1")(h)[..., 0]


def get_model(cfg: ModelConfig):
    """Model factory (reference utils/utils.py:59-113 get_model).

    include_miscellaneous_atoms without all_atoms routes to the all-atom
    wiring with the het-group atoms occupying the atom node type (documented
    equivalent of the reference's CG misc-atom conv family,
    models/score_model.py:211-257); flexible side chains require real atoms.
    """
    from .all_atom_score_model import AllAtomScoreModel

    if cfg.all_atoms or cfg.include_miscellaneous_atoms:
        return AllAtomScoreModel(cfg)
    return CGScoreModel(cfg)
