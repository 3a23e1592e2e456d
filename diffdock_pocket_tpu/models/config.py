"""Model hyperparameter config (the model_parameters.yml contract).

Mirrors the constructor surface of the reference models
(models/all_atom_score_model.py:22-32, models/score_model.py:128-138) plus
the TPU-specific static capacities (neighbor caps) that replace dynamic
graph shapes.  Serialized to/loaded from model_parameters.yml next to
checkpoints, exactly like the reference's de-facto model format
(train.py:205-207; inference.py:332-336).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from ..diffusion import SigmaConfig


@dataclass(frozen=True)
class ModelConfig:
    # capacity / architecture
    ns: int = 16
    nv: int = 4
    num_conv_layers: int = 2
    sh_lmax: int = 1
    use_second_order_repr: bool = False
    sigma_embed_dim: int = 32
    distance_embed_dim: int = 32
    cross_distance_embed_dim: int = 32
    in_lig_edge_features: int = 4
    batch_norm: bool = True
    dropout: float = 0.0
    embedding_type: str = "sinusoidal"
    embedding_scale: float = 10000.0
    # store the [edges, weight_numel] TP-weight tensors in bf16 (halves the
    # dominant HBM traffic; weights are invariant scalars so equivariance is
    # unaffected beyond ~0.3% rounding).  Disable for strict-fp32 testing.
    low_precision_weights: bool = True
    # cast the raw edge-attr concats ([B, N, K, D] blocks, the dominant
    # XLA-side HBM traffic) to bf16 and run the edge MLP's first layer as a
    # bf16 MXU matmul (ROADMAP r2 perf candidate; opt-in until journey-
    # validated)
    bf16_edge_attr: bool = False

    # graph geometry
    lig_max_radius: float = 5.0
    rec_max_radius: float = 30.0
    cross_max_distance: float = 250.0
    center_max_distance: float = 30.0
    dynamic_max_cross: bool = False
    smooth_edges: bool = False
    odd_parity: bool = False

    # static neighbor capacities (TPU replacement for dynamic edge counts)
    lig_max_neighbors: int = 24
    atom_max_neighbors: int = 8
    cross_lig_atom_max_neighbors: int = 32
    # lig<->rec cross families: 0 = dense [NL, NR] pair block (the
    # reference's radius() with max_num_neighbors=10000, i.e. every
    # in-cutoff pair, all_atom_score_model.py:545-547).  >0 = top-K nearest
    # within the (dynamic) cutoff.  The dense block is >50% of model FLOPs
    # at pocket sizes; capped variants trade a documented architecture
    # deviation for ~1.5x inference throughput (see BASELINE.md).
    cross_lig_rec_max_neighbors: int = 0
    cross_rec_lig_max_neighbors: int = 0
    # TPU-native approx_max_k (recall >= ~0.95) for ALL neighbor selections
    # instead of exact top_k: exact top_k's sort lowering is pathologically
    # slow inside the sampling lax.scan (BASELINE.md); models are trained
    # and served with the same setting (part of the yml contract).
    approx_neighbor_search: bool = False
    # pseudotorque bond-conv neighborhood cap.  The reference's radius()
    # calls for the bond conv graphs (all_atom_score_model.py:607,627) leave
    # torch_cluster's max_num_neighbors at its default of 32, so a top-32
    # nearest list within lig_max_radius is faithful — and ~12x cheaper than
    # a dense [bonds, atoms] block at all-atom sizes.
    bond_conv_max_neighbors: int = 32
    # launch all conv families of a layer as ONE fused Pallas kernel
    # (ops/pallas_tp.py::fused_tp_messages_multi).  Measured neutral at
    # 3dpf/B=8 on the bench chip (the per-edge weight matmul dominates, so
    # launch amortization buys nothing); kept as a deployment knob for
    # small-batch regimes where launch overhead is a larger fraction.
    batch_conv_families: bool = False
    # drop the rec-intra and atom-intra conv families (and the NAxNA atom
    # kNN search) — the inference-time "high-sigma" model variant: receptor
    # internal features barely change while the ligand is far away, so the
    # sampler runs this reduced model for the first --skip_intra_steps
    # steps (ROADMAP r2 perf candidate; weight-compatible with the full
    # model because every submodule keeps its name/creation order).
    skip_heavy_intra: bool = False

    # task structure
    all_atoms: bool = True
    no_torsion: bool = False
    flexible_sidechains: bool = True
    scale_by_sigma: bool = True
    separate_noise_schedule: bool = False
    asyncronous_noise_schedule: bool = False
    no_aminoacid_identities: bool = False
    fixed_center_conv: bool = True  # see note in AllAtomScoreModel.center head
    include_miscellaneous_atoms: bool = False
    use_old_atom_encoder: bool = False

    # embeddings
    esm_embeddings_dim: int = 0  # 1280 when ESM2-650M embeddings are attached

    # confidence mode
    confidence_mode: bool = False
    num_confidence_outputs: int = 1
    confidence_dropout: float = 0.0
    confidence_no_batchnorm: bool = False
    affinity_prediction: bool = False
    # train-set label statistics (mean, std): the affinity head predicts
    # z-scores internally (a freshly initialized head outputting ~0 then
    # already predicts the train mean, instead of spending most of training
    # crawling toward label scale — the reference trains on raw -logKd and
    # pays exactly that warmup).  Reported/emitted affinities are always
    # un-standardized back to label units (confidence/train.py, pipeline.py).
    affinity_norm: tuple = (0.0, 1.0)
    parallel: int = 1
    parallel_aggregators: str = "mean max min std"

    # diffusion
    sigma: SigmaConfig = field(default_factory=SigmaConfig)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    @staticmethod
    def from_dict(d: dict) -> "ModelConfig":
        d = dict(d)
        sig = d.pop("sigma", None)
        names = {f.name for f in dataclasses.fields(ModelConfig)}
        kwargs = {k: v for k, v in d.items() if k in names and k != "sigma"}
        if "affinity_norm" in kwargs and kwargs["affinity_norm"] is not None:
            kwargs["affinity_norm"] = tuple(kwargs["affinity_norm"])  # yml list
        if sig is not None:
            kwargs["sigma"] = SigmaConfig(**sig) if isinstance(sig, dict) else sig
        return ModelConfig(**kwargs)


# Published reference configs (README.md:72, 82, 88) for convenience.
# The flagship uses capped cross families (top-32/16 within the dynamic
# cutoff) — 1.5x faster than the reference's dense pair semantics at
# validated quality (BASELINE.md journey); set both caps to 0 for the
# exact dense reference semantics.
BIG_SCORE_CONFIG = ModelConfig(
    ns=60, nv=10, num_conv_layers=6, sh_lmax=1,
    sigma_embed_dim=64, distance_embed_dim=64, cross_distance_embed_dim=64,
    dynamic_max_cross=True, dropout=0.1, all_atoms=True,
    flexible_sidechains=True, atom_max_neighbors=8,
    cross_lig_rec_max_neighbors=32, cross_rec_lig_max_neighbors=16,
    approx_neighbor_search=True,
    sigma=SigmaConfig(tr_sigma_min=0.1, tr_sigma_max=5.0),
)
SMALL_SCORE_CONFIG = ModelConfig(
    ns=32, nv=6, num_conv_layers=5, sh_lmax=1,
    dynamic_max_cross=True, dropout=0.1, all_atoms=True,
    flexible_sidechains=True, atom_max_neighbors=12,
    sigma=SigmaConfig(tr_sigma_min=0.1, tr_sigma_max=15.0),
)
CONFIDENCE_CONFIG = ModelConfig(
    ns=24, nv=6, num_conv_layers=5, sh_lmax=1,
    dynamic_max_cross=True, dropout=0.1, all_atoms=True,
    flexible_sidechains=True, confidence_mode=True, atom_max_neighbors=12,
)
