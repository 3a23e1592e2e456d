"""Score-model training CLI.

Usage parity with the reference trainer (train.py + utils/parsing.py): epoch
loop with EMA, validation losses (with optional per-sigma-interval buckets),
periodic full reverse-diffusion validation docking (val inference), plateau
LR scheduling on the chosen metric, and best/last checkpointing per multiple
criteria.

TPU-native: the forward-diffusion noise transform runs on device inside the
jitted train step (training.py); batches are bucketed by graph shape; data
parallelism over a jax Mesh (pass --n_devices>1 under a multi-chip runtime).
"""
import argparse
import dataclasses
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdock_pocket_tpu import runtime  # noqa: E402


def parse_train_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    # logging / run
    p.add_argument("--run_name", type=str, default="score_model")
    p.add_argument("--log_dir", type=str, default="workdir")
    p.add_argument("--restart_dir", type=str, default=None)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # data
    p.add_argument("--data_dir", type=str, default="data/PDBBIND_atomCorrected")
    p.add_argument("--protein_ligand_csv", type=str, default=None)
    p.add_argument("--protein_ligand_csv_val", type=str, default=None,
                   help="separate val-set CSV (defaults to the train CSV)")
    p.add_argument("--split_train", type=str, default="data/splits/timesplit_no_lig_overlap_train")
    p.add_argument("--split_val", type=str, default="data/splits/timesplit_no_lig_overlap_val_aligned")
    p.add_argument("--protein_file", type=str, default="protein_esmfold_aligned_tr_fix")
    p.add_argument("--match_protein_file", type=str, default="protein_processed_fix")
    p.add_argument("--cache_path", type=str, default="data/cache")
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--num_dataloader_workers", type=int, default=1)
    p.add_argument("--chain_cutoff", type=float, default=10.0)
    p.add_argument("--receptor_radius", type=float, default=15.0)
    p.add_argument("--c_alpha_max_neighbors", type=int, default=24)
    p.add_argument("--atom_max_neighbors", type=int, default=8)
    p.add_argument("--matching_popsize", type=int, default=15)
    p.add_argument("--matching_maxiter", type=int, default=15)
    p.add_argument("--num_conformers", type=int, default=1)
    p.add_argument("--max_lig_size", type=int, default=None)
    p.add_argument("--remove_hs", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--lig_chirality", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="tetrahedral chirality tags from 3D ligand coords "
                        "(reference: RDKit AssignStereochemistryFrom3D)")
    p.add_argument("--multiplicity", type=int, default=1)
    p.add_argument("--pocket_reduction", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--pocket_buffer", type=float, default=10.0)
    p.add_argument("--pocket_cutoff", type=float, default=5.0)
    p.add_argument("--pocket_reduction_mode", type=str, default="center-dist",
                   choices=["center-dist", "ligand-dist"],
                   help="residue selector for pocket reduction (reference "
                        "pdbbind.py:599-607)")
    p.add_argument("--skip_no_pocket_atoms", action="store_true",
                   help="drop complexes with no receptor atom within "
                        "pocket_cutoff of the ligand (reference "
                        "pdbbind.py:330-331)")
    p.add_argument("--compare_true_protein", action="store_true",
                   help="store holo side-chain coordinates so validation "
                        "reports sc-RMSD vs the TRUE protein when training "
                        "on computational structures (reference "
                        "parsing.py + training.py:316,390,443)")
    p.add_argument("--flexible_sidechains", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--flexdist", type=float, default=3.5)
    p.add_argument("--flexdist_distance_metric", type=str, default="prism")
    p.add_argument("--conformer_match_sidechains", action="store_true")
    p.add_argument("--conformer_match_score", type=str, default="exp")
    p.add_argument("--match_max_rmsd", type=float, default=2.0)
    p.add_argument("--use_original_conformer_fallback", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--use_original_conformer", action="store_true")
    p.add_argument("--esm_embeddings_path", type=str, default=None,
                   help="precomputed ESM2 embeddings (.pt/.npz keyed "
                        "{name}_chain_{i}); attached to receptor residues "
                        "(reference utils/esm.py:156-188, pdbbind.py:408)")
    p.add_argument("--generate_esm_embeddings", action="store_true",
                   help="compute ESM2 embeddings during preprocessing with "
                        "the on-device flax port / torch tier (requires the "
                        "HF esm2_t33_650M_UR50D checkpoint locally)")
    # diffusion
    p.add_argument("--tr_sigma_min", type=float, default=0.1)
    p.add_argument("--tr_sigma_max", type=float, default=5.0)
    p.add_argument("--rot_sigma_min", type=float, default=0.03)
    p.add_argument("--rot_sigma_max", type=float, default=1.55)
    p.add_argument("--tor_sigma_min", type=float, default=0.03)
    p.add_argument("--tor_sigma_max", type=float, default=3.14)
    p.add_argument("--sidechain_tor_sigma_min", type=float, default=0.03)
    p.add_argument("--sidechain_tor_sigma_max", type=float, default=3.14)
    p.add_argument("--no_torsion", action="store_true")
    p.add_argument("--sampling_alpha", type=float, default=1)
    p.add_argument("--sampling_beta", type=float, default=1)
    p.add_argument("--rot_alpha", type=float, default=1)
    p.add_argument("--rot_beta", type=float, default=1)
    p.add_argument("--tor_alpha", type=float, default=1)
    p.add_argument("--tor_beta", type=float, default=1)
    p.add_argument("--sc_tor_alpha", type=float, default=1)
    p.add_argument("--sc_tor_beta", type=float, default=1)
    # model
    p.add_argument("--all_atoms", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--ns", type=int, default=60)
    p.add_argument("--nv", type=int, default=10)
    p.add_argument("--num_conv_layers", type=int, default=6)
    p.add_argument("--sh_lmax", type=int, default=1)
    p.add_argument("--use_second_order_repr", action="store_true")
    p.add_argument("--sigma_embed_dim", type=int, default=64)
    p.add_argument("--distance_embed_dim", type=int, default=64)
    p.add_argument("--cross_distance_embed_dim", type=int, default=64)
    p.add_argument("--dynamic_max_cross", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--cross_max_distance", type=float, default=80)
    p.add_argument("--cross_lig_rec_max_neighbors", type=int, default=32,
                   help="top-K rec neighbors per ligand atom for the cross "
                        "conv families (0 = dense [NL,NR] pair block, the "
                        "reference's uncapped radius(); capped is ~1.5x "
                        "faster at matched quality — BASELINE.md)")
    p.add_argument("--cross_rec_lig_max_neighbors", type=int, default=16,
                   help="top-K lig neighbors per residue (0 = dense)")
    p.add_argument("--lig_max_radius", type=float, default=5)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--no_batch_norm", action="store_true")
    p.add_argument("--embedding_type", type=str, default="sinusoidal")
    p.add_argument("--embedding_scale", type=float, default=10000)
    p.add_argument("--scale_by_sigma", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--smooth_edges", action="store_true")
    p.add_argument("--odd_parity", action="store_true")
    p.add_argument("--separate_noise_schedule", action="store_true")
    p.add_argument("--asyncronous_noise_schedule", action="store_true",
                   help="common base t warped per manifold through inverse "
                        "Beta CDFs (reference parsing.py:100)")
    p.add_argument("--no_aminoacid_identities", action="store_true")
    p.add_argument("--use_old_atom_encoder", action="store_true",
                   help="legacy encoder wiring (reference OldAtomEncoder, "
                        "models/score_model.py:17-52)")
    # training
    p.add_argument("--n_epochs", type=int, default=750)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--w_decay", type=float, default=0.0)
    p.add_argument("--adamw", action="store_true")
    p.add_argument("--scheduler", type=str, default="plateau")
    p.add_argument("--scheduler_patience", type=int, default=30)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--ema_rate", type=float, default=0.999)
    p.add_argument("--tr_weight", type=float, default=0.33)
    p.add_argument("--rot_weight", type=float, default=0.33)
    p.add_argument("--tor_weight", type=float, default=0.33)
    p.add_argument("--sc_tor_weight", type=float, default=0.33)
    p.add_argument("--test_sigma_intervals", action="store_true")
    p.add_argument("--val_inference_freq", type=int, default=5)
    p.add_argument("--train_inference_freq", type=int, default=None,
                   help="epochs between docking-metric evaluations on the "
                        "TRAIN set (reference parsing.py:19)")
    p.add_argument("--restart_lr", type=float, default=None,
                   help="overwrite the restored optimizer LR when restarting "
                        "from --restart_dir (reference train.py:178)")
    p.add_argument("--checkpoint_freq", type=int, default=1,
                   help="epochs between last_model (restart) checkpoints")
    p.add_argument("--num_inference_complexes", type=int, default=100)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--inference_samples", type=int, default=4)
    p.add_argument("--main_metric", type=str, default="valinf_rmsds_lt2")
    p.add_argument("--main_metric_goal", type=str, default="max")
    p.add_argument("--bn_stats_refresh", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="re-estimate BatchNorm running statistics under the "
                        "evaluated (EMA) weights before each validation pass "
                        "and ship them with the EMA checkpoints; removes the "
                        "train/eval stats lag that intermittently exploded "
                        "val losses on the corpus run "
                        "(training.make_stats_step)")
    p.add_argument("--n_devices", type=int, default=1)
    # featurization is CPU-bound; this lets it run (DDP_TPU_PLATFORM=cpu)
    # while the chip serves another job — the config-hashed cache is then
    # warm for the real training run
    p.add_argument("--prepare_dataset_only", action="store_true")
    args = p.parse_args(argv)

    if args.flexible_sidechains and not args.all_atoms:
        raise ValueError("--flexible_sidechains requires --all_atoms")
    if args.config:
        import yaml

        with open(args.config) as fh:
            overlay = yaml.safe_load(fh)
        for k, v in (overlay or {}).items():
            if hasattr(args, k):
                setattr(args, k, v)
    return args


def build_configs(args):
    from diffdock_pocket_tpu.data.featurize import DataConfig
    from diffdock_pocket_tpu.diffusion import SigmaConfig
    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.training import LossWeights, NoiseConfig

    sigma = SigmaConfig(
        tr_sigma_min=args.tr_sigma_min, tr_sigma_max=args.tr_sigma_max,
        rot_sigma_min=args.rot_sigma_min, rot_sigma_max=args.rot_sigma_max,
        tor_sigma_min=args.tor_sigma_min, tor_sigma_max=args.tor_sigma_max,
        sc_tor_sigma_min=args.sidechain_tor_sigma_min,
        sc_tor_sigma_max=args.sidechain_tor_sigma_max,
    )
    model_cfg = ModelConfig(
        ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
        sh_lmax=args.sh_lmax, use_second_order_repr=args.use_second_order_repr,
        sigma_embed_dim=args.sigma_embed_dim,
        distance_embed_dim=args.distance_embed_dim,
        cross_distance_embed_dim=args.cross_distance_embed_dim,
        batch_norm=not args.no_batch_norm, dropout=args.dropout,
        embedding_type=args.embedding_type, embedding_scale=args.embedding_scale,
        lig_max_radius=args.lig_max_radius,
        rec_max_radius=args.receptor_radius,
        cross_max_distance=args.cross_max_distance,
        dynamic_max_cross=args.dynamic_max_cross,
        cross_lig_rec_max_neighbors=args.cross_lig_rec_max_neighbors,
        cross_rec_lig_max_neighbors=args.cross_rec_lig_max_neighbors,
        smooth_edges=args.smooth_edges, odd_parity=args.odd_parity,
        all_atoms=args.all_atoms, no_torsion=args.no_torsion,
        flexible_sidechains=args.flexible_sidechains,
        scale_by_sigma=args.scale_by_sigma,
        separate_noise_schedule=args.separate_noise_schedule,
        asyncronous_noise_schedule=args.asyncronous_noise_schedule,
        no_aminoacid_identities=args.no_aminoacid_identities,
        use_old_atom_encoder=args.use_old_atom_encoder,
        atom_max_neighbors=args.atom_max_neighbors,
        esm_embeddings_dim=0,  # set in main() from the resolved embeddings
        sigma=sigma,
    )
    data_cfg = DataConfig(
        chain_cutoff=args.chain_cutoff, receptor_radius=args.receptor_radius,
        c_alpha_max_neighbors=args.c_alpha_max_neighbors,
        remove_hs=args.remove_hs, all_atoms=args.all_atoms,
        pocket_reduction=args.pocket_reduction, pocket_buffer=args.pocket_buffer,
        pocket_cutoff=args.pocket_cutoff,
        pocket_reduction_mode=args.pocket_reduction_mode,
        skip_no_pocket_atoms=args.skip_no_pocket_atoms,
        compare_true_protein=args.compare_true_protein,
        flexible_sidechains=args.flexible_sidechains, flexdist=args.flexdist,
        flexdist_distance_metric=args.flexdist_distance_metric,
        keep_local_structures=False, matching=True,
        popsize=args.matching_popsize, maxiter=args.matching_maxiter,
        num_conformers=args.num_conformers,
        conformer_match_sidechains=args.conformer_match_sidechains,
        conformer_match_score=args.conformer_match_score,
        match_max_rmsd=args.match_max_rmsd,
        use_original_conformer_fallback=args.use_original_conformer_fallback,
        use_original_conformer=args.use_original_conformer,
        max_lig_size=args.max_lig_size,
        lig_chirality=args.lig_chirality,
    )
    noise_cfg = NoiseConfig(
        alpha=args.sampling_alpha, beta=args.sampling_beta,
        rot_alpha=args.rot_alpha, rot_beta=args.rot_beta,
        tor_alpha=args.tor_alpha, tor_beta=args.tor_beta,
        sc_tor_alpha=args.sc_tor_alpha, sc_tor_beta=args.sc_tor_beta,
        separate_noise_schedule=args.separate_noise_schedule,
        asyncronous_noise_schedule=args.asyncronous_noise_schedule,
        no_torsion=args.no_torsion,
        flexible_sidechains=args.flexible_sidechains,
    )
    weights = LossWeights(
        tr=args.tr_weight, rot=args.rot_weight,
        tor=args.tor_weight, sc_tor=args.sc_tor_weight,
    )
    return model_cfg, data_cfg, noise_cfg, weights


def main():
    args = parse_train_args()
    runtime.setup()
    logging.basicConfig(level=logging.INFO)

    from diffdock_pocket_tpu.data import dataset as ds
    from diffdock_pocket_tpu.trainer import Trainer

    model_cfg, data_cfg, noise_cfg, weights = build_configs(args)

    if args.protein_ligand_csv:
        df_train = ds.load_protein_ligand_df(args.protein_ligand_csv)
        df_val = (
            ds.load_protein_ligand_df(args.protein_ligand_csv_val)
            if args.protein_ligand_csv_val else df_train
        )
    else:
        df_train = ds.df_from_split(
            args.split_train, args.data_dir, args.protein_file,
            args.match_protein_file, args.conformer_match_sidechains,
        )
        df_val = ds.df_from_split(
            args.split_val, args.data_dir, args.protein_file,
            args.match_protein_file, args.conformer_match_sidechains,
        )
    if args.limit_complexes:
        df_train = df_train.iloc[: args.limit_complexes]
        df_val = df_val.iloc[: args.limit_complexes]

    esm_embeddings = resolve_esm_embeddings(args, [df_train, df_val])
    if esm_embeddings:
        dim = int(next(iter(esm_embeddings.values()))[0].shape[-1])
        model_cfg = dataclasses.replace(model_cfg, esm_embeddings_dim=dim)
        logging.info("attached %d-d ESM embeddings for %d complexes",
                     dim, len(esm_embeddings))

    train_set = ds.DockingDataset(
        df_train, data_cfg, cache_dir=args.cache_path,
        esm_embeddings=esm_embeddings,
        num_workers=args.num_dataloader_workers,
    )
    val_set = ds.DockingDataset(df_val, data_cfg, cache_dir=args.cache_path,
                                esm_embeddings=esm_embeddings)

    if args.prepare_dataset_only:
        logging.info("prepare_dataset_only: %d train / %d val complexes "
                     "featurized into %s", len(train_set), len(val_set),
                     args.cache_path)
        return

    trainer = Trainer(args, model_cfg, noise_cfg, weights, train_set, val_set)
    trainer.fit()


def resolve_esm_embeddings(args, dfs):
    """Resolve receptor LM embeddings for every complex in ``dfs``: from
    --esm_embeddings_path (precomputed .pt/.npz, reference train path) or by
    running the ESM2 tier during preprocessing (--generate_esm_embeddings,
    reference pdbbind.py:408).  Fails loudly when embeddings were requested
    but cannot be resolved for all complexes."""
    if not (args.esm_embeddings_path or args.generate_esm_embeddings):
        return None
    from diffdock_pocket_tpu.data import esm as esmmod

    names, paths = [], []
    seen = set()
    for df in dfs:
        for _, row in df.iterrows():
            n = str(row["complex_name"])
            if n not in seen:
                seen.add(n)
                names.append(n)
                paths.append(str(row["experimental_protein"]))
    emb = esmmod.embeddings_for_complexes(
        names, paths, precomputed_path=args.esm_embeddings_path
    )
    if emb is None:
        raise SystemExit(
            "ESM embeddings were requested but could not be resolved: pass "
            "--esm_embeddings_path or make the esm2_t33_650M_UR50D weights "
            "available locally for --generate_esm_embeddings."
        )
    missing = [n for n in names if n not in emb]
    if missing:
        raise SystemExit(
            f"--esm_embeddings_path is missing embeddings for "
            f"{len(missing)} complexes (e.g. {missing[:5]})"
        )
    return emb


if __name__ == "__main__":
    main()
