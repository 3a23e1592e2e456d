"""Confidence (filtering) model training CLI.

Usage parity with the reference (python -m filtering.filtering_train,
filtering/filtering_train.py:32-523): load a frozen score model from
--original_model_dir, generate `samples_per_complex` poses per training
complex (cached per --cache_creation_id; multiple rounds combined with
--cache_ids_to_combine), label them by RMSD cutoffs, and train the
confidence model (BCE / binned CE / MSE).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdock_pocket_tpu import runtime  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--run_name", type=str, default="confidence_model")
    p.add_argument("--log_dir", type=str, default="workdir")
    p.add_argument("--original_model_dir", type=str, required=True,
                   help="run dir of the frozen score model used for generation")
    p.add_argument("--ckpt", type=str, default="best_ema_inference_epoch_model")
    p.add_argument("--restart_dir", type=str, default=None)
    # data
    p.add_argument("--data_dir", type=str, default="data/PDBBIND_atomCorrected")
    p.add_argument("--protein_ligand_csv", type=str, default=None)
    p.add_argument("--protein_ligand_csv_val", type=str, default=None,
                   help="separate val-set CSV (defaults to the train CSV)")
    p.add_argument("--split_train", type=str, default="data/splits/timesplit_no_lig_overlap_train")
    p.add_argument("--split_val", type=str, default="data/splits/timesplit_no_lig_overlap_val_aligned")
    p.add_argument("--protein_file", type=str, default="protein_esmfold_aligned_tr_fix")
    p.add_argument("--cache_path", type=str, default=".cache/data_filtering")
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--esm_embeddings_path", type=str, default=None)
    p.add_argument("--pocket_reduction", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--pocket_buffer", type=float, default=10.0)
    p.add_argument("--remove_hs", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--c_alpha_max_neighbors", type=int, default=24)
    p.add_argument("--receptor_radius", type=float, default=15.0)
    p.add_argument("--all_atoms", action=argparse.BooleanOptionalAction, default=True)
    # generation
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--samples_per_complex", type=int, default=7)
    p.add_argument("--cache_creation_id", type=int, default=None)
    p.add_argument("--cache_ids_to_combine", type=int, nargs="+", default=None)
    # labels
    p.add_argument("--rmsd_classification_cutoff", type=float, nargs="+", default=[2.0])
    p.add_argument("--sc_rmsd_classification_cutoff", type=float, default=1.0)
    p.add_argument("--rmsd_prediction", action="store_true")
    p.add_argument("--balance", action="store_true")
    p.add_argument("--trajectory_sampling", action="store_true",
                   help="train on intermediate reverse-diffusion poses "
                        "(labels = final-pose success, t stamped per step); "
                        "pose caches are generated with trajectories")
    p.add_argument("--fixed_step", type=int, default=None,
                   help="with --trajectory_sampling: always use this step "
                        "(counted from the end) instead of a random one")
    p.add_argument("--parallel", type=int, default=1,
                   help="score `parallel` sampled poses per complex jointly; "
                        "the affinity head aggregates over the group "
                        "(reference filtering/dataset.py:348-366)")
    p.add_argument("--parallel_aggregators", type=str,
                   default="mean max min std")
    p.add_argument("--affinity_prediction", action="store_true",
                   help="jointly predict -logKd/Ki from the PDBBind index")
    p.add_argument("--affinity_index", type=str,
                   default="data/INDEX_general_PL_data.2020")
    p.add_argument("--affinity_loss_weight", type=float, default=1.0)
    p.add_argument("--confidence_loss_weight", type=float, default=1.0)
    # model
    p.add_argument("--ns", type=int, default=24)
    p.add_argument("--nv", type=int, default=6)
    p.add_argument("--num_conv_layers", type=int, default=5)
    p.add_argument("--sh_lmax", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--dynamic_max_cross", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--scale_by_sigma", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--confidence_no_batchnorm", action="store_true")
    p.add_argument("--confidence_dropout", type=float, default=0.0)
    p.add_argument("--transfer_weights", action="store_true")
    # training
    p.add_argument("--n_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--scheduler_patience", type=int, default=50)
    p.add_argument("--main_metric", type=str, default="loss")
    p.add_argument("--main_metric_goal", type=str, default="min")
    p.add_argument("--best_model_save_frequency", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    # eval-only mode (reference filtering_train.py:160-162, 504, 523)
    p.add_argument("--no_train", action="store_true",
                   help="skip training (combine with --test for eval-only)")
    p.add_argument("--test", action="store_true",
                   help="after (or instead of) training, evaluate on the val "
                        "set: per-trajectory-step sweep under "
                        "--trajectory_sampling, saved to val_eval*.npz")
    p.add_argument("--multiplicity_test", type=int, default=1,
                   help="repeat the test pass this many times with fresh "
                        "pose draws")
    p.add_argument("--prepare_dataset_only", action="store_true",
                   help="featurize the base datasets into the cache and "
                        "exit (CPU-bound; lets the cache warm while the "
                        "chip serves another job)")
    p.add_argument("--val_multiplicity", type=int, default=1,
                   help="repeat the per-epoch val pass this many times with "
                        "fresh pose draws (stabilises val_roc_auc / "
                        "main-metric checkpoint selection on small val sets)")
    return p


def main():
    args = get_parser().parse_args()
    if args.config:
        import yaml

        with open(args.config) as fh:
            overlay = yaml.safe_load(fh)
        for k, v in (overlay or {}).items():
            if hasattr(args, k):
                setattr(args, k, v)
    runtime.setup()
    logging.basicConfig(level=logging.INFO)

    import dataclasses

    import jax

    from diffdock_pocket_tpu import sampling
    from diffdock_pocket_tpu.confidence.dataset import (
        FilteringDataset, combine_pose_caches, generate_poses,
    )
    from diffdock_pocket_tpu.confidence.train import ConfidenceTrainer
    from diffdock_pocket_tpu.data import dataset as ds
    from diffdock_pocket_tpu.data.featurize import DataConfig
    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.pipeline import DockingPipeline
    from diffdock_pocket_tpu.utils import checkpoint as ckpt

    # frozen score model
    score_cfg = ckpt.load_yaml_config(args.original_model_dir)
    score_vars = ckpt.load_checkpoint(os.path.join(args.original_model_dir, args.ckpt))

    # featurization options that change feature VALUES (not graph shape)
    # must match what the frozen score model was trained with
    score_dc = ckpt.load_data_config(args.original_model_dir)
    data_cfg = DataConfig(
        receptor_radius=args.receptor_radius,
        c_alpha_max_neighbors=args.c_alpha_max_neighbors,
        remove_hs=args.remove_hs, all_atoms=args.all_atoms,
        pocket_reduction=args.pocket_reduction, pocket_buffer=args.pocket_buffer,
        flexible_sidechains=score_cfg.flexible_sidechains,
        keep_local_structures=False,
        lig_chirality=score_dc.lig_chirality if score_dc else False,
        hybridization_version=(score_dc.hybridization_version
                               if score_dc else "v1"),
    )

    if args.protein_ligand_csv:
        df_train = ds.load_protein_ligand_df(args.protein_ligand_csv)
        df_val = (
            ds.load_protein_ligand_df(args.protein_ligand_csv_val)
            if args.protein_ligand_csv_val else df_train
        )
    else:
        df_train = ds.df_from_split(args.split_train, args.data_dir, args.protein_file)
        df_val = ds.df_from_split(args.split_val, args.data_dir, args.protein_file)
    if args.limit_complexes:
        df_train = df_train.iloc[: args.limit_complexes]
        df_val = df_val.iloc[: args.limit_complexes]

    if args.parallel > 1 and score_cfg.flexible_sidechains:
        raise SystemExit("--parallel > 1 is not supported with flexible "
                         "sidechains (matches the reference)")

    esm_embeddings = None
    if args.esm_embeddings_path or score_cfg.esm_embeddings_dim:
        from diffdock_pocket_tpu.data import esm as esmmod

        names, paths, seen = [], [], set()
        for df in (df_train, df_val):
            for _, row in df.iterrows():
                n = str(row["complex_name"])
                if n not in seen:
                    seen.add(n)
                    names.append(n)
                    paths.append(str(row["experimental_protein"]))
        esm_embeddings = esmmod.embeddings_for_complexes(
            names, paths, precomputed_path=args.esm_embeddings_path
        )
        if score_cfg.esm_embeddings_dim and (
            esm_embeddings is None or any(n not in esm_embeddings for n in names)
        ):
            raise SystemExit(
                f"the score model was trained with "
                f"{score_cfg.esm_embeddings_dim}-d ESM embeddings; pass a "
                "matching --esm_embeddings_path"
            )

    train_set = ds.DockingDataset(df_train, data_cfg, cache_dir=args.cache_path,
                                  esm_embeddings=esm_embeddings)
    val_set = ds.DockingDataset(df_val, data_cfg, cache_dir=args.cache_path,
                                esm_embeddings=esm_embeddings)

    if args.prepare_dataset_only:
        logging.info("prepare_dataset_only: %d train / %d val complexes "
                     "featurized into %s", len(train_set), len(val_set),
                     args.cache_path)
        return

    pipe = DockingPipeline(
        model_cfg=score_cfg,
        variables=score_vars,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=args.inference_steps,
            flexible_sidechains=score_cfg.flexible_sidechains,
            return_trajectory=args.trajectory_sampling,
        ),
        samples_per_complex=args.samples_per_complex,
        batch_size=args.samples_per_complex,
    )

    # --- pose generation / cache combination ------------------------------
    pose_dir = os.path.join(args.cache_path, "poses")
    if args.cache_creation_id is not None:
        for split, dset in (("train", train_set), ("val", val_set)):
            generate_poses(
                pipe, dset, os.path.join(pose_dir, split),
                cache_creation_id=args.cache_creation_id, seed=args.seed,
                limit=args.limit_complexes,
            )
    ids = args.cache_ids_to_combine or [args.cache_creation_id or 1]
    poses = {}
    for split in ("train", "val"):
        paths = [
            os.path.join(pose_dir, split, f"poses_id{i}.pkl")
            for i in ids
            if os.path.exists(os.path.join(pose_dir, split, f"poses_id{i}.pkl"))
        ]
        if not paths:
            raise SystemExit(
                f"no pose caches for split {split}; run with --cache_creation_id first"
            )
        poses[split] = combine_pose_caches(paths)

    cutoff = (
        args.rmsd_classification_cutoff[0]
        if len(args.rmsd_classification_cutoff) == 1
        else list(args.rmsd_classification_cutoff)
    )
    affinities = None
    affinity_norm = (0.0, 1.0)
    if args.affinity_prediction:
        from diffdock_pocket_tpu.confidence.dataset import load_affinity_index

        affinities = load_affinity_index(args.affinity_index)
        # train-split label statistics -> the head trains on z-scores
        # (ModelConfig.affinity_norm; persisted in model_parameters.yml so
        # inference un-standardizes its emitted affinities)
        import numpy as _np

        vals = _np.asarray([
            affinities[str(n)] for n in train_set.df["complex_name"]
            if str(n) in affinities
        ])
        if len(vals):
            affinity_norm = (float(vals.mean()), float(vals.std() or 1.0))
    train_fd = FilteringDataset(
        train_set, poses["train"], cutoff, args.sc_rmsd_classification_cutoff,
        balance=args.balance, affinities=affinities,
        trajectory_sampling=args.trajectory_sampling,
        parallel=args.parallel,
    )
    val_fd = FilteringDataset(
        val_set, poses["val"], cutoff, args.sc_rmsd_classification_cutoff,
        affinities=affinities,
        trajectory_sampling=args.trajectory_sampling,
        fixed_step=args.fixed_step,
        parallel=args.parallel,
    )

    n_outputs = 1 if not isinstance(cutoff, list) else len(cutoff) + 1
    conf_cfg = ModelConfig(
        ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
        sh_lmax=args.sh_lmax, dropout=args.dropout,
        dynamic_max_cross=args.dynamic_max_cross,
        all_atoms=args.all_atoms,
        flexible_sidechains=score_cfg.flexible_sidechains,
        confidence_mode=True, num_confidence_outputs=n_outputs,
        affinity_prediction=args.affinity_prediction,
        affinity_norm=affinity_norm,
        confidence_dropout=args.confidence_dropout,
        confidence_no_batchnorm=args.confidence_no_batchnorm,
        parallel=args.parallel,
        parallel_aggregators=args.parallel_aggregators,
        atom_max_neighbors=score_cfg.atom_max_neighbors,
        esm_embeddings_dim=score_cfg.esm_embeddings_dim,
        sigma=score_cfg.sigma,
    )
    loss_type = (
        "mse" if args.rmsd_prediction
        else ("crossentropy" if isinstance(cutoff, list) else "bce")
    )
    run_dir = os.path.join(args.log_dir, args.run_name)
    trainer = ConfidenceTrainer(
        conf_cfg, train_fd, val_fd,
        run_dir=run_dir,
        lr=args.lr, batch_size=args.batch_size, loss_type=loss_type,
        main_metric=args.main_metric, main_metric_goal=args.main_metric_goal,
        transfer_params=score_vars["params"] if args.transfer_weights else None,
        seed=args.seed,
        confidence_loss_weight=args.confidence_loss_weight,
        affinity_loss_weight=args.affinity_loss_weight,
        data_cfg=data_cfg,
        parallel=args.parallel,
        val_multiplicity=args.val_multiplicity,
    )
    if not args.no_train:
        params, batch_stats = trainer.fit(args.n_epochs)
    else:
        # eval-only: load the trained confidence model from this run dir
        # (reference --no_train + --test, filtering_train.py:504,523)
        name = "best_model" if os.path.isdir(os.path.join(run_dir, "best_model")) \
            else "last_model"
        vars_ = ckpt.load_checkpoint(os.path.join(run_dir, name))
        params, batch_stats = vars_["params"], vars_.get("batch_stats", {})
        logging.info("--no_train: loaded %s from %s", name, run_dir)
    if args.test:
        metrics = trainer.test(
            val_fd, params, batch_stats, out_dir=run_dir,
            multiplicity=args.multiplicity_test,
        )
        logging.info("test: %s", metrics)


if __name__ == "__main__":
    main()
