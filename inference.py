"""Inference CLI: end-to-end pocket-level docking with flexible side chains.

Usage parity with the reference inference entry point (inference.py:49-508):

    python inference.py --protein_path example/3dpf_protein.pdb \
        --ligand example/3dpf_ligand.sdf --samples_per_complex 4 \
        --batch_size 8 --keep_local_structures --save_visualisation

or batched over a CSV (columns: complex_name, experimental_protein, ligand,
optional pocket_center_x/y/z, flexible_sidechains):

    python inference.py --protein_ligand_csv data/protein_ligand_example.csv

Outputs per complex under --out_dir: rank{k}_confidence{c}.sdf ligand poses,
rank{k}_protein.pdb receptors with predicted side chains, and (with
--save_visualisation) reverse-diffusion trajectory PDBs.

Differences vs the reference (documented):
- model weights come from a local run dir (model_parameters.yml + orbax
  checkpoint, utils/checkpoint.py) or --random_weights for smoke tests; the
  GitHub release auto-download is replaced by --score_model_dir /
  --filtering_model_dir (this environment has no egress).
- --relax runs OpenMM energy minimization when OpenMM (+ openff/pdbfixer)
  is importable (reference utils/posebusters_em.py), else the TPU-native
  clash_relax tier (soft-sphere rigid+torsional descent, relax.py); both
  write rank1_relaxed.sdf.
"""
import argparse
import dataclasses
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdock_pocket_tpu import runtime  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None, help="YAML overlay of these flags")
    # inputs
    p.add_argument("--protein_path", type=str, default=None)
    p.add_argument("--ligand", type=str, default=None, help="ligand file (sdf/mol2/pdb)")
    p.add_argument("--protein_ligand_csv", type=str, default=None)
    p.add_argument("--complex_name", type=str, default="complex")
    p.add_argument("--flexible_sidechains", type=str, default=None,
                   help="predefined flexible residues, e.g. A:130-A:142")
    p.add_argument("--pocket_center_x", type=float, default=None)
    p.add_argument("--pocket_center_y", type=float, default=None)
    p.add_argument("--pocket_center_z", type=float, default=None)
    p.add_argument("--keep_local_structures", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="keep the ligand input's 3D local structure instead "
                        "of regenerating conformers (reference inference.py:86)")
    # models
    p.add_argument("--score_model_dir", type=str, default=None)
    p.add_argument("--score_ckpt", type=str, default="best_ema_inference_epoch_model")
    p.add_argument("--filtering_model_dir", type=str, default=None)
    p.add_argument("--filtering_ckpt", type=str, default="best_model")
    p.add_argument("--random_weights", action="store_true",
                   help="random-init models (smoke/benchmark use)")
    p.add_argument("--esm_embeddings_path", type=str, default=None,
                   help="precomputed ESM2 embeddings (.pt/.npz keyed "
                        "{name}_chain_{i}); required when the score model "
                        "was trained with LM embeddings unless the ESM2 "
                        "weights are locally available for on-the-fly "
                        "computation (reference pdbbind.py:408)")
    # sampling
    p.add_argument("--samples_per_complex", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--multi_complex_batching", action="store_true",
                   help="batch samples across complexes sharing a shape "
                        "bucket (pipeline.dock_many); also shards the batch "
                        "over all visible devices. Disables trajectories.")
    p.add_argument("--tail_bucket_rungs", type=int, default=0,
                   help="with --multi_complex_batching: allow this many "
                        "batch-halving rungs for tail chunks (each rung "
                        "used costs one extra compile; saves wasted padded "
                        "rows on large corpora)")
    p.add_argument("--inference_steps", type=int, default=30)
    p.add_argument("--actual_steps", type=int, default=None)
    p.add_argument("--skip_intra_steps", type=int, default=0,
                   help="run a reduced score model (no receptor/atom intra "
                        "conv families) for the FIRST this-many denoising "
                        "steps — receptor internals barely change while the "
                        "ligand is far away at high sigma (perf knob; "
                        "quality-checked on the corpus journey)")
    p.add_argument("--bf16_edge_attr", action="store_true",
                   help="run the score model's XLA-side edge raw features "
                        "and edge-MLP first layer in bf16 (perf knob; "
                        "fp32-consistency unit-tested, quality-checked on "
                        "the corpus journey)")
    p.add_argument("--no_final_step_noise", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--ode", action="store_true")
    p.add_argument("--no_random", action="store_true")
    p.add_argument("--sigma_schedule", type=str, default="expbeta")
    p.add_argument("--inf_sched_alpha", type=float, default=1)
    p.add_argument("--inf_sched_beta", type=float, default=1)
    # low-temperature sampling (reference defaults, inference.py:89-101)
    p.add_argument("--temp_sampling_tr", type=float, default=1.170)
    p.add_argument("--temp_psi_tr", type=float, default=1.727)
    p.add_argument("--temp_sampling_rot", type=float, default=2.06)
    p.add_argument("--temp_psi_rot", type=float, default=0.9)
    p.add_argument("--temp_sampling_tor", type=float, default=7.04)
    p.add_argument("--temp_psi_tor", type=float, default=0.31)
    p.add_argument("--temp_sampling_sc_tor", type=float, default=1.72)
    p.add_argument("--temp_psi_sc_tor", type=float, default=0.579)
    p.add_argument("--temp_sigma_data", type=float, default=0.5)
    # outputs
    p.add_argument("--cache_path", type=str, default=None,
                   help="featurization cache dir (config-hashed, same "
                        "contract as train.py --cache_path); default: no "
                        "disk cache")
    p.add_argument("--out_dir", type=str, default="results/user_inference")
    p.add_argument("--save_visualisation", action="store_true")
    p.add_argument("--relax", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p


def load_model_and_cfg(args, run_dir, ckpt_name, example_graph, confidence=False):
    import jax

    from diffdock_pocket_tpu import pipeline
    from diffdock_pocket_tpu.models.config import (
        BIG_SCORE_CONFIG, CONFIDENCE_CONFIG, ModelConfig,
    )
    from diffdock_pocket_tpu.utils import checkpoint as ckpt

    if run_dir is not None:
        cfg = ckpt.load_yaml_config(run_dir)
        variables = ckpt.load_checkpoint(os.path.join(run_dir, ckpt_name))
        return cfg, variables
    if not args.random_weights:
        raise SystemExit(
            "No model dir given; pass --score_model_dir (a trained run dir) "
            "or --random_weights for a smoke run."
        )
    cfg = CONFIDENCE_CONFIG if confidence else BIG_SCORE_CONFIG
    variables = pipeline.init_random_variables(cfg, example_graph)
    return cfg, variables


def inference_data_config(train_dc, args, DataConfig):
    """Reconstruct the featurization config from the trained model's stored
    data_config, with the inference-time overrides the reference applies
    (inference.py:365-393: chain_cutoff=inf, matching off, side-chain
    conformer matching off, fallback on)."""
    import dataclasses

    # run dirs predating the stored data_config must featurize with the
    # trained-embedding settings of their era, not fresh-run defaults
    # (same contract as utils/checkpoint.py::load_data_config's setdefaults)
    base = train_dc if train_dc is not None else DataConfig(
        lig_chirality=False, hybridization_version="v1"
    )
    return dataclasses.replace(
        base,
        chain_cutoff=float("inf"),
        matching=False,
        conformer_match_sidechains=False,
        use_original_conformer_fallback=True,
        use_original_conformer=False,
        keep_local_structures=args.keep_local_structures,
        num_conformers=1,
        match_max_rmsd=None,
        max_lig_size=None,
        compare_true_protein=False,  # training-only validation aid
    )


def resolve_esm(args, df, cfg, what: str):
    """Embeddings for every complex when the model was trained with them;
    fails loudly on dim mismatch / unresolvable embeddings."""
    if cfg is None or cfg.esm_embeddings_dim == 0:
        return None
    from diffdock_pocket_tpu.data import esm as esmmod

    names = [str(n) for n in df["complex_name"]]
    paths = [str(p) for p in df["experimental_protein"]]
    emb = esmmod.embeddings_for_complexes(
        names, paths, precomputed_path=args.esm_embeddings_path
    )
    if emb is None or any(n not in emb for n in names):
        missing = names if emb is None else [n for n in names if n not in emb]
        raise SystemExit(
            f"the {what} model was trained with {cfg.esm_embeddings_dim}-d ESM "
            f"embeddings but none could be resolved for {missing[:5]}...; pass "
            "--esm_embeddings_path or provide the ESM2 weights locally"
        )
    dim = int(next(iter(emb.values()))[0].shape[-1])
    if dim != cfg.esm_embeddings_dim:
        raise SystemExit(
            f"ESM embedding dim mismatch: {what} model expects "
            f"{cfg.esm_embeddings_dim}, embeddings provide {dim}"
        )
    return emb


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

    import jax
    import numpy as np

    from diffdock_pocket_tpu import graph as graphlib
    from diffdock_pocket_tpu import pipeline, sampling, visualise
    from diffdock_pocket_tpu.data import dataset as ds
    from diffdock_pocket_tpu.data.featurize import DataConfig
    import pandas as pd

    # --- input table -------------------------------------------------------
    if args.protein_ligand_csv:
        df = ds.load_protein_ligand_df(args.protein_ligand_csv)
    else:
        assert args.protein_path and args.ligand, "need --protein_path and --ligand"
        row = {
            "complex_name": args.complex_name,
            "experimental_protein": args.protein_path,
            "ligand_path": args.ligand,
            "flexible_sidechains": args.flexible_sidechains,
        }
        if args.pocket_center_x is not None:
            for a in "xyz":
                row[f"pocket_center_{a}"] = getattr(args, f"pocket_center_{a}")
        df = ds.load_protein_ligand_df(df=pd.DataFrame([row]))

    from diffdock_pocket_tpu.utils import checkpoint as ckptlib

    # --- model configs first: they define the featurization ----------------
    # (reference inference.py:332-336 reads both model_parameters.yml before
    # building the dataset so graph params exactly match training)
    score_train_dc = conf_train_dc = None
    score_cfg_loaded = conf_cfg_loaded = None
    if args.score_model_dir:
        score_cfg_loaded = ckptlib.load_yaml_config(args.score_model_dir)
        score_train_dc = ckptlib.load_data_config(args.score_model_dir)
    if args.filtering_model_dir:
        conf_cfg_loaded = ckptlib.load_yaml_config(args.filtering_model_dir)
        conf_train_dc = ckptlib.load_data_config(args.filtering_model_dir)

    data_cfg = inference_data_config(score_train_dc, args, DataConfig)
    esm_embeddings = resolve_esm(args, df, score_cfg_loaded, "score")
    dataset = ds.DockingDataset(df, data_cfg, cache_dir=args.cache_path,
                                esm_embeddings=esm_embeddings)

    # separate featurization for the filtering model when its graph params
    # differ from the score model's (reference inference.py:396-429)
    filtering_dataset = None
    if conf_cfg_loaded is not None:
        conf_data_cfg = inference_data_config(conf_train_dc, args, DataConfig)
        conf_esm = resolve_esm(args, df, conf_cfg_loaded, "filtering")
        esm_dims_differ = (
            score_cfg_loaded is None
            or conf_cfg_loaded.esm_embeddings_dim
            != score_cfg_loaded.esm_embeddings_dim
        )
        if conf_data_cfg != data_cfg or esm_dims_differ:
            logging.info(
                "filtering model uses different graphs than the score model; "
                "featurizing a second dataset"
            )
            filtering_dataset = ds.DockingDataset(
                df, conf_data_cfg, cache_dir=args.cache_path,
                esm_embeddings=conf_esm
            )

    # --- models ------------------------------------------------------------
    first = dataset.get(0)
    if first is None:
        raise SystemExit("could not featurize the first complex")
    g_ex = graphlib.replicate(graphlib.from_raw(first.raw), min(args.batch_size, args.samples_per_complex))
    score_cfg, score_vars = load_model_and_cfg(
        args, args.score_model_dir, args.score_ckpt, g_ex
    )
    if args.bf16_edge_attr:
        score_cfg = dataclasses.replace(score_cfg, bf16_edge_attr=True)
    if score_cfg.esm_embeddings_dim != g_ex.rec_esm.shape[-1]:
        raise SystemExit(
            f"score model expects {score_cfg.esm_embeddings_dim}-d ESM "
            f"features but the graph carries {g_ex.rec_esm.shape[-1]}-d"
        )
    conf_cfg = conf_vars = None
    if args.filtering_model_dir or args.random_weights:
        conf_cfg, conf_vars = load_model_and_cfg(
            args, args.filtering_model_dir, args.filtering_ckpt, g_ex, confidence=True
        )

    steps = args.actual_steps or args.inference_steps
    pipe = pipeline.DockingPipeline(
        schedule_steps=args.inference_steps,
        model_cfg=score_cfg,
        variables=score_vars,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=steps,
            no_random=args.no_random,
            ode=args.ode,
            no_final_step_noise=args.no_final_step_noise,
            no_torsion=score_cfg.no_torsion,
            flexible_sidechains=score_cfg.flexible_sidechains,
            temp_sampling=(args.temp_sampling_tr, args.temp_sampling_rot,
                           args.temp_sampling_tor, args.temp_sampling_sc_tor),
            temp_psi=(args.temp_psi_tr, args.temp_psi_rot,
                      args.temp_psi_tor, args.temp_psi_sc_tor),
            temp_sigma_data=args.temp_sigma_data,
            return_trajectory=args.save_visualisation,
            skip_intra_steps=args.skip_intra_steps,
        ),
        confidence_cfg=conf_cfg,
        confidence_variables=conf_vars,
        samples_per_complex=args.samples_per_complex,
        batch_size=args.batch_size,
        sigma_schedule=args.sigma_schedule,
        inf_sched_alpha=args.inf_sched_alpha,
        inf_sched_beta=args.inf_sched_beta,
    )

    key = jax.random.PRNGKey(args.seed)
    failures = 0

    if args.multi_complex_batching:
        if args.save_visualisation:
            raise SystemExit("--multi_complex_batching does not collect "
                             "trajectories; drop --save_visualisation")
        datas, fdatas = [], []
        for idx in range(len(dataset)):
            data = dataset.get(idx) if idx else first
            fdata = filtering_dataset.get(idx) if filtering_dataset else None
            if data is None or (filtering_dataset and fdata is None):
                failures += 1
            else:
                datas.append(data)
                fdatas.append(fdata)
        mesh = None
        if len(jax.devices()) > 1:
            mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("dp",))
        results = pipe.dock_many(
            datas, key, mesh=mesh,
            filtering_datas=fdatas if filtering_dataset else None,
            tail_rungs=args.tail_bucket_rungs,
        )
        for data, result in zip(datas, results):
            _write_outputs(args, data, result)
        logging.info("done; %d/%d complexes failed", failures, len(dataset))
        return

    for idx in range(len(dataset)):
        data = dataset.get(idx) if idx else first
        if data is None:
            failures += 1
            continue
        fdata = None
        if filtering_dataset is not None:
            fdata = filtering_dataset.get(idx)
            if fdata is None:
                logging.warning("filtering featurization failed for %s", data.name)
                failures += 1
                continue
        key, sub = jax.random.split(key)
        try:
            result = pipe.dock(data, sub, filtering_data=fdata)
        except Exception as e:  # per-complex skip-and-continue
            logging.exception("docking failed for %s: %s", data.name, e)
            failures += 1
            continue

        _write_outputs(args, data, result)

    logging.info("done; %d/%d complexes failed", failures, len(dataset))


def _write_outputs(args, data, result):
    from diffdock_pocket_tpu import visualise
    out = os.path.join(args.out_dir, data.name)
    os.makedirs(out, exist_ok=True)
    nl = len(data.raw["lig_pos"])
    na = len(data.raw["atom_pos"])
    if data.flex_residue_ids:
        # sidecar consumed by evaluate_files.py: restricts the side-chain
        # RMSD metric to the residues that were actually flexible
        with open(os.path.join(out, "flexible_residues.txt"), "w") as fh:
            for chain, seq, resname in data.flex_residue_ids:
                fh.write(f"{chain}:{seq}:{resname}\n")
    rank1_sdf = None
    for rank in range(result.lig_pos.shape[0]):
        conf_tag = (
            f"_confidence{result.confidence[rank]:.2f}"
            if result.confidence is not None
            else ""
        )
        sdf_path = os.path.join(out, f"rank{rank + 1}{conf_tag}.sdf")
        if rank == 0:
            rank1_sdf = sdf_path
        visualise.write_ligand_sdf(
            sdf_path,
            data.ligand, result.lig_pos[rank][:nl], result.center,
            name=data.name,
        )
        visualise.write_receptor_with_sidechains(
            os.path.join(out, f"rank{rank + 1}_protein.pdb"),
            data.receptor_arrays, result.atom_pos[rank][:na], result.center,
        )
    if args.relax:
        _relax_rank1(args, data, result, out, rank1_sdf)
    if args.save_visualisation and result.trajectory is not None:
        lig_traj = result.trajectory[0]  # [steps, S, NL, 3]
        for rank in range(min(3, lig_traj.shape[1])):
            w = visualise.LigandTrajectoryWriter(data.ligand)
            for step in range(lig_traj.shape[0]):
                w.add(lig_traj[step, rank][:nl] + result.center)
            w.write(os.path.join(out, f"rank{rank + 1}_reverseprocess.pdb"))
    logging.info("finished %s -> %s", data.name, out)


def _relax_rank1(args, data, result, out, rank1_sdf):
    """Relax the top-ranked pose -> rank1_relaxed.sdf (reference
    inference.py:248 + utils/posebusters_em.py:147-213).  Tier 1 = OpenMM
    energy minimization when importable; tier 2 = the TPU-native
    clash_relax (rigid+torsional soft-sphere descent, relax.py).

    `rank1_sdf` is the exact rank-1 path written by _write_outputs —
    scanning the directory with startswith('rank1') is wrong because
    'rank10_confidenceX.sdf' sorts before 'rank1_confidenceY.sdf'."""
    import numpy as np

    from diffdock_pocket_tpu import evaluation, relax as relaxlib, visualise

    relaxed_path = os.path.join(out, "rank1_relaxed.sdf")
    if relaxlib.openmm_available():
        e0, e1 = relaxlib.openmm_relax(
            os.path.join(out, "rank1_protein.pdb"),
            rank1_sdf, relaxed_path,
        )
        logging.info("%s OpenMM relax: %.1f -> %.1f kcal/mol", data.name, e0, e1)
        return

    nl = len(data.raw["lig_pos"])
    na = len(data.raw["atom_pos"])
    relaxed, e0, e1 = relaxlib.relax_result_pose(data, result, rank=0)
    elements = evaluation.elements_from_atom_feat(data.raw["atom_feat"])
    clashes_before = evaluation.rec_lig_clashes(
        result.atom_pos[0][:na], elements,
        result.lig_pos[0][:nl], list(data.ligand.symbols),
    )
    clashes_after = evaluation.rec_lig_clashes(
        result.atom_pos[0][:na], elements, relaxed[:nl], list(data.ligand.symbols),
    )
    visualise.write_ligand_sdf(
        relaxed_path, data.ligand, relaxed[:nl], result.center,
        name=f"{data.name}_relaxed",
    )
    logging.info(
        "%s clash_relax: overlap %.3f -> %.3f, rec-lig clashes %d -> %d",
        data.name, e0, e1, clashes_before, clashes_after,
    )


if __name__ == "__main__":
    main()
