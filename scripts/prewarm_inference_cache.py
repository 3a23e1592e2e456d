"""Pre-warm the inference featurization cache for a CSV of complexes.

Featurizing a held-out complex costs ~1 min of single-core host work at
inference time; with `inference.py --cache_path` (config-hashed
DockingDataset cache, same contract as train.py) that work can be done
AHEAD of time — e.g. while the chip is still busy training the confidence
model — so the actual `inference.py` run starts docking immediately.

Builds the dataset exactly the way inference.py does (stored data_config
of the score run dir + the reference's inference-time overrides), so the
cache key matches.

Usage: python scripts/prewarm_inference_cache.py <csv> <score_run_dir> <cache_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu import runtime

runtime.setup(platform=os.environ.get("DDP_TPU_PLATFORM", "cpu"))


def main(csv, run_dir, cache_dir):
    import inference as inf
    from diffdock_pocket_tpu.data import dataset as ds
    from diffdock_pocket_tpu.data.featurize import DataConfig
    from diffdock_pocket_tpu.utils import checkpoint as ckptlib

    args = inf.get_parser().parse_args(
        ["--protein_ligand_csv", csv, "--score_model_dir", run_dir,
         "--cache_path", cache_dir]
    )
    df = ds.load_protein_ligand_df(args.protein_ligand_csv)
    score_cfg_loaded = ckptlib.load_yaml_config(run_dir)
    score_train_dc = ckptlib.load_data_config(run_dir)
    data_cfg = inf.inference_data_config(score_train_dc, args, DataConfig)
    esm = inf.resolve_esm(args, df, score_cfg_loaded, "score")
    dset = ds.DockingDataset(df, data_cfg, cache_dir=cache_dir,
                             esm_embeddings=esm)
    ok = 0
    for i in range(len(dset)):
        data = dset.get(i)
        if data is not None:
            ok += 1
        print(f"prewarm {i + 1}/{len(dset)}: "
              f"{'ok' if data is not None else 'FAILED'}", flush=True)
    print(f"prewarm done: {ok}/{len(dset)} cached under {dset.cache_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
