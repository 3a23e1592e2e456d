"""ESM embeddings end-to-end: dataset attachment, cache keying, the
train->infer round trip through the CLI code paths, and loud dim-mismatch
failures.

Parity targets: reference utils/esm.py:156-188 (embeddings per chain),
datasets/pdbbind.py:408 (attached during preprocessing), and
process_mols.py:148-162 (appended to receptor residue features).
"""
import os

import numpy as np
import pytest

from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data import esm as esmmod
from diffdock_pocket_tpu.data.featurize import DataConfig
from diffdock_pocket_tpu.data.pdb import parse_pdb

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
PROTEIN = os.path.join(EXAMPLE, "3dpf_protein.pdb")
LIGAND = os.path.join(EXAMPLE, "3dpf_ligand.sdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROTEIN), reason="3dpf example data not available"
)

ESM_DIM = 16  # small stand-in width; the mechanism is width-agnostic


def _fake_embeddings():
    seqs = esmmod.get_chain_sequences(parse_pdb(PROTEIN))
    rng = np.random.default_rng(0)
    return {
        "3dpf": [rng.normal(size=(len(s), ESM_DIM)).astype(np.float32) for s in seqs]
    }


def _df():
    import pandas as pd

    return ds.load_protein_ligand_df(df=pd.DataFrame([{
        "complex_name": "3dpf",
        "experimental_protein": PROTEIN,
        "ligand_path": LIGAND,
    }]))


def test_embeddings_reach_the_graph(tmp_path):
    emb = _fake_embeddings()
    dset = ds.DockingDataset(_df(), DataConfig(), cache_dir=str(tmp_path),
                             esm_embeddings=emb)
    data = dset.get(0)
    assert data is not None
    rec_esm = data.raw["rec_esm"]
    assert rec_esm.shape == (len(data.raw["rec_pos"]), ESM_DIM)
    # rows are drawn from the provided chain arrays (not zeros / garbage)
    chain0 = emb["3dpf"][0]
    assert np.isin(rec_esm[:, 0], np.concatenate([c[:, 0] for c in emb["3dpf"]])).all()
    assert np.abs(rec_esm).sum() > 0

    # without embeddings the width is 0 and the cache key differs
    dset0 = ds.DockingDataset(_df(), DataConfig(), cache_dir=str(tmp_path))
    assert dset0.cache_dir != dset.cache_dir
    data0 = dset0.get(0)
    assert data0.raw["rec_esm"].shape[-1] == 0


def test_train_infer_roundtrip_with_esm(tmp_path):
    """Train one epoch with nonzero-dim embeddings via the Trainer, reload
    the run dir via the inference-CLI path (yml + checkpoint), dock."""
    import dataclasses
    import types

    import jax

    from diffdock_pocket_tpu import sampling
    from diffdock_pocket_tpu.data.featurize import build_complex
    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.pipeline import DockingPipeline
    from diffdock_pocket_tpu.trainer import Trainer
    from diffdock_pocket_tpu.training import LossWeights, NoiseConfig
    from diffdock_pocket_tpu.utils import checkpoint as ckptlib

    emb = _fake_embeddings()
    data_cfg = DataConfig(keep_local_structures=True)
    train_set = ds.DockingDataset(_df(), data_cfg, cache_dir=str(tmp_path / "c"),
                                  esm_embeddings=emb)
    cfg = ModelConfig(
        ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
        distance_embed_dim=8, cross_distance_embed_dim=8,
        dynamic_max_cross=True, all_atoms=True, flexible_sidechains=True,
        atom_max_neighbors=4, lig_max_neighbors=6,
        cross_lig_atom_max_neighbors=6, esm_embeddings_dim=ESM_DIM,
        low_precision_weights=False,
    )
    args = types.SimpleNamespace(
        log_dir=str(tmp_path), run_name="esm_run", seed=0, lr=1e-3,
        adamw=False, use_ema=True, ema_rate=0.999, batch_size=2,
        n_epochs=1, val_inference_freq=0, test_sigma_intervals=False,
        main_metric="val_loss", main_metric_goal="min",
        scheduler_patience=30, restart_dir=None, wandb=False,
        checkpoint_freq=1, num_inference_complexes=0, inference_steps=2,
        inference_samples=1,
    )
    trainer = Trainer(args, cfg, NoiseConfig(), LossWeights(),
                      train_set, train_set, data_cfg=data_cfg)
    trainer.fit()

    run_dir = os.path.join(str(tmp_path), "esm_run")
    # yml round trip carries both the model and the data config
    cfg2 = ckptlib.load_yaml_config(run_dir)
    assert cfg2.esm_embeddings_dim == ESM_DIM
    dc2 = ckptlib.load_data_config(run_dir)
    assert dc2 == data_cfg

    variables = ckptlib.load_checkpoint(os.path.join(run_dir, "best_model"))
    pipe = DockingPipeline(
        model_cfg=cfg2, variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2),
        samples_per_complex=1, batch_size=1,
    )
    data = train_set.get(0)
    result = pipe.dock(data, jax.random.PRNGKey(0))
    assert np.isfinite(result.lig_pos).all()

    # durable per-epoch history next to the checkpoints (one line per epoch)
    import json as _json
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        hist = [_json.loads(l) for l in fh]
    assert len(hist) == args.n_epochs
    assert "loss" in hist[0] and "val_loss" in hist[0]


def test_dim_mismatch_raises(tmp_path):
    """A model expecting 1280-d ESM features must refuse 0-d graphs."""
    import types

    from diffdock_pocket_tpu.models.config import ModelConfig
    from diffdock_pocket_tpu.trainer import Trainer
    from diffdock_pocket_tpu.training import LossWeights, NoiseConfig

    train_set = ds.DockingDataset(_df(), DataConfig(keep_local_structures=True),
                                  cache_dir=str(tmp_path / "c"))
    cfg = ModelConfig(ns=6, nv=2, num_conv_layers=2, esm_embeddings_dim=1280,
                      all_atoms=True, flexible_sidechains=True,
                      low_precision_weights=False)
    args = types.SimpleNamespace(
        log_dir=str(tmp_path), run_name="mismatch", seed=0, lr=1e-3,
        adamw=False, use_ema=True, ema_rate=0.999, batch_size=2,
        n_epochs=1, val_inference_freq=0, test_sigma_intervals=False,
        main_metric="val_loss", main_metric_goal="min",
        scheduler_patience=30, restart_dir=None, wandb=False,
    )
    trainer = Trainer(args, cfg, NoiseConfig(), LossWeights(),
                      train_set, train_set)
    with pytest.raises(ValueError, match="rec_esm width"):
        trainer.fit()
