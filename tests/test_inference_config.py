"""Inference reconstructs featurization from the trained model's yml and
builds separate filtering graphs when the confidence model's params differ
(reference inference.py:332-429)."""
import os

import jax
import numpy as np
import pytest

from diffdock_pocket_tpu import sampling
from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data.featurize import DataConfig
from diffdock_pocket_tpu.models.config import ModelConfig
from diffdock_pocket_tpu.pipeline import DockingPipeline, init_random_variables
from diffdock_pocket_tpu.utils import checkpoint as ckptlib

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "example_data")
PROTEIN = os.path.join(EXAMPLE, "3dpf_protein.pdb")
LIGAND = os.path.join(EXAMPLE, "3dpf_ligand.sdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROTEIN), reason="3dpf example data not available"
)

TINY = ModelConfig(
    ns=6, nv=2, num_conv_layers=2, sh_lmax=1, sigma_embed_dim=8,
    distance_embed_dim=8, cross_distance_embed_dim=8, dynamic_max_cross=True,
    all_atoms=True, flexible_sidechains=True, atom_max_neighbors=4,
    lig_max_neighbors=6, cross_lig_atom_max_neighbors=6,
    low_precision_weights=False,
)


def _df():
    import pandas as pd

    return ds.load_protein_ligand_df(df=pd.DataFrame([{
        "complex_name": "3dpf",
        "experimental_protein": PROTEIN,
        "ligand_path": LIGAND,
    }]))


def test_data_config_reconstructed_from_yml(tmp_path):
    """Non-default featurization params stored at train time are recovered
    through the run dir's yml, with the reference's inference overrides."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "inference_cli",
        os.path.join(os.path.dirname(__file__), os.pardir, "inference.py"),
    )
    inf = importlib.util.module_from_spec(spec)
    sys.modules["inference_cli"] = inf
    spec.loader.exec_module(inf)

    train_dc = DataConfig(
        receptor_radius=11.0, c_alpha_max_neighbors=17, pocket_buffer=7.5,
        flexdist=2.5, matching=True, conformer_match_sidechains=True,
        chain_cutoff=10.0, keep_local_structures=False,
    )
    run_dir = str(tmp_path / "run")
    ckptlib.save_yaml_config(run_dir, TINY, data_cfg=train_dc)

    args = inf.get_parser().parse_args(["--keep_local_structures"])
    dc = inf.inference_data_config(ckptlib.load_data_config(run_dir), args, DataConfig)
    # training featurization fields survive
    assert dc.receptor_radius == 11.0
    assert dc.c_alpha_max_neighbors == 17
    assert dc.pocket_buffer == 7.5
    assert dc.flexdist == 2.5
    # inference overrides applied (reference inference.py:365-393)
    assert dc.chain_cutoff == float("inf")
    assert dc.matching is False
    assert dc.conformer_match_sidechains is False
    assert dc.use_original_conformer_fallback is True
    assert dc.keep_local_structures is True

    # no stored data_config (old run dirs) -> defaults + overrides
    run2 = str(tmp_path / "run2")
    ckptlib.save_yaml_config(run2, TINY)
    assert ckptlib.load_data_config(run2) is None
    dc0 = inf.inference_data_config(None, args, DataConfig)
    assert dc0.receptor_radius == DataConfig().receptor_radius


def test_filtering_model_gets_its_own_graph(tmp_path):
    """A confidence model trained with different graph params scores poses on
    its own featurization; ligand positions are transferred (reference
    sampling.py:268-274)."""
    score_dc = DataConfig(keep_local_structures=True)
    # filtering model: different receptor radius + neighbor cap
    filt_dc = DataConfig(keep_local_structures=True, receptor_radius=9.0,
                         c_alpha_max_neighbors=10, pocket_buffer=8.0)
    assert score_dc != filt_dc

    dset = ds.DockingDataset(_df(), score_dc)
    fset = ds.DockingDataset(_df(), filt_dc)
    data, fdata = dset.get(0), fset.get(0)
    assert data is not None and fdata is not None
    # featurizations genuinely differ
    assert (
        len(fdata.raw["rec_pos"]) != len(data.raw["rec_pos"])
        or fdata.raw["rec_nbr_idx"].shape != data.raw["rec_nbr_idx"].shape
        or not np.array_equal(fdata.raw["rec_nbr_idx"], data.raw["rec_nbr_idx"])
    )

    from diffdock_pocket_tpu import graph as graphlib

    g_ex = graphlib.replicate(graphlib.from_raw(data.raw), 2)
    variables = init_random_variables(TINY, g_ex)
    import dataclasses

    conf_cfg = dataclasses.replace(TINY, confidence_mode=True)
    gf_ex = graphlib.replicate(graphlib.from_raw(fdata.raw), 2)
    conf_vars = init_random_variables(conf_cfg, gf_ex)

    pipe = DockingPipeline(
        model_cfg=TINY, variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=2),
        confidence_cfg=conf_cfg, confidence_variables=conf_vars,
        samples_per_complex=2, batch_size=2,
    )
    result = pipe.dock(data, jax.random.PRNGKey(0), filtering_data=fdata)
    assert result.confidence is not None and result.confidence.shape == (2,)
    assert np.isfinite(result.confidence).all()

    # dock_many path too
    results = pipe.dock_many([data], jax.random.PRNGKey(1),
                             filtering_datas=[fdata])
    assert np.isfinite(results[0].confidence).all()
