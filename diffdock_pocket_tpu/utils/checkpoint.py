"""Checkpointing: orbax state + the model_parameters.yml contract.

Parity with the reference's de-facto model format: a run directory holding
weights plus a ``model_parameters.yml`` that is reloaded at inference time to
reconstruct the exact model/dataset config (reference train.py:205-207,
inference.py:332-336).  Weights here are orbax-saved flax variable trees
(params + batch_stats [+ optimizer/EMA state for last_model]).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import yaml

from ..models.config import ModelConfig


def save_yaml_config(run_dir: str, cfg: ModelConfig, data_cfg=None,
                     extra: Optional[dict] = None):
    """Persist the model config (+ the training featurization config under
    the ``data_config`` key) so inference can reconstruct the exact dataset
    parameters from the run dir (reference inference.py:332-393)."""
    os.makedirs(run_dir, exist_ok=True)
    d = cfg.to_dict()
    if data_cfg is not None:
        import dataclasses

        d["data_config"] = dataclasses.asdict(data_cfg)
    if extra:
        d.update(extra)
    with open(os.path.join(run_dir, "model_parameters.yml"), "w") as fh:
        yaml.safe_dump(d, fh)


def load_yaml_config(run_dir: str) -> ModelConfig:
    with open(os.path.join(run_dir, "model_parameters.yml")) as fh:
        d = yaml.safe_load(fh)
    return ModelConfig.from_dict(d)


def load_data_config(run_dir: str):
    """The featurization config stored by the trainer, or None for run dirs
    predating the data_config field (callers fall back to defaults)."""
    import dataclasses

    from ..data.featurize import DataConfig

    with open(os.path.join(run_dir, "model_parameters.yml")) as fh:
        d = yaml.safe_load(fh)
    dc = d.get("data_config")
    if dc is None:
        return None
    # fields added after a run was trained must reconstruct with the
    # behavior that run was trained with, not the fresh-run default
    dc.setdefault("lig_chirality", False)
    dc.setdefault("hybridization_version", "v1")
    names = {f.name for f in dataclasses.fields(DataConfig)}
    return DataConfig(**{k: v for k, v in dc.items() if k in names})


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any):
    """Save a pytree (flax variables / train state) at ``path``."""
    import jax

    path = os.path.abspath(path)
    _ckptr().save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, target: Any = None) -> Any:
    path = os.path.abspath(path)
    if target is not None:
        import orbax.checkpoint as ocp

        return _ckptr().restore(path, item=target)
    return _ckptr().restore(path)
