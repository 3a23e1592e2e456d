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


def save_yaml_config(run_dir: str, cfg: ModelConfig, extra: Optional[dict] = None):
    os.makedirs(run_dir, exist_ok=True)
    d = cfg.to_dict()
    if extra:
        d.update(extra)
    with open(os.path.join(run_dir, "model_parameters.yml"), "w") as fh:
        yaml.safe_dump(d, fh)


def load_yaml_config(run_dir: str) -> ModelConfig:
    with open(os.path.join(run_dir, "model_parameters.yml")) as fh:
        d = yaml.safe_load(fh)
    return ModelConfig.from_dict(d)


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
