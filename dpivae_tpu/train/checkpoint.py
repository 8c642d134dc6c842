"""Checkpoint save/restore.

The reference creates an ``output/<name>/models`` directory but never writes
a checkpoint and has no resume path (SURVEY.md §5 "Checkpoint/resume:
absent"). This module adds real checkpointing as a framework improvement:
params (+ optional config snapshot) via orbax, restorable into a fresh
process.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dpivae_tpu.config import TrainConfig


def save_checkpoint(path: str, params: dict, config: Optional[TrainConfig] = None) -> None:
    """Save a params pytree (and config JSON alongside) at ``path``."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, params))
    if config is not None:
        config.save_json(path + ".config.json")


def load_checkpoint(path: str, like: Optional[dict] = None) -> dict:
    """Restore a params pytree saved by ``save_checkpoint``.

    ``like`` (an abstract/concrete pytree of the same structure) guides
    restoration; without it the stored structure is used as-is.
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
                like,
            )
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def load_checkpoint_config(path: str) -> TrainConfig:
    return TrainConfig.from_json(os.path.abspath(path) + ".config.json")
