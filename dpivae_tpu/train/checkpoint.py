"""Checkpoint save/restore.

The reference creates an ``output/<name>/models`` directory but never writes
a checkpoint and has no resume path (SURVEY.md §5 "Checkpoint/resume:
absent"). This module adds real checkpointing as a framework improvement:
params (+ optional config snapshot) via orbax, restorable into a fresh
process.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Optional, Tuple

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


_SCALER_NAMES = ("transform_x", "transform_c", "transform_y")


def save_model(
    path: str,
    model,
    params: dict,
    config: TrainConfig,
    case=None,
    extra_meta: Optional[dict] = None,
) -> None:
    """Save a SERVABLE checkpoint: params plus the model's fitted input
    scalers, with the config as a JSON sidecar.

    ``save_checkpoint`` persists params only; restoring those into a usable
    model needs the original training data to refit the input
    ``StandardScaler``s (they live on the model object, not in params).
    This variant captures the scaler state too, so ``load_model`` can
    rebuild a ready-to-sample (model, params) pair in a fresh process from
    the checkpoint + the case alone — no data replay, no retraining. The
    reference has no model persistence at all (SURVEY.md §5: its
    ``output/<name>/models`` dir is created but never written).

    ``case`` (optional) adds a ``.meta.json`` sidecar with the case name
    and content fingerprint; ``load_model`` warns if restoring against a
    case whose definition (priors, factor table, surrogate weights) has
    since changed. ``extra_meta`` merges additional JSON-serializable
    provenance into that sidecar (e.g. a sweep member's λ and index).
    """
    path = os.path.abspath(path)
    tree = {
        "params": jax.tree.map(np.asarray, params),
        "scalers": {
            name: {
                "mean": np.asarray(getattr(model, name).mean),
                "scale": np.asarray(getattr(model, name).scale),
            }
            for name in _SCALER_NAMES
        },
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    config.save_json(path + ".config.json")
    if case is not None or extra_meta:
        meta = dict(extra_meta or {})
        if case is not None:
            meta.update(case=case.name, case_fingerprint=case.fingerprint())
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_model(
    path: str, case, config: Optional[TrainConfig] = None
) -> Tuple[object, dict]:
    """Rebuild a ready-to-sample ``(model, params)`` from ``save_model``.

    The model's architecture and fixed pieces (priors, physics surrogate,
    encoder squash) are re-derived from ``(config, case)`` exactly as
    ``setup_model`` builds them; the fitted input scalers come from the
    checkpoint. ``config`` defaults to the saved JSON sidecar.
    """
    from dpivae_tpu.train.setup import make_template_model
    from dpivae_tpu.utils.transforms import StandardScaler

    path = os.path.abspath(path)
    if config is None:
        config = load_checkpoint_config(path)
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        saved_fp = meta.get("case_fingerprint")
        if saved_fp is not None and saved_fp != case.fingerprint():
            warnings.warn(
                f"checkpoint {path!r} was saved against case "
                f"{meta.get('case')!r} with a different content fingerprint "
                "— its priors, factor table, or surrogate weights have "
                "changed since; restored predictions may be inconsistent",
                stacklevel=2,
            )
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    template = make_template_model(config, case)
    scalers = {
        name: StandardScaler(
            mean=tree["scalers"][name]["mean"],
            scale=tree["scalers"][name]["scale"],
        )
        for name in _SCALER_NAMES
    }
    model = template.__class__(**{**template.__dict__, **scalers})
    return model, tree["params"]
