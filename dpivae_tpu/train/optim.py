"""Per-module optimizer mirroring the reference's 10 Adam param groups
(ref: dpivae.py:335-373).

Each top-level params entry (encoder(s), prior nets, decoders, log_sigma_x)
gets its own learning rate and L2 weight decay. torch's Adam param groups
share the moment machinery and differ only in (lr, weight_decay), so
instead of optax.multi_transform (one masked tree traversal per group per
step) the update is a SINGLE scale_by_adam pass bracketed by per-leaf
lr/wd scaling trees — semantically identical, ~9x fewer tree passes in the
hot step. Decay is added to the gradient before the Adam moments, matching
``torch.optim.Adam``'s ``weight_decay`` (not AdamW). Frozen physics never
appears in the params pytree, so the reference's defensive re-freeze
(dpivae.py:366-370) has no equivalent here — there is nothing to freeze.
"""

from __future__ import annotations

from typing import Tuple

import jax
import optax

from dpivae_tpu.config import TrainConfig


def group_hparams(config: TrainConfig) -> dict:
    """(lr, wd) per top-level params group (ref: dpivae.py:338-363):
    P-mode encoders use lr_ex/lr_ec/lr_ey, S-mode the single lr_e; prior
    nets share lr_p; decoders lr_dx/lr_dc/lr_dy; the noise scalar lr_sigma."""
    if config.model_type == "P":
        enc = {
            "encoder": (config.lr_ex, config.wd_e),
            "encoder_c": (config.lr_ec, config.wd_e),
            "encoder_y": (config.lr_ey, config.wd_e),
        }
    elif config.model_type == "S":
        enc = {"encoder": (config.lr_e, config.wd_e)}
    else:
        raise ValueError(f"Unknown model type {config.model_type}")
    return {
        **enc,
        "prior_net_c": (config.lr_p, config.wd_p),
        "prior_net_y": (config.lr_p, config.wd_p),
        "decoder_x": (config.lr_dx, config.wd_dx),
        "decoder_c": (config.lr_dc, config.wd_dc),
        "decoder_y": (config.lr_dy, config.wd_dy),
        "log_sigma_x": (config.lr_sigma, config.wd_sigma),
    }


def _hparam_trees(config: TrainConfig, params: dict):
    groups = group_hparams(config)
    missing = set(params) - set(groups)
    if missing:
        raise ValueError(f"Params groups without an optimizer: {sorted(missing)}")
    lr_tree = {
        name: jax.tree.map(lambda _: groups[name][0], subtree)
        for name, subtree in params.items()
    }
    wd_tree = {
        name: jax.tree.map(lambda _: groups[name][1], subtree)
        for name, subtree in params.items()
    }
    any_wd = any(groups[name][1] for name in params)
    return lr_tree, wd_tree, any_wd


def _grouped_adam(lr_tree, wd_tree, any_wd) -> optax.GradientTransformation:
    adam = optax.scale_by_adam()  # torch defaults: b1=.9, b2=.999, eps=1e-8

    def init(params):
        return adam.init(params)

    def update(grads, state, params=None):
        if any_wd:
            grads = jax.tree.map(
                lambda g, p, wd: g + wd * p, grads, params, wd_tree
            )
        updates, state = adam.update(grads, state, params)
        updates = jax.tree.map(lambda u, lr: -lr * u, updates, lr_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    config: TrainConfig, params: dict
) -> Tuple[optax.GradientTransformation, optax.OptState]:
    """Build the per-module optimizer and its initial state."""
    lr_tree, wd_tree, any_wd = _hparam_trees(config, params)
    tx = _grouped_adam(lr_tree, wd_tree, any_wd)
    if config.clip_gradients:
        # Global-norm clip over all params before the per-group updates
        # (ref: dpivae.py:432-433)
        tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), tx)
    return tx, tx.init(params)
