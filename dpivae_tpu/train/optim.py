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


import jax
import optax

from dpivae_tpu.config import TrainConfig


def group_hparams(config: TrainConfig, overlay: dict | None = None) -> dict:
    """(lr, wd) per top-level params group (ref: dpivae.py:338-363):
    P-mode encoders use lr_ex/lr_ec/lr_ey, S-mode the single lr_e; prior
    nets share lr_p; decoders lr_dx/lr_dc/lr_dy; the noise scalar lr_sigma.

    ``overlay`` maps config field names to replacement values; traced
    (jax scalar) values are allowed — lr/wd enter the update only
    multiplicatively, so hyperparameter sweeps can vmap over them."""
    ov = (overlay or {}).get
    f = lambda name: ov(name, getattr(config, name))
    if config.model_type == "P":
        enc = {
            "encoder": (f("lr_ex"), f("wd_e")),
            "encoder_c": (f("lr_ec"), f("wd_e")),
            "encoder_y": (f("lr_ey"), f("wd_e")),
        }
    elif config.model_type == "S":
        enc = {"encoder": (f("lr_e"), f("wd_e"))}
    else:
        raise ValueError(f"Unknown model type {config.model_type}")
    return {
        **enc,
        "prior_net_c": (f("lr_p"), f("wd_p")),
        "prior_net_y": (f("lr_p"), f("wd_p")),
        "decoder_x": (f("lr_dx"), f("wd_dx")),
        "decoder_c": (f("lr_dc"), f("wd_dc")),
        "decoder_y": (f("lr_dy"), f("wd_dy")),
        "log_sigma_x": (f("lr_sigma"), f("wd_sigma")),
    }


def _static_nonzero(v) -> bool:
    """True unless v is a static Python zero (a traced value may be
    anything at runtime, so it must keep the decay term in the graph)."""
    return not isinstance(v, (int, float)) or bool(v)


def _hparam_trees(config: TrainConfig, params: dict, overlay=None):
    groups = group_hparams(config, overlay)
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
    any_wd = any(_static_nonzero(groups[name][1]) for name in params)
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
    config: TrainConfig, params: dict, overlay: dict | None = None
) -> optax.GradientTransformation:
    """Build the per-module optimizer (state via ``tx.init(params)``).

    ``overlay`` optionally replaces lr/wd/max_grad_norm fields, possibly
    with traced scalars (see group_hparams)."""
    lr_tree, wd_tree, any_wd = _hparam_trees(config, params, overlay)
    tx = _grouped_adam(lr_tree, wd_tree, any_wd)
    if config.clip_gradients:
        # Global-norm clip over all params before the per-group updates
        # (ref: dpivae.py:432-433)
        max_norm = (overlay or {}).get("max_grad_norm", config.max_grad_norm)
        tx = optax.chain(optax.clip_by_global_norm(max_norm), tx)
    return tx
