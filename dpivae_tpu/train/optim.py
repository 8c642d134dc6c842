"""Per-module optimizer: optax multi_transform mirroring the reference's
10 Adam param groups (ref: dpivae.py:335-373).

Each top-level params entry (encoder(s), prior nets, decoders, log_sigma_x)
gets its own learning rate and L2 weight decay. Decay is applied to the
gradient before the Adam moments, matching ``torch.optim.Adam``'s
``weight_decay`` semantics (not AdamW). Frozen physics never appears in the
params pytree, so the reference's defensive re-freeze (dpivae.py:366-370)
has no equivalent here — there is nothing to freeze.
"""

from __future__ import annotations

from typing import Tuple

import jax
import optax

from dpivae_tpu.config import TrainConfig


def _adam_group(lr: float, wd: float) -> optax.GradientTransformation:
    transforms = []
    if wd:
        transforms.append(optax.add_decayed_weights(wd))
    transforms.append(optax.scale_by_adam())
    transforms.append(optax.scale(-lr))
    return optax.chain(*transforms)


def group_labels(params: dict) -> dict:
    """Label every leaf with its top-level module name."""
    return {
        name: jax.tree.map(lambda _: name, subtree)
        for name, subtree in params.items()
    }


def make_optimizer(
    config: TrainConfig, params: dict
) -> Tuple[optax.GradientTransformation, optax.OptState]:
    """Build the per-module optimizer and its initial state.

    Learning-rate mapping follows the reference exactly
    (ref: dpivae.py:338-363): P-mode encoders use lr_ex/lr_ec/lr_ey, S-mode
    the single lr_e; prior nets share lr_p; decoders lr_dx/lr_dc/lr_dy; the
    noise scalar lr_sigma.
    """
    if config.model_type == "P":
        enc_groups = {
            "encoder": _adam_group(config.lr_ex, config.wd_e),
            "encoder_c": _adam_group(config.lr_ec, config.wd_e),
            "encoder_y": _adam_group(config.lr_ey, config.wd_e),
        }
    elif config.model_type == "S":
        enc_groups = {"encoder": _adam_group(config.lr_e, config.wd_e)}
    else:
        raise ValueError(f"Unknown model type {config.model_type}")

    groups = {
        **enc_groups,
        "prior_net_c": _adam_group(config.lr_p, config.wd_p),
        "prior_net_y": _adam_group(config.lr_p, config.wd_p),
        "decoder_x": _adam_group(config.lr_dx, config.wd_dx),
        "decoder_c": _adam_group(config.lr_dc, config.wd_dc),
        "decoder_y": _adam_group(config.lr_dy, config.wd_dy),
        "log_sigma_x": _adam_group(config.lr_sigma, config.wd_sigma),
    }
    missing = set(params) - set(groups)
    if missing:
        raise ValueError(f"Params groups without an optimizer: {sorted(missing)}")

    tx = optax.multi_transform(groups, group_labels(params))
    if config.clip_gradients:
        # Global-norm clip over all params before the per-group updates
        # (ref: dpivae.py:432-433)
        tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), tx)
    return tx, tx.init(params)
