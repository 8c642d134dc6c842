"""Decoders: Gaussian-head MLP decoder and the physics+NN additive fusion.

Functional rebuild of reference models/decoders.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dpivae_tpu.models.nn import linear_apply, linear_init, mlp_apply, mlp_init
from dpivae_tpu.ops.gradrev import maybe_grad_reverse


def decoder_init(key, n_input: int, n_output: int, layers: Sequence[int]) -> dict:
    """Gaussian-head MLP decoder: output width 2*n_output split into
    (mean, log_sigma) (ref: models/decoders.py:4-35)."""
    sizes = [n_input, *layers, 2 * n_output]
    return mlp_init(key, sizes)


def decoder_apply(
    params: dict,
    z: jnp.ndarray,
    n_output: int,
    nonlinearity: Callable = jax.nn.relu,
    nonlinear_last: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean, log_sigma) (ref: models/decoders.py:36-49).
    ``nonlinear_last`` optionally wraps the final layer output, as in the
    reference (unused by the shipped presets)."""
    out = mlp_apply(params, z, nonlinearity=nonlinearity,
                    nonlinear_last=nonlinear_last)
    return out[..., :n_output], out[..., n_output:]


def grad_rev_additive_init(key, nz_d: int, n_output: int, hidden: int = 128) -> dict:
    """Data-driven branch of the additive decoder: nz_d -> hidden -> n_output
    (ref: models/decoders.py:74-77). The physics model carries no trainable
    params here — frozen physics lives outside the params pytree."""
    k0, k1 = jax.random.split(key)
    return {
        "fx0": linear_init(k0, nz_d, hidden),
        "fx1": linear_init(k1, hidden, n_output),
    }


def grad_rev_additive_apply(
    params: dict,
    z: jnp.ndarray,
    z_rev: jnp.ndarray,
    physics_model: Callable[[jnp.ndarray], jnp.ndarray],
    grl_alpha: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The physics+NN additive fusion decoder (ref: models/decoders.py:79-92).

    Args:
        z: physics latents concat physical covariates (z_x || c_phys).
        z_rev: data-driven latents (z_c || z_y), gradient-reversed when
            ``grl_alpha`` is not None.
        physics_model: frozen physics forward (analytic fn or frozen MLP).
        grl_alpha: GRL strength; None disables the adversarial branch.

    Returns:
        (xh_p, xh_d) — physics and data-driven predictions, NOT summed
        (the caller adds them, ref: models/vae.py:197).
    """
    z_d = maybe_grad_reverse(z_rev, grl_alpha)
    if use_pallas:
        # Fused linear->relu->linear TPU kernel (identical math + VJP;
        # falls back to jnp off-TPU). The hidden width (128) is
        # lane-aligned, making this the one MLP in the model that tiles
        # the MXU cleanly as a single kernel.
        from dpivae_tpu.ops.pallas_mlp import fused_mlp

        xh_d = fused_mlp(
            z_d,
            params["fx0"]["w"], params["fx0"]["b"],
            params["fx1"]["w"], params["fx1"]["b"],
        )
    else:
        xh_d = linear_apply(
            params["fx1"], jax.nn.relu(linear_apply(params["fx0"], z_d))
        )
    xh_p = physics_model(z)
    return xh_p, xh_d
