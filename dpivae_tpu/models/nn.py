"""Linear/MLP building blocks as functional params-pytrees.

Initialization matches torch's ``nn.Linear`` default (kaiming-uniform with
a=sqrt(5) for weights, fan-in uniform for bias — both reduce to
U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so that training dynamics are
statistically comparable with the reference even though RNG streams differ
(SURVEY.md §7 "RNG discipline").

The generic ``MLP`` mirrors the reference surrogate architecture
(reference models/nn.py:28-80): Linear/nonlinearity pairs with no activation
after the last layer, optional input/output transforms and optional GRL.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from dpivae_tpu.ops.gradrev import grad_reverse


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> dict:
    """torch-default initialized dense layer params {"w": (in, out), "b": (out,)}."""
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def linear_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def mlp_init(key, sizes: Sequence[int]) -> dict:
    """Stack of dense layers; ``sizes`` = [in, hidden..., out].

    Params are {"layers": (layer_0, layer_1, ...)} with layers as a tuple so
    the pytree structure is static.
    """
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        "layers": tuple(
            linear_init(k, sizes[i], sizes[i + 1]) for i, k in enumerate(keys)
        )
    }


def mlp_apply(
    params: dict,
    x: jnp.ndarray,
    nonlinearity: Callable = jax.nn.relu,
    nonlinear_last: Optional[Callable] = None,
) -> jnp.ndarray:
    """Forward through Linear/nonlinearity pairs; no activation after the
    final layer unless ``nonlinear_last`` is given (ref: models/nn.py:54-65)."""
    layers = params["layers"]
    h = x
    for layer in layers[:-1]:
        h = nonlinearity(linear_apply(layer, h))
    h = linear_apply(layers[-1], h)
    if nonlinear_last is not None:
        h = nonlinear_last(h)
    return h


def surrogate_apply(
    params: dict,
    z: jnp.ndarray,
    input_transform=None,
    nonlinearity: Callable = jnp.tanh,
    grad_reverse_alpha=None,
) -> jnp.ndarray:
    """Frozen surrogate MLP forward (ref: models/nn.py:67-80): optional GRL,
    optional input scaler, tanh MLP trunk."""
    if grad_reverse_alpha is not None:
        z = grad_reverse(z, jnp.asarray(grad_reverse_alpha))
    if input_transform is not None:
        z, _ = input_transform.forward(z)
    return mlp_apply(params, z, nonlinearity=nonlinearity)


def linear_model_init(key, n_latent: int, n_dim: int) -> dict:
    """Single linear layer (ref: models/nn.py:5-25)."""
    return {"linear": linear_init(key, n_latent, n_dim)}


def linear_model_apply(params: dict, z, input_transform=None, output_transform=None):
    if input_transform is not None:
        z, _ = input_transform.forward(z)
    x = linear_apply(params["linear"], z)
    if output_transform is not None:
        x, _ = output_transform.forward(x)
    return x
