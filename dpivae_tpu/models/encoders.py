"""Gaussian encoder heads and reparameterized sampling.

Functional rebuild of reference models/encoders.py. The numeric clamps
(±50 loc, [-7, 3] log-sigma, ±20 tril) are load-bearing for training
stability and replicated exactly (ref: models/encoders.py:33-44,121-128).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dpivae_tpu.models.nn import linear_apply, linear_init, mlp_apply, mlp_init
from dpivae_tpu.ops.mvn import mvn_sample_with_log_prob


def full_cov_nn_init(key, n_latent: int, n_input: int, layers: Sequence[int]) -> dict:
    """Full-covariance Gaussian head (ref: models/encoders.py:6-31):
    ReLU trunk + three heads (loc, log-sigma, strictly-lower tril)."""
    k_trunk, k_mean, k_sigma, k_cov = jax.random.split(key, 4)
    sizes = [n_input, *layers]
    width = sizes[-1]
    return {
        "trunk": mlp_init(k_trunk, sizes),
        "f_mean": linear_init(k_mean, width, n_latent),
        "f_sigma": linear_init(k_sigma, width, n_latent),
        "f_cov": linear_init(k_cov, width, n_latent * n_latent),
    }


def _trunk_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    # The reference trunk applies ReLU after *every* linear, including the
    # last (ref: models/encoders.py:25-31): Linear/ReLU pairs, never popped.
    # Dispatch on pytree structure: a "conv" entry marks the Conv1d trunk.
    if "conv" in params["trunk"]:
        return _cnn_trunk_apply(params["trunk"], x)
    h = x
    for layer in params["trunk"]["layers"]:
        h = jax.nn.relu(linear_apply(layer, h))
    return h


# ----------------------------------------------------------------------
# Conv1d trunk (the reference stubs a CNN encoder option — commented out
# at ref dpivae.py:198-199/240-241 with dead ch_in/ch_out/ch_latent args at
# ref utils/__init__.py:112-114 — so this is a working superset, not a
# translation). The signal axis nd_x is treated as a length-(nd_x/ch_in)
# 1-D sequence; convs lower onto the MXU as implicit matmuls under XLA.
# ----------------------------------------------------------------------


def conv1d_init(key, ch_in: int, ch_out: int, kernel: int = 3) -> dict:
    """torch ``nn.Conv1d``-default init: U(-b, b) with b = 1/sqrt(ch_in*k).

    Weight layout (kernel, ch_in, ch_out) = XLA "WIO"."""
    bound = 1.0 / math.sqrt(ch_in * kernel)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(
            kw, (kernel, ch_in, ch_out), jnp.float32, -bound, bound
        ),
        "b": jax.random.uniform(kb, (ch_out,), jnp.float32, -bound, bound),
    }


def _conv1d_apply(params: dict, h: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded stride-1 1-D convolution; ``h`` is (batch, length, ch)."""
    out = jax.lax.conv_general_dilated(
        h,
        params["w"],
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"]


def _cnn_trunk_apply(trunk: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Conv/ReLU stack -> flatten -> Linear -> ReLU (the trunk keeps the
    reference's activation-after-every-layer convention)."""
    ch_in = trunk["conv"][0]["w"].shape[1]
    lead = x.shape[:-1]
    h = jnp.reshape(x, (-1, x.shape[-1] // ch_in, ch_in))
    for conv in trunk["conv"]:
        h = jax.nn.relu(_conv1d_apply(conv, h))
    h = jnp.reshape(h, (h.shape[0], -1))
    h = jax.nn.relu(linear_apply(trunk["proj"], h))
    return jnp.reshape(h, (*lead, h.shape[-1]))


def cnn_encoder_init(
    key,
    n_latent: int,
    n_input: int,
    ch_in: int = 1,
    ch_out: int = 16,
    ch_latent: int = 64,
    kernel: int = 3,
) -> dict:
    """Full-covariance Gaussian head on a Conv1d trunk.

    Heads (loc / log-sigma / strictly-lower tril) are identical to
    ``full_cov_nn_init`` so ``gaussian_head_apply`` and all clamp semantics
    are shared; only the trunk differs.
    """
    if n_input % ch_in:
        raise ValueError(f"nd_x={n_input} not divisible by ch_in={ch_in}")
    length = n_input // ch_in
    k_c1, k_c2, k_proj, k_mean, k_sigma, k_cov = jax.random.split(key, 6)
    return {
        "trunk": {
            "conv": (
                conv1d_init(k_c1, ch_in, ch_out, kernel),
                conv1d_init(k_c2, ch_out, ch_out, kernel),
            ),
            "proj": linear_init(k_proj, length * ch_out, ch_latent),
        },
        "f_mean": linear_init(k_mean, ch_latent, n_latent),
        "f_sigma": linear_init(k_sigma, ch_latent, n_latent),
        "f_cov": linear_init(k_cov, ch_latent, n_latent * n_latent),
    }


def full_cov_nn_apply(
    params: dict, x: jnp.ndarray, n_latent: int, jitter: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loc, scale_tril) with the reference's exact clamps
    (ref: models/encoders.py:33-44)."""
    h = _trunk_apply(params, x)
    loc = jnp.clip(linear_apply(params["f_mean"], h), -50.0, 50.0)
    sigma = jnp.exp(jnp.clip(linear_apply(params["f_sigma"], h), -7.0, 3.0))
    L_flat = jnp.clip(linear_apply(params["f_cov"], h), -20.0, 20.0)
    L = jnp.reshape(L_flat, (*x.shape[:-1], n_latent, n_latent))
    L = jnp.tril(L, k=-1)
    # diag_embed(sigma + jitter) added onto the strictly-lower triangle
    scale_tril = L + (sigma + jitter)[..., :, None] * jnp.eye(n_latent)
    return loc, scale_tril


def factorized_nn_init(key, n_latent: int, n_input: int, layers: Sequence[int]) -> dict:
    """Diagonal-covariance head (ref: models/encoders.py:96-119)."""
    k_trunk, k_mean, k_sigma = jax.random.split(key, 3)
    sizes = [n_input, *layers]
    width = sizes[-1]
    return {
        "trunk": mlp_init(k_trunk, sizes),
        "f_mean": linear_init(k_mean, width, n_latent),
        "f_sigma": linear_init(k_sigma, width, n_latent),
    }


def factorized_nn_apply(
    params: dict, x: jnp.ndarray, n_latent: int, jitter: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loc, diag scale_tril) (ref: models/encoders.py:121-128)."""
    h = _trunk_apply(params, x)
    loc = jnp.clip(linear_apply(params["f_mean"], h), -50.0, 50.0)
    sigma = jnp.exp(jnp.clip(linear_apply(params["f_sigma"], h), -7.0, 3.0))
    scale_tril = (sigma + jitter)[..., :, None] * jnp.eye(n_latent)
    return loc, scale_tril


def gaussian_head_apply(
    params: dict, x: jnp.ndarray, n_latent: int, jitter: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on params structure: full-covariance if an ``f_cov`` head is
    present, factorized otherwise."""
    if "f_cov" in params:
        return full_cov_nn_apply(params, x, n_latent, jitter)
    return factorized_nn_apply(params, x, n_latent, jitter)


def gaussian_encoder_forward(
    params: dict,
    x: jnp.ndarray,
    n_latent: int,
    input_transform=None,
    jitter: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loc, scale_tril) of q(z|x) (ref: models/encoders.py:60-71)."""
    if input_transform is not None:
        x, _ = input_transform.forward(x)
    return gaussian_head_apply(params, x, n_latent, jitter)


def gaussian_encoder_sample(
    key,
    loc: jnp.ndarray,
    scale_tril: jnp.ndarray,
    n: int,
    output_transform=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw n reparameterized samples and log q, applying the optional
    output squash with change-of-variables correction
    (ref: models/encoders.py:73-93).

    Returns (z, log q - log|det J|), z of shape (n, ..., n_latent).
    """
    z, log_q = mvn_sample_with_log_prob(key, loc, scale_tril, n)
    if output_transform is not None:
        z, log_det = output_transform.forward(z)
        log_q = log_q - log_det
    return z, log_q
