"""Synthetic data generation (ref: utils/data.py:9-52).

``sample_response`` draws ground-truth factors, pushes them through the
frozen full surrogate, and adds observation noise — as a pure function of an
explicit PRNG key, so data generation fuses into jitted pipelines (e.g.
sweep members regenerate their own datasets on device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.utils.priors import factor_indices


def test_train_split(n_train: int, n_test: int, data):
    """Thin wrapper over sklearn's train_test_split (ref: utils/data.py:5-6;
    unused by the main scripts, kept for API parity)."""
    from sklearn.model_selection import train_test_split

    return train_test_split(
        *[np.asarray(a) for a in data],
        test_size=int(n_test),
        train_size=int(n_train),
    )


def sample_response(
    case,
    key,
    n: int,
    sample_dist=None,
    z: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample (x, c, y, z) for a case.

    Either draw ``n`` factor vectors from ``sample_dist`` or tile a given
    ``z`` n times along a new leading axis (traversal plots pass pinned
    factor grids; ref utils/data.py:19-24).

    Returns:
        x: response (noisy surrogate output), (..., nd_x)
        c: covariates = z columns of type "c" + noise
        y: labels = z columns of type "y" + noise
        z: the sampled ground-truth factors
    """
    if sample_dist is None and z is None:
        raise ValueError("At least one of `sample_dist` and `z` must not be None")

    k_z, k_x, k_c, k_y = jax.random.split(key, 4)
    if z is None:
        z_sample = sample_dist.sample(k_z, (n,))
    else:
        z = jnp.asarray(z)
        z_sample = jnp.broadcast_to(z[None, ...], (n, *z.shape))

    idx_c = jnp.asarray(factor_indices(case.factors, "c"))
    idx_y = jnp.asarray(factor_indices(case.factors, "y"))

    x_sample = case.full_model(z_sample)
    x_sample = x_sample + case.sigma_x * jax.random.normal(k_x, x_sample.shape)

    c_sample = z_sample[..., idx_c]
    c_sample = c_sample + case.sigma_c * jax.random.normal(k_c, c_sample.shape)

    y_sample = z_sample[..., idx_y]
    y_sample = y_sample + case.sigma_y * jax.random.normal(k_y, y_sample.shape)

    return x_sample, c_sample, y_sample, z_sample
