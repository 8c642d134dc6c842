"""Full-covariance multivariate normal: reparameterized sampling and
log-density.

The reference uses ``torch.distributions.MultivariateNormal`` for encoder
sampling (models/encoders.py:84-86) and learned-prior densities
(models/vae.py:202-203). Latent dims here are tiny (2-10), so the TPU-native
implementation keeps everything as small fused VPU ops:

- ``mvn_sample_with_log_prob`` samples via ``z = loc + L @ eps`` and computes
  ``log q(z)`` directly from the noise: ``-0.5*||eps||^2 - sum(log diag L)
  + n*const``. For z sampled from the same distribution this is *identically
  equal* to the generic Mahalanobis form — in value and in gradient (the
  quadratic form (L eps)^T (L L^T)^{-1} (L eps) == eps^T eps is constant in L,
  so both paths contribute zero gradient) — while avoiding a triangular solve.
- ``mvn_log_prob`` is the generic density (triangular solve) used when ``z``
  comes from a *different* distribution than (loc, scale_tril), e.g. the
  learned conditional priors evaluated at encoder samples.
"""

import jax
import jax.numpy as jnp

from dpivae_tpu.utils import GAUSSIAN_CONST

# Latent dims in this model family are 1-10; below this bound the matvec and
# triangular solve are formulated as unrolled elementwise VPU ops. Batched
# (d, d) matmuls/solves at d<=10 are pathological on the MXU (each tiny
# matrix pads toward a 128-lane tile; vmapped sweeps multiply the waste),
# while the elementwise forms fuse into neighbouring ops for free.
_SMALL_DIM = 16


def _matvec_small(L, v):
    """(..., d, d) @ (..., d) as a broadcast-multiply + reduce (VPU)."""
    return jnp.sum(L * v[..., None, :], axis=-1)


def _tri_solve_small(L, b):
    """Forward substitution for lower-triangular L, unrolled over the
    (static, tiny) dimension: pure elementwise ops, no MXU, no loops."""
    d = b.shape[-1]
    xs = []
    for i in range(d):
        s = b[..., i]
        for j in range(i):
            s = s - L[..., i, j] * xs[j]
        xs.append(s / L[..., i, i])
    return jnp.stack(xs, axis=-1)


def mvn_sample_with_log_prob(key, loc, scale_tril, n: int):
    """Draw ``n`` reparameterized samples and their log-density.

    Args:
        key: PRNG key.
        loc: (..., d) mean.
        scale_tril: (..., d, d) lower-triangular scale.
        n: number of Monte-Carlo samples (leading axis of the output).

    Returns:
        z: (n, ..., d) samples.
        log_q: (n, ...) log density of each sample under MVN(loc, L L^T).
    """
    d = loc.shape[-1]
    eps = jax.random.normal(key, (n, *loc.shape))
    if d <= _SMALL_DIM:
        z = loc + _matvec_small(scale_tril, eps)
    else:
        z = loc + jnp.squeeze(scale_tril @ eps[..., None], -1)
    half_log_det = jnp.sum(
        jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    log_q = (
        jnp.sum(-0.5 * eps * eps, axis=-1) + d * GAUSSIAN_CONST - half_log_det
    )
    return z, log_q


def mvn_log_prob(z, loc, scale_tril):
    """Generic MVN log-density via triangular solve.

    Args:
        z: (..., d) points (may have extra leading axes vs loc).
        loc: (..., d) mean.
        scale_tril: (..., d, d) lower-triangular scale.

    Returns:
        (...) log densities, broadcasting z against loc.
    """
    d = z.shape[-1]
    diff = z - loc
    if d <= _SMALL_DIM:
        u = _tri_solve_small(scale_tril, diff)
    else:
        # Broadcast L against the (possibly larger) batch shape of diff —
        # triangular_solve requires matching batch dims.
        L = jnp.broadcast_to(scale_tril, (*diff.shape[:-1], d, d))
        u = jax.scipy.linalg.solve_triangular(
            L, diff[..., None], lower=True
        )[..., 0]
    half_log_det = jnp.sum(
        jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    return jnp.sum(-0.5 * u * u, axis=-1) + d * GAUSSIAN_CONST - half_log_det
