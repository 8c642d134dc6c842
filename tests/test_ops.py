"""Tests for gradient reversal and full-covariance MVN ops."""

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.ops import grad_reverse, mvn_log_prob, mvn_sample_with_log_prob


def test_grad_reverse_identity_forward():
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_allclose(
        np.asarray(grad_reverse(x, jnp.asarray(0.5))), np.asarray(x)
    )


def test_grad_reverse_backward_scales_negative():
    alpha = 1 / 256

    def f(x):
        return jnp.sum(grad_reverse(x, jnp.asarray(alpha)) ** 2)

    x = jnp.array([1.0, -2.0, 3.0])
    g = jax.grad(f)(x)
    # d/dx sum(grl(x)^2): cotangent 2x flows through GRL -> -alpha * 2x
    np.testing.assert_allclose(np.asarray(g), -alpha * 2 * np.asarray(x), rtol=1e-6)


def test_grad_reverse_negative_alpha_is_plain_gradient():
    # The "vae" presets use lambda_g0 = -1.0: GRL becomes the identity in the
    # backward pass too (ref: cases/simple_beam/__init__.py:146-147)
    def f(x):
        return jnp.sum(grad_reverse(x, jnp.asarray(-1.0)) ** 2)

    x = jnp.array([1.0, -2.0])
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)), 2 * np.asarray(x))


def test_grad_reverse_vmappable_alpha():
    # λ-sweeps vmap over alpha (SURVEY.md §7)
    def loss(alpha):
        x = jnp.ones(3)
        return jnp.sum(grad_reverse(x, alpha) * x)

    alphas = jnp.array([0.1, 1.0, -1.0])
    grads = jax.vmap(jax.grad(lambda a: loss(a)))(alphas)
    # gradient w.r.t. alpha itself is zero (alpha gets no cotangent)
    np.testing.assert_allclose(np.asarray(grads), 0.0)


def _random_tril(key, d):
    a = jax.random.normal(key, (d, d)) * 0.3
    return jnp.tril(a, -1) + jnp.eye(d) * (0.5 + jnp.abs(jnp.diag(a)))


def test_mvn_log_prob_matches_scipy():
    from scipy.stats import multivariate_normal

    key = jax.random.PRNGKey(0)
    d = 4
    loc = jax.random.normal(key, (d,))
    L = _random_tril(jax.random.PRNGKey(1), d)
    cov = np.asarray(L @ L.T, dtype=np.float64)
    z = jax.random.normal(jax.random.PRNGKey(2), (7, d))
    got = np.asarray(mvn_log_prob(z, loc, L))
    want = multivariate_normal(np.asarray(loc, np.float64), cov).logpdf(
        np.asarray(z, np.float64)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mvn_sample_log_prob_consistency():
    """Noise-based log q must equal the generic density at the samples."""
    key = jax.random.PRNGKey(0)
    d, batch, n = 3, 5, 10
    loc = jax.random.normal(jax.random.PRNGKey(1), (batch, d))
    L = jax.vmap(lambda k: _random_tril(k, d))(jax.random.split(jax.random.PRNGKey(2), batch))
    z, log_q = mvn_sample_with_log_prob(key, loc, L, n)
    assert z.shape == (n, batch, d)
    assert log_q.shape == (n, batch)
    log_q_generic = mvn_log_prob(z, loc, L)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q_generic), rtol=2e-4, atol=2e-5)


def test_mvn_sample_moments():
    key = jax.random.PRNGKey(3)
    d = 2
    loc = jnp.array([1.0, -2.0])
    L = jnp.array([[0.5, 0.0], [0.3, 0.8]])
    z, _ = mvn_sample_with_log_prob(key, loc, L, 20000)
    emp_mean = np.mean(np.asarray(z), axis=0)
    emp_cov = np.cov(np.asarray(z).T)
    np.testing.assert_allclose(emp_mean, np.asarray(loc), atol=0.02)
    np.testing.assert_allclose(emp_cov, np.asarray(L @ L.T), atol=0.03)


def test_mvn_large_dim_fallback_branch():
    """d > 16 takes the solve_triangular path; must agree with the
    unrolled small-dim path's math (checked against scipy)."""
    from scipy.stats import multivariate_normal

    d = 24  # above _SMALL_DIM
    rng = np.random.RandomState(3)
    A = rng.randn(d, d).astype(np.float32) * 0.1
    L = np.tril(A, -1) + np.eye(d, dtype=np.float32) * (1.0 + np.abs(np.diag(A)))
    loc = rng.randn(d).astype(np.float32)
    z = rng.randn(5, d).astype(np.float32)
    got = np.asarray(mvn_log_prob(jnp.asarray(z), jnp.asarray(loc), jnp.asarray(L)))
    want = multivariate_normal(loc.astype(np.float64), (L @ L.T).astype(np.float64)).logpdf(z.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3)

    # sampling branch too
    zz, log_q = mvn_sample_with_log_prob(jax.random.PRNGKey(0), jnp.asarray(loc), jnp.asarray(L), 4)
    assert zz.shape == (4, d)
    np.testing.assert_allclose(
        np.asarray(log_q), np.asarray(mvn_log_prob(zz, jnp.asarray(loc), jnp.asarray(L))),
        rtol=1e-3, atol=1e-4,
    )


def test_mvn_matches_torch_distributions():
    """Golden parity: log densities agree with torch.distributions."""
    import torch

    d = 3
    rng = np.random.RandomState(0)
    loc = rng.randn(d).astype(np.float32)
    A = rng.randn(d, d).astype(np.float32) * 0.3
    L = np.tril(A, -1) + np.eye(d, dtype=np.float32) * (0.5 + np.abs(np.diag(A)))
    z = rng.randn(6, d).astype(np.float32)

    want = (
        torch.distributions.MultivariateNormal(
            torch.from_numpy(loc), scale_tril=torch.from_numpy(L)
        )
        .log_prob(torch.from_numpy(z))
        .numpy()
    )
    got = np.asarray(mvn_log_prob(jnp.asarray(z), jnp.asarray(loc), jnp.asarray(L)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
