"""Annealing schedules vs the reference formulas (golden against torch/numpy)."""

import numpy as np

from dpivae_tpu.config import AnnealingConfig
from dpivae_tpu.utils.annealing import (
    constant_schedule,
    cyclical_schedule,
    make_schedule,
    sigmoid_schedule,
)


def _reference_cyclical(it, n_iter, n_cycles, R):
    tau = np.mod(it, n_iter / n_cycles) / (n_iter / n_cycles)
    return tau / R if tau <= R else 1.0


def _reference_sigmoid(it, n_iter, mu, cov):
    from scipy.stats import norm

    mu_t = mu * n_iter
    return norm(mu_t, mu_t * cov).cdf(it)


def test_constant():
    s = constant_schedule(1.0)
    assert float(s(0)) == 1.0
    assert float(s(19999)) == 1.0


def test_cyclical_matches_reference():
    n_iter, n_cycles, R = 20000, 5, 0.5
    s = cyclical_schedule(n_iter, n_cycles, R)
    for it in [0, 1, 999, 1000, 2000, 3999, 4000, 10000, 19999]:
        np.testing.assert_allclose(
            float(s(it)), _reference_cyclical(it, n_iter, n_cycles, R), rtol=1e-5
        )


def test_sigmoid_matches_reference():
    n_iter, mu, cov = 20000, 0.15, 0.15
    s = sigmoid_schedule(n_iter, mu, cov)
    for it in [0, 500, 3000, 5000, 10000, 19999]:
        np.testing.assert_allclose(
            float(s(it)), _reference_sigmoid(it, n_iter, mu, cov), atol=1e-5
        )


def test_make_schedule_dispatch():
    assert float(make_schedule(AnnealingConfig(type=None), 100)(50)) == 1.0
    assert float(make_schedule(AnnealingConfig(type="None"), 100)(50)) == 1.0
    s = make_schedule(AnnealingConfig(type="cyclical", n_cycles=2, R=0.5), 100)
    np.testing.assert_allclose(float(s(25)), 1.0)
    try:
        make_schedule(AnnealingConfig(type="bogus"), 100)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_schedules_jittable_and_vectorized():
    import jax
    import jax.numpy as jnp

    s = cyclical_schedule(20000, 5, 0.5)
    vals = jax.jit(jax.vmap(s))(jnp.arange(100))
    assert vals.shape == (100,)
