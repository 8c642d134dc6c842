"""Annealing schedules as pure ``step -> weight`` functions.

Jittable re-design of the reference's ``Annealing`` class (reference
utils/annealing.py:6-52). Each factory returns a closure mapping a (traced)
iteration index to a scalar weight, so schedules fold directly into the fused
train step and can be vmapped across sweep members.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from dpivae_tpu.config import AnnealingConfig
from dpivae_tpu.utils.distributions import Normal

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant_schedule(value: float = 1.0) -> Schedule:
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), value)

    # Marker letting jitted consumers fold the multiplier to a Python
    # constant at trace time (the default "no annealing" config then costs
    # zero ops per step).
    schedule.constant_value = value
    return schedule


def cyclical_schedule(n_iter: int, n_cycles: int, R: float) -> Schedule:
    """Cyclical ramp (Fu et al. 2019; ref: utils/annealing.py:22-38).

    Within each cycle of length n_iter/n_cycles the weight ramps linearly to
    1.0 over the first fraction ``R`` of the cycle, then holds at 1.0.
    """
    cycle_len = n_iter / n_cycles

    def schedule(step):
        tau = jnp.mod(jnp.asarray(step, jnp.float32), cycle_len) / cycle_len
        return jnp.where(tau <= R, tau / R, 1.0)

    return schedule


def sigmoid_schedule(n_iter: int, mu: float, cov: float) -> Schedule:
    """Normal-CDF ramp with midpoint mu*n_iter, spread mu*n_iter*cov
    (ref: utils/annealing.py:41-52)."""
    mu_t = mu * n_iter
    sigma_t = mu_t * cov
    dist = Normal(mu_t, sigma_t)

    def schedule(step):
        return dist.cdf(jnp.asarray(step, jnp.float32))

    return schedule


def make_schedule(cfg: AnnealingConfig, n_iter: int) -> Schedule:
    """Build a schedule from config (ref: utils/annealing.py:12-20)."""
    t: Optional[str] = cfg.type
    if t is None or t in ("none", "None"):
        return constant_schedule(1.0)
    if t == "cyclical":
        return cyclical_schedule(n_iter, cfg.n_cycles, cfg.R)
    if t == "sigmoid":
        return sigmoid_schedule(n_iter, cfg.mu, cfg.cov)
    raise ValueError(f"Invalid type {t}")
