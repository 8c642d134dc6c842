"""Minimal jit-safe 1-D distribution library.

The reference leans on ``torch.distributions`` (Uniform, Normal,
MixtureSameFamily) for ground-truth sampling, fixed priors, and traversal
bounds (reference utils/priors.py). distrax is not available in this image,
and the handful of required densities are trivial, so they live here as
static-shape, jit-compatible pytree-free dataclasses.

All distributions broadcast: parameters may be scalars or arrays and
``sample``/``log_prob``/``icdf`` follow numpy broadcasting. ``sample`` takes
an explicit ``jax.random`` key (the reference uses torch's implicit global
RNG — see SURVEY.md §7 "RNG discipline").
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.utils import GAUSSIAN_CONST


@dataclasses.dataclass(frozen=True)
class Normal:
    loc: float
    scale: float

    def sample(self, key, shape: Tuple[int, ...] = ()):
        return self.loc + self.scale * jax.random.normal(key, shape)

    def log_prob(self, z):
        zn = (z - self.loc) / self.scale
        return -0.5 * zn * zn + GAUSSIAN_CONST - jnp.log(self.scale)

    def icdf(self, u):
        return self.loc + self.scale * jnp.sqrt(2.0) * jax.scipy.special.erfinv(
            2.0 * jnp.asarray(u) - 1.0
        )

    def cdf(self, z):
        return 0.5 * (1.0 + jax.scipy.special.erf((jnp.asarray(z) - self.loc) / (self.scale * jnp.sqrt(2.0))))


@dataclasses.dataclass(frozen=True)
class Uniform:
    low: float
    high: float

    def sample(self, key, shape: Tuple[int, ...] = ()):
        return jax.random.uniform(
            key, shape, minval=self.low, maxval=self.high
        )

    def log_prob(self, z):
        z = jnp.asarray(z)
        inside = (z >= self.low) & (z <= self.high)
        return jnp.where(inside, -jnp.log(jnp.asarray(self.high - self.low)), -jnp.inf)

    def icdf(self, u):
        return self.low + (self.high - self.low) * jnp.asarray(u)

    def cdf(self, z):
        return jnp.clip((jnp.asarray(z) - self.low) / (self.high - self.low), 0.0, 1.0)


class MarginalDistribution:
    """Product of independent 1-D distributions over the last axis
    (ref: utils/priors.py:7-36).

    ``log_prob`` returns the *per-dimension* log density (not summed) to match
    the reference contract — callers sum over the last axis
    (ref: models/vae.py:201).
    """

    def __init__(self, distributions: Sequence):
        self.distributions = tuple(distributions)
        self.n_z = len(self.distributions)

    def log_prob(self, z):
        return jnp.stack(
            [d.log_prob(z[..., i]) for i, d in enumerate(self.distributions)],
            axis=-1,
        )

    def icdf(self, u):
        u = jnp.atleast_2d(jnp.asarray(u))
        return jnp.stack(
            [d.icdf(u[..., i]) for i, d in enumerate(self.distributions)],
            axis=-1,
        )

    def sample(self, key, shape: Tuple[int, ...] = ()):
        keys = jax.random.split(key, self.n_z)
        return jnp.stack(
            [d.sample(k, shape) for d, k in zip(self.distributions, keys)],
            axis=-1,
        )


@dataclasses.dataclass(frozen=True)
class BoxUniform:
    """Independent uniform over a box; ``low``/``high`` are 1-D arrays."""

    low: jnp.ndarray
    high: jnp.ndarray

    def sample(self, key, shape: Tuple[int, ...] = ()):
        low = jnp.asarray(self.low)
        return low + (jnp.asarray(self.high) - low) * jax.random.uniform(
            key, (*shape, low.shape[-1])
        )

    def log_prob(self, z):
        lp = Uniform(self.low, self.high).log_prob(z)
        return jnp.sum(lp, axis=-1)


@dataclasses.dataclass(frozen=True)
class UniformBoxMixture:
    """Equal-weight mixture of axis-aligned uniform boxes.

    Replaces the reference's ``MixtureSameFamily(Categorical,
    Independent(Uniform))`` used for the 4-quadrant transfer splits
    (ref: utils/priors.py:110-111). ``lows``/``highs`` have shape
    (n_components, n_dims).
    """

    lows: jnp.ndarray
    highs: jnp.ndarray

    def sample(self, key, shape: Tuple[int, ...] = ()):
        k_comp, k_unif = jax.random.split(key)
        lows = jnp.asarray(self.lows)
        highs = jnp.asarray(self.highs)
        n_comp, n_dim = lows.shape
        comp = jax.random.randint(k_comp, shape, 0, n_comp)
        u = jax.random.uniform(k_unif, (*shape, n_dim))
        low = lows[comp]
        high = highs[comp]
        return low + (high - low) * u

    def log_prob(self, z):
        lows = jnp.asarray(self.lows)[:, None, :]
        highs = jnp.asarray(self.highs)[:, None, :]
        z = jnp.asarray(z)[None, ...]
        per_comp = jnp.sum(Uniform(lows, highs).log_prob(z), axis=-1)
        n_comp = self.lows.shape[0]
        return jax.scipy.special.logsumexp(per_comp, axis=0) - jnp.log(float(n_comp))


@dataclasses.dataclass(frozen=True)
class MixtureSameFamily:
    """Weighted mixture of same-family components — the general analogue
    of the reference's ``torch.distributions.MixtureSameFamily``
    (ref: utils/priors.py:110-111, which instantiates it equal-weight over
    uniform boxes; this version supports arbitrary weights and any
    component with the ``sample``/``log_prob`` protocol, including
    vector-event components like ``BoxUniform``).
    """

    weights: Tuple[float, ...]
    components: Tuple

    def __post_init__(self):
        if len(self.weights) != len(self.components):
            raise ValueError("weights and components length mismatch")
        # Validate eagerly: negative or zero-sum weights would produce NaN
        # log-weights that silently propagate through sample/log_prob.
        # Traced weights (construction inside jit/vmap) can't be checked
        # eagerly — skip, preserving traceability; concrete device arrays
        # validate with ONE host transfer, not one float() per element.
        if any(isinstance(w, jax.core.Tracer)
               for w in jax.tree.leaves(self.weights)):
            return
        w = np.asarray(self.weights, np.float64)
        if (w < 0.0).any():
            raise ValueError("mixture weights must be non-negative")
        if not w.sum() > 0.0:
            raise ValueError("mixture weights must have a positive sum")

    def _log_weights(self):
        w = jnp.asarray(self.weights, jnp.float32)
        return jnp.log(w / jnp.sum(w))

    def sample(self, key, shape: Tuple[int, ...] = ()):
        k_comp, k_samp = jax.random.split(key)
        n_comp = len(self.components)
        comp = jax.random.categorical(k_comp, self._log_weights(), shape=shape)
        keys = jax.random.split(k_samp, n_comp)
        samples = jnp.stack(
            [c.sample(k, shape) for c, k in zip(self.components, keys)], axis=0
        )
        onehot = jax.nn.one_hot(comp, n_comp, axis=0, dtype=samples.dtype)
        onehot = jnp.reshape(
            onehot, onehot.shape + (1,) * (samples.ndim - onehot.ndim)
        )
        return jnp.sum(onehot * samples, axis=0)

    def log_prob(self, z):
        per_comp = jnp.stack([c.log_prob(z) for c in self.components], axis=0)
        logw = jnp.reshape(
            self._log_weights(), (-1,) + (1,) * (per_comp.ndim - 1)
        )
        return jax.scipy.special.logsumexp(per_comp + logw, axis=0)


_DIST_REGISTRY = {
    "normal": Normal,
    "uniform": Uniform,
}


def make_distribution(name: str, **kwargs):
    """Build a distribution from a declarative spec name.

    Case factor tables use string specs (``{"dist": "uniform", "args":
    {"low": ..., "high": ...}}``) instead of the reference's direct
    ``torch.distributions`` class references (ref: cases/simple_beam/
    __init__.py:25-66), keeping case definitions serializable. Mixtures
    nest component specs::

        make_distribution("mixture", weights=[0.3, 0.7],
                          components=[{"dist": "normal",
                                       "args": {"loc": 0., "scale": 1.}},
                                      {"dist": "uniform",
                                       "args": {"low": 2., "high": 3.}}])
    """
    if name.lower() == "mixture":
        comps = tuple(
            make_distribution(spec["dist"], **spec.get("args", {}))
            for spec in kwargs.pop("components")
        )
        return MixtureSameFamily(tuple(kwargs.pop("weights")), comps)
    return _DIST_REGISTRY[name.lower()](**kwargs)
