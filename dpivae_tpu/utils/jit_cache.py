"""Shared compile cache for jitted model.sample calls.

Eval and viz repeatedly sample the model at identical shapes (traversal
loops, repeated metric calls); caching the jitted callable per
(model, shapes, cond, n, grl_alpha) signature amortizes compilation across
the whole evaluation/plotting pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CACHE: dict = {}


def cached_sample(model, params, key, x, c, *, cond: bool, n: int, grl_alpha):
    """model.sample(...) through a compile cache. Returns device arrays."""
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    sig = (id(model), x.shape, c.shape, bool(cond), int(n), float(grl_alpha))
    if sig not in _CACHE:
        _CACHE[sig] = jax.jit(
            lambda p, k, xx, cc: model.sample(
                p, k, xx, cc, cond=cond, n=n, grl_alpha=grl_alpha
            )
        )
    return _CACHE[sig](params, key, x, c)
