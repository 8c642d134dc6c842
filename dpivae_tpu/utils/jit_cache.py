"""Shared compile cache for jitted model.sample calls.

Eval and viz repeatedly sample the model at identical shapes (traversal
loops, repeated metric calls); caching the jitted callable per
(model, shapes, cond, n, grl_alpha) signature amortizes compilation across
the whole evaluation/plotting pipeline.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp

# Bounded LRU: each entry pins a compiled executable (and its model closure)
# on the device; evaluation/plotting over many distinct model objects must
# not grow without bound.
_MAX_ENTRIES = 64
_CACHE: OrderedDict = OrderedDict()


def cached_sample(model, params, key, x, c, *, cond: bool, n: int, grl_alpha):
    """model.sample(...) through a compile cache. Returns device arrays."""
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    sig = (id(model), x.shape, c.shape, bool(cond), int(n), float(grl_alpha))
    fn = _CACHE.get(sig)
    if fn is None:
        fn = jax.jit(
            lambda p, k, xx, cc: model.sample(
                p, k, xx, cc, cond=cond, n=n, grl_alpha=grl_alpha
            )
        )
        _CACHE[sig] = fn
        while len(_CACHE) > _MAX_ENTRIES:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(sig)
    return fn(params, key, x, c)
