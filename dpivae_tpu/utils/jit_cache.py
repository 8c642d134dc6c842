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


class JitLRU:
    """Bounded LRU of built (usually jitted) callables keyed by signature.

    Rebuilding ``jax.jit(...)`` wrappers per call retraces and re-loads the
    executable every time — on the tunneled backend that costs seconds per
    invocation; and an unbounded dict would pin every compiled program ever
    built. One shared pattern for train/sweep/eval program caches.
    """

    def __init__(self, maxsize: int = 64):
        self._max = maxsize
        self._entries: OrderedDict = OrderedDict()

    def get(self, key, build):
        fn = self._entries.get(key)
        if fn is None:
            fn = build()
            self._entries[key] = fn
            while len(self._entries) > self._max:
                self._entries.popitem(last=False)
        else:
            self._entries.move_to_end(key)
        return fn

    def __len__(self) -> int:
        return len(self._entries)


_MEAN_CACHE = JitLRU(_MAX_ENTRIES)


def cached_sample_mean(
    model, params, key, x, c, *, cond: bool, n: int, grl_alpha,
    outputs=(4,),
):
    """MC-mean of selected ``model.sample`` output slots, reduced INSIDE
    the jitted program.

    The full (n_mc, batch, d) sample tensors never materialize as program
    outputs — XLA fuses the reduction — matching the pattern the batched
    sweep eval already uses (sweep/sweep.py reduces in-jit). ``outputs``
    are indices into the 9-tuple ``model.sample`` returns.
    """
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    sig = (
        id(model), x.shape, c.shape, bool(cond), int(n),
        float(grl_alpha), tuple(outputs),
    )

    def build():
        def fn(p, k, xx, cc):
            out = model.sample(p, k, xx, cc, cond=cond, n=n,
                               grl_alpha=grl_alpha)
            return tuple(jnp.mean(out[i], axis=0) for i in outputs)

        return jax.jit(fn)

    return _MEAN_CACHE.get(sig, build)(params, key, x, c)


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
