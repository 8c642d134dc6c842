"""Shared compile cache for jitted model.sample calls.

Eval and viz repeatedly sample the model at identical shapes (traversal
loops, repeated metric calls); caching the jitted callable per
(model, shapes, cond, n, grl_alpha) signature amortizes compilation across
the whole evaluation/plotting pipeline.
"""

from __future__ import annotations

import threading
import weakref
from collections import OrderedDict

import jax
import jax.numpy as jnp

# Bounded LRU: each entry pins a compiled executable (and its model closure)
# on the device; evaluation/plotting over many distinct model objects must
# not grow without bound.
_MAX_ENTRIES = 64


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
        self._lock = threading.Lock()

    def get(self, key, build):
        """Return the cached callable for ``key``, building it if absent.

        Thread-safe: program-warming threads (sweep.warm_* running while
        the main thread trains) share these caches. ``build`` runs outside
        the lock — it can trace/compile for seconds and must not block
        unrelated lookups; a lost race builds twice but both callers get
        the one stored entry.
        """
        with self._lock:
            fn = self._entries.get(key)
            if fn is not None:
                self._entries.move_to_end(key)
                return fn
        fn = build()
        with self._lock:
            fn = self._entries.setdefault(key, fn)
            self._entries.move_to_end(key)
            while len(self._entries) > self._max:
                self._entries.popitem(last=False)
            return fn

    def replace(self, key, fn) -> None:
        """Overwrite ``key`` with ``fn`` under the lock (LRU-consistent)."""
        with self._lock:
            self._entries[key] = fn
            self._entries.move_to_end(key)
            while len(self._entries) > self._max:
                self._entries.popitem(last=False)

    def __len__(self) -> int:
        return len(self._entries)


_MEAN_CACHE = JitLRU(_MAX_ENTRIES)


def _model_cached(cache, sig, model, build):
    """Cache lookup keyed on ``sig`` (which includes ``id(model)``) with a
    weakref identity check: a recycled id — the original model object was
    garbage-collected and a new one reused the address — must NOT return
    the stale compiled closure (it would silently apply the old model's
    fitted scalers). On mismatch the entry is rebuilt in place."""
    entry = cache.get(sig, lambda: (weakref.ref(model), build()))
    ref, fn = entry
    if ref() is not model:
        fn = build()
        cache.replace(sig, (weakref.ref(model), fn))
    return fn


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

    return _model_cached(_MEAN_CACHE, sig, model, build)(params, key, x, c)


_SAMPLE_CACHE = JitLRU(_MAX_ENTRIES)


def cached_sample(model, params, key, x, c, *, cond: bool, n: int, grl_alpha):
    """model.sample(...) through a compile cache. Returns device arrays."""
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    sig = (id(model), x.shape, c.shape, bool(cond), int(n), float(grl_alpha))

    def build():
        return jax.jit(
            lambda p, k, xx, cc: model.sample(
                p, k, xx, cc, cond=cond, n=n, grl_alpha=grl_alpha
            )
        )

    return _model_cached(_SAMPLE_CACHE, sig, model, build)(params, key, x, c)
