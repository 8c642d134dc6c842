"""Self-healing around the two known environment fault classes.

The tunneled TPU backend has two failure modes that are *not* bugs in the
program being run:

1. **Transient transport faults** — the tunnel drops or the device wedges
   (``UNAVAILABLE: TPU device error`` and friends); the device self-heals
   within a few minutes. Correct response: wait, retry once.
2. **Stale persistent-compilation-cache entries** — after a rolling libtpu
   upgrade, AOT executables written by the previous build fault with
   ``FAILED_PRECONDITION: libtpu version mismatch`` on *every* run until the
   cache is cleared (observed as the round-1 driver failure,
   MULTICHIP_r01.json). Correct response: clear the cache, retry
   immediately — waiting cannot help.

``run_with_healing`` dispatches on the fault class; any other exception
(i.e. a deterministic bug) propagates unchanged, so retry loops never mask
real regressions.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

__all__ = [
    "is_transient_tpu_fault",
    "is_stale_cache_fault",
    "clear_compilation_cache",
    "run_with_healing",
]

# Substrings of the known transient tunnel/device fault messages. Matched
# against str(exc) of jax.errors.JaxRuntimeError / XlaRuntimeError.
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "TPU device error",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "connection reset",
)

_STALE_CACHE_MARKERS = (
    "libtpu version mismatch",
    "AOT-compiled executable",
)


def _matches(exc: BaseException, markers: tuple[str, ...]) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(m.lower() in msg.lower() for m in markers)


def is_transient_tpu_fault(exc: BaseException) -> bool:
    """True for tunnel/device faults that self-heal with time."""
    return _matches(exc, _TRANSIENT_MARKERS)


def is_stale_cache_fault(exc: BaseException) -> bool:
    """True for persistent-compilation-cache/libtpu build mismatches."""
    return _matches(exc, _STALE_CACHE_MARKERS)


def clear_compilation_cache() -> str | None:
    """Delete the persistent XLA compilation cache directory (if enabled).

    Returns the cleared directory, or None if no cache is configured. Also
    drops jax's in-process jit caches so retried programs re-compile rather
    than re-load the faulted executable.
    """
    import jax

    import dpivae_tpu

    cache_dir = getattr(dpivae_tpu, "_compilation_cache_dir", None)
    if cache_dir:
        shutil.rmtree(cache_dir, ignore_errors=True)
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.clear_caches()
    return cache_dir


def run_with_healing(fn, *, transient_delay_s: float = 240.0):
    """Run ``fn()``; self-heal once per known environment fault class.

    - Stale-cache fault: clear the persistent cache, retry immediately.
    - Transient tunnel fault: sleep ``transient_delay_s``, retry.
    - Anything else — including a second fault of a class already healed —
      propagates: deterministic bugs must fail loudly, not loop.
    """
    healed: set[str] = set()
    while True:
        try:
            return fn()
        except Exception as exc:
            if is_stale_cache_fault(exc) and "stale_cache" not in healed:
                healed.add("stale_cache")
                cleared = clear_compilation_cache()
                print(
                    f"stale compilation cache fault ({type(exc).__name__}); "
                    f"cleared {cleared}, retrying...",
                    file=sys.stderr,
                )
                continue
            if is_transient_tpu_fault(exc) and "transient" not in healed:
                healed.add("transient")
                print(
                    f"transient TPU fault ({type(exc).__name__}); retrying "
                    f"in {transient_delay_s:.0f}s...",
                    file=sys.stderr,
                )
                time.sleep(transient_delay_s)
                continue
            raise
