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
    "wait_for_device",
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


def wait_for_device(total_budget_s: float = 3600.0) -> bool:
    """Block until the tunneled accelerator is reachable (bounded).

    A third environment fault class, beyond the two raised ones above:
    device attach can HANG indefinitely inside C++ (tunnel outage observed
    for hours, 2026-08-18), which no in-process retry or exception handler
    can recover — the hung call cannot be cancelled. So reachability is
    probed in a SUBPROCESS with a hard timeout; only when a probe attaches
    and executes one op does the caller proceed (paying a normal
    re-attach). No-op (True) unless the axon tunnel environment is present
    (querying the backend in-process would itself risk the hang, so the
    gate reads the environment, not jax).

    Returns True once a probe succeeds; False on budget exhaustion
    (``DPIVAE_DEVICE_WAIT_S`` overrides the budget). Never raises and
    never hangs in-process — callers decide what an unreachable device
    means (``run_with_healing(wait_device=True)`` raises: proceeding
    would hang forever inside the C++ attach, and an unattended caller
    is better served by a loud nonzero exit than a silent hang).
    """
    import os
    import subprocess

    if not ("axon" in os.environ.get("JAX_PLATFORMS", "")
            or os.environ.get("PALLAS_AXON_POOL_IPS")):
        return True
    total_budget_s = float(
        os.environ.get("DPIVAE_DEVICE_WAIT_S", total_budget_s)
    )
    probe = (
        "import jax, numpy as np;"
        "float(np.asarray(jax.jit(lambda a: a + 1)(jax.numpy.zeros(()))));"
        "print('ok')"
    )
    deadline = time.monotonic() + total_budget_s
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        try:
            # Per-probe cap must exceed the slowest HEALTHY attach ever
            # observed (649 s, BASELINE.md) — killing a slow-but-live
            # attach would misclassify it as a hang forever. Every probe
            # therefore gets the full 900 s even near the deadline (the
            # budget bounds when NEW probes start, and may be overshot by
            # at most one probe).
            res = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=900,
            )
            if res.returncode == 0 and "ok" in res.stdout:
                if attempt > 1:
                    print(f"device reachable after {attempt} probes",
                          file=sys.stderr, flush=True)
                return True
            msg = (res.stderr or res.stdout).strip().splitlines()
            msg = msg[-1] if msg else "?"
        except subprocess.TimeoutExpired:
            msg = "attach hang (probe timeout)"
        print(f"device unreachable (attempt {attempt}): {msg}; retrying",
              file=sys.stderr, flush=True)
        time.sleep(60)
    print("device probe budget exhausted; still unreachable",
          file=sys.stderr, flush=True)
    return False


def run_with_healing(fn, *, transient_delay_s: float = 240.0,
                     wait_device: bool = False):
    """Run ``fn()``; self-heal once per known environment fault class.

    - Stale-cache fault: clear the persistent cache, retry immediately.
    - Transient tunnel fault: sleep ``transient_delay_s``, retry.
    - Anything else — including a second fault of a class already healed —
      propagates: deterministic bugs must fail loudly, not loop.

    ``wait_device=True`` additionally rides out attach *hangs* by waiting
    for a subprocess reachability probe before the first attempt and
    before the transient retry (see ``wait_for_device``). If the probe
    budget exhausts with the device still unreachable, raises
    RuntimeError instead of proceeding: the next device op would hang
    forever inside the C++ attach, and unattended callers (bench.py, the
    study scripts) need a loud nonzero exit, not a silent hang.
    """

    def _require_device():
        if not wait_for_device():
            raise RuntimeError(
                "TPU tunnel unreachable after the device probe budget "
                "(DPIVAE_DEVICE_WAIT_S, default 3600s) — refusing to "
                "proceed into an uncancellable attach hang"
            )

    if wait_device:
        _require_device()
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
                if wait_device:
                    _require_device()
                continue
            raise
