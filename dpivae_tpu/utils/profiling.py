"""Profiling helpers.

The reference has no tracing/profiling beyond a tqdm bar (SURVEY.md §5).
The TPU build exposes jax.profiler traces and a persistent compilation
cache as first-class utilities.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


def enable_compilation_cache(path: str = "~/.cache/dpivae_tpu_xla") -> None:
    """Persist compiled XLA programs across processes — the fused training
    scan compiles in tens of seconds; caching makes reruns instant."""
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dpivae_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = ""):
    """Wall-clock a block, blocking on async dispatch at exit."""
    t0 = time.perf_counter()
    result = {}
    try:
        yield result
    finally:
        result["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[{label}] {result['seconds']:.3f}s")
