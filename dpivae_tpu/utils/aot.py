"""Disk-backed ahead-of-time (AOT) executable cache.

Study-latency context (BASELINE.md phase breakdown): before any device work
dispatches, the first chunk of a training sweep pays Python trace+lower
(~5-7 s for the 11-member x 20k-iter program) plus XLA compilation — ~3 s
when the persistent compile cache hits, ~30 s when it misses — all on one
host core. ``jax.experimental.serialize_executable`` can pickle the
*compiled* executable; ``deserialize_and_load`` costs ~1-2 s and skips
tracing, lowering, and compilation entirely (measured cross-process:
``benchmarks/experiments/aot_probe.py``). Caveat measured at study scale:
the executable bytes still have to reach the device — through a tunneled
backend (axon) that first-call upload costs size/bandwidth (56 MB at
1.5-10 MB/s = 6-35 s) and can exceed the compile it replaces, so
``enabled()`` defaults the cache off there.

Staleness safety: the XLA persistent cache keys on the HLO hash, which
tracks code changes automatically. A config-keyed executable cache has no
HLO to hash — it would happily serve a stale program after a model-code
edit. So every cache key here includes a digest of the whole ``dpivae_tpu``
package source, the jax/jaxlib versions, the backend platform version and
device kind/count, and the compilation-relevant global flags. Any of those
changing is a miss; stale entries age out by mtime-based pruning.

Correctness safety: a compiled executable is exact-shape/dtype/device
specialized, so keys include the full flattened argument signature, and any
failure to serialize, load, or execute falls back to the plain jitted
callable (the cache can only ever cost time, not correctness).
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
import sys
import tempfile

import jax

from dpivae_tpu.utils.jit_cache import JitLRU

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Loaded executables per process (keyed by the same digest as the disk
# entry): repeat sweeps must not re-deserialize per call.
_MEM = JitLRU(maxsize=32)

_DEFAULT_MAX_MB = 4096.0


def cache_dir() -> str:
    return os.environ.get(
        "DPIVAE_AOT_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dpivae_tpu_aot"),
    )


def enabled() -> bool:
    """AOT caching defaults on for *local* accelerator backends only.

    CPU runs (tests, hermetic dryruns) are compile-cheap and must not
    leave executable files behind. The tunneled TPU proxy (axon) is
    excluded too, on measurement: a loaded executable must be shipped to
    the remote TPU server on first call, and at the tunnel's 1.5-10 MB/s
    the 56 MB sweep-chunk program costs 6-35 s — more than the 8-10 s of
    local trace+lower+compile (warm XLA persistent cache) that the AOT
    hit saves (three study-scale A/Bs, 2026-08-17; see
    docs/PERFORMANCE.md). On real locally-attached TPUs the load is a
    ~1-2 s PCIe transfer and the cache wins. ``DPIVAE_AOT=0|1`` overrides
    both ways.
    """
    return _default_enabled(
        os.environ.get("DPIVAE_AOT"),
        jax.default_backend(),
        getattr(jax.config, "jax_platforms", None) or "",
    )


def _default_enabled(flag, backend: str, platforms: str) -> bool:
    if flag is not None:
        return flag.strip().lower() not in ("0", "false", "no", "off", "")
    return backend != "cpu" and "axon" not in platforms


@functools.lru_cache(maxsize=None)
def source_digest() -> str:
    """sha256 over every .py file of the installed dpivae_tpu package.

    ~40 files / a few hundred KB — one-time ~10 ms per process. This is
    the staleness guard: an edit anywhere in the package invalidates every
    cached executable (coarse, but executables are cheap to rebuild and
    silently-stale ones are not an option).
    """
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(_PKG_ROOT)):
        dirnames.sort()
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            h.update(os.path.relpath(path, _PKG_ROOT).encode())
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def _env_sig() -> tuple:
    dev = jax.devices()[0]
    try:
        from jax.extend import backend as _jex_backend

        platform_version = _jex_backend.get_backend().platform_version
    except Exception:
        platform_version = "?"
    try:
        import jaxlib

        jaxlib_version = jaxlib.__version__
    except Exception:
        jaxlib_version = "?"
    return (
        jax.__version__,
        jaxlib_version,
        dev.platform,
        dev.device_kind,
        platform_version,
        jax.device_count(),
        # Compilation-relevant global flags (the matmul-precision default
        # changes the emitted HLO; x64 changes dtypes everywhere)
        jax.config.jax_default_matmul_precision,
        jax.config.jax_enable_x64,
    )


def _arg_sig(example_args: tuple) -> str:
    from jax.api_util import shaped_abstractify

    leaves, treedef = jax.tree.flatten(example_args)
    # Placement matters: a compiled executable is specialized to its input
    # shardings, not just shapes — e.g. mesh-sharded params from a previous
    # sweep call must not hit a single-device entry (numpy leaves have no
    # sharding and hash as None).
    return repr((
        str(treedef),
        [(str(shaped_abstractify(l)), str(getattr(l, "sharding", None)))
         for l in leaves],
    ))


def _digest(key_parts: tuple, example_args: tuple) -> str:
    payload = repr((key_parts, _env_sig(), source_digest(),
                    _arg_sig(example_args)))
    return hashlib.sha256(payload.encode()).hexdigest()


def _prune(directory: str, max_mb: float) -> None:
    try:
        entries = []
        with os.scandir(directory) as it:
            for e in it:
                if e.name.endswith(".pkl"):
                    st = e.stat()
                    entries.append((st.st_mtime, st.st_size, e.path))
        total = sum(s for _, s, _ in entries)
        budget = max_mb * 1e6
        for mtime, size, path in sorted(entries):
            if total <= budget:
                break
            os.remove(path)
            total -= size
    except OSError:
        pass  # pruning is best-effort


def _with_call_fallback(exe, build):
    """Wrap a compiled/loaded executable with a call-time jit fallback.

    A compiled executable is stricter than a jitted callable: it rejects
    args whose *placement/sharding* differs from the lowering even when
    shapes match (e.g. params committed to a mesh by an earlier sharded
    call). The cache contract is "can only ever cost time, not
    correctness", so the first call-time failure permanently reroutes this
    entry to the plain jitted callable."""
    state = {"fn": None}

    def call(*args):
        if state["fn"] is not None:
            return state["fn"](*args)
        try:
            return exe(*args)
        except Exception as e:
            print(
                f"[aot] executable rejected the call "
                f"({type(e).__name__}: {e}); falling back to jit",
                file=sys.stderr,
            )
            state["fn"] = build()
            return state["fn"](*args)

    return call


def aot_get(key_parts: tuple, build, example_args: tuple, *, use=None):
    """A callable specialized to ``example_args``' exact signature.

    On a disk hit, the pickled executable is deserialized (~1 s) — no
    trace, no lower, no compile. On a miss, ``build()``'s jitted callable
    is lowered+compiled at ``example_args`` and the executable is written
    back (atomic rename; mtime-ordered pruning bounds the directory at
    ``DPIVAE_AOT_MAX_MB``, default 4096). Any failure at any stage falls
    back to ``build()``'s plain jitted callable.

    ``key_parts`` must capture program identity beyond the arg signature
    (e.g. ``(kind, repr(config), case_name)``); environment/source
    staleness is keyed automatically (see module docstring).

    Thread-safe: concurrent warm threads may race to build the same entry;
    both produce identical files and the atomic rename keeps either.
    """
    if use is None:
        use = enabled()
    if not use:
        return build()

    try:
        digest = _digest(key_parts, example_args)
    except Exception:
        return build()

    def load_or_build():
        from jax.experimental import serialize_executable as se

        directory = cache_dir()
        path = os.path.join(directory, digest + ".pkl")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    triple = pickle.load(f)
                # Executables here are single-device programs lowered on
                # the default device; pin loading to it explicitly — the
                # default (all local devices) makes a multi-device client
                # (e.g. the 8-device virtual CPU test mesh) load the
                # program as 8-way sharded and reject 1-shard args.
                exe = se.deserialize_and_load(
                    *triple, execution_devices=[jax.devices()[0]]
                )
                os.utime(path)  # freshen for mtime-ordered pruning
                return _with_call_fallback(exe, build)
            except Exception as e:
                print(
                    f"[aot] stale/unreadable cache entry {path}: "
                    f"{type(e).__name__}: {e}; recompiling",
                    file=sys.stderr,
                )
                try:
                    os.remove(path)
                except OSError:
                    pass
        jitted = build()
        try:
            compiled = jitted.lower(*example_args).compile()
        except Exception:
            return jitted  # e.g. build() didn't return a jit wrapper
        try:
            triple = se.serialize(compiled)
            os.makedirs(directory, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    pickle.dump(triple, f)
                os.replace(tmp, path)
            except BaseException:
                os.remove(tmp)
                raise
            _prune(
                directory,
                float(os.environ.get("DPIVAE_AOT_MAX_MB", _DEFAULT_MAX_MB)),
            )
        except Exception as e:
            print(
                f"[aot] could not persist executable: "
                f"{type(e).__name__}: {e}",
                file=sys.stderr,
            )
        return _with_call_fallback(compiled, build)

    return _MEM.get(("aot", digest), load_or_build)
