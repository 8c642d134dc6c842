"""Measure where the study's first-chunk overhead goes, and whether AOT
executable serialization (jax.experimental.serialize_executable) can remove
it.

The 66-member disentanglement study's train phase is ~17-25s slower than its
pure device compute; ROADMAP.md attributes the gap to the first chunk's
trace + XLA-persistent-cache load and calls it "irreducible without ...
ahead-of-time serialization of the traced program". This probe measures, for
the exact first-chunk program of the study (oscillator dpivae preset,
chunk of 11 members x 20k iters):

  1. build        — Python closure construction (build_member_fn + vmap)
  2. trace+lower  — jax.jit(...).lower(*args)  (pure host Python work)
  3. compile      — lowered.compile()          (hits the warm persistent
                    XLA compile cache when one exists)
  4. serialize    — serialize_executable.serialize(compiled)
  5. deserialize  — serialize_executable.deserialize_and_load(...)
  6. run          — one chunk execution of each of compiled/deserialized

If (2)+(3) >> (5), an on-disk executable cache pays; if (5) ~= (3) the XLA
persistent cache already captures most of the win and only the trace+lower
share is recoverable.

Usage: python benchmarks/experiments/aot_probe.py [--n_iter 20000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_iter", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=11)
    ap.add_argument("--case", default="damped_oscillator")
    ap.add_argument("--save", default=None,
                    help="pickle the serialized executable here")
    ap.add_argument("--load", default=None,
                    help="SKIP build/trace/compile; load a previously "
                         "saved executable and run it (fresh-process cost)")
    args = ap.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.sweep.sweep import build_member_fn
    from dpivae_tpu.utils import on_host_cpu

    case = get_case(args.case)
    cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, seed=123, n_iter=args.n_iter)
    )

    with on_host_cpu():
        keys = jax.random.split(jax.random.PRNGKey(123), args.chunk)
        keys_h = np.asarray(jax.random.key_data(keys))
    lambdas = np.linspace(-1.0, 1.0, args.chunk).astype(np.float32)

    # device attach (isolated, see CLAUDE.md tunnel-variance note)
    t0 = time.perf_counter()
    import jax.numpy as jnp

    float(np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros(()))))
    log(f"device_init: {time.perf_counter() - t0:.1f}s")

    keys_dev = jax.random.wrap_key_data(jnp.asarray(keys_h))
    lam_dev = jnp.asarray(lambdas)

    def force(out):
        return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    if args.load:
        import pickle

        from jax.experimental import serialize_executable as se

        t0 = time.perf_counter()
        with open(args.load, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        log(f"disk read+unpickle: {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        log(f"deserialize_and_load: {time.perf_counter() - t0:.2f}s")
        for i in range(2):
            # Dispatch-only vs force: does a loaded executable's call
            # return before the program finishes (async, like the jit
            # fastpath) or block until completion? The chunked sweep's
            # dispatch/force split depends on the answer.
            t0 = time.perf_counter()
            out = loaded(keys_dev, lam_dev)
            t_disp = time.perf_counter() - t0
            t0 = time.perf_counter()
            force(out)
            log(f"run {i}: dispatch {t_disp:.2f}s + wait "
                f"{time.perf_counter() - t0:.2f}s")
        return

    t0 = time.perf_counter()
    member = build_member_fn(cfg, case)
    jitted = jax.jit(jax.vmap(member))
    log(f"build: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    lowered = jitted.lower(keys_dev, lam_dev)
    t_lower = time.perf_counter() - t0
    log(f"trace+lower: {t_lower:.2f}s")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"compile (persistent cache state as-is): {t_compile:.2f}s")

    from jax.experimental import serialize_executable as se

    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    t_ser = time.perf_counter() - t0
    log(f"serialize: {t_ser:.2f}s ({len(payload) / 1e6:.1f} MB)")

    t0 = time.perf_counter()
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    t_deser = time.perf_counter() - t0
    log(f"deserialize_and_load: {t_deser:.2f}s")

    if args.save:
        import pickle

        t0 = time.perf_counter()
        with open(args.save, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        log(f"pickle to {args.save}: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    force(compiled(keys_dev, lam_dev))
    log(f"run compiled: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    force(loaded(keys_dev, lam_dev))
    log(f"run deserialized: {time.perf_counter() - t0:.2f}s")

    # Does the loaded executable accept host (numpy) args like jit does?
    try:
        t0 = time.perf_counter()
        force(loaded(jax.random.wrap_key_data(jnp.asarray(keys_h)), lambdas))
        log(f"run deserialized (host lambdas): {time.perf_counter() - t0:.2f}s")
    except Exception as e:
        log(f"host-arg call failed: {type(e).__name__}: {e}")

    log(
        f"SUMMARY trace+lower={t_lower:.2f}s compile={t_compile:.2f}s "
        f"serialize={t_ser:.2f}s deserialize={t_deser:.2f}s"
    )


if __name__ == "__main__":
    main()
