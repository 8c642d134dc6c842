"""Measure the vmapped-sweep Pallas regime (both use_pallas arms).

``sweep._resolve_sweep_config`` pins ``use_pallas="auto"`` to the XLA path
because the vmapped member program was never measured: under vmap the
member axis folds into the fused-MLP kernel's row dimension, so a chunk of
C members at reference shapes presents C x n_mc x n_batch rows — exactly
the regime the single-run win band (rows >= 65536, hidden == 256) claims.
This experiment times the ACTUAL chunk program train_sweep runs
(``jax.vmap(build_member_fn(...))``) with use_pallas forced on/off across:

- member chunk in {11, 22, 64}  (11 = the shipping study's chunk;
  64 x 1024 rows/member = 65536 effective rows, the single-run band edge)
- hidden_width in {None (reference 64-128), 256 (the band width), 512}

Timing protocol mirrors the scaling grid: compile, warmup run, best-of-3
timed runs at a short n_iter. Writes benchmarks/results/sweep_pallas.json
(incrementally) — the numbers that back whatever rule
``_resolve_sweep_config`` ships.

Usage:
    python benchmarks/experiments/sweep_pallas.py           # full grid (TPU)
    python benchmarks/experiments/sweep_pallas.py --chunks 11 --widths 0
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

CHUNKS = (11, 22, 64)
WIDTHS = (0, 256, 512)  # 0 = reference architecture (hidden_width=None)


def measure_cell(case, base_cfg, chunk: int, width: int, n_iter: int):
    import jax

    from dpivae_tpu.sweep.sweep import build_member_fn
    from dpivae_tpu.utils import on_host_cpu

    cfg = base_cfg.replace(
        n_iter=n_iter, hidden_width=width or None,
    )
    with on_host_cpu():
        keys = jax.random.split(jax.random.PRNGKey(0), chunk)
        keys = np.asarray(jax.random.key_data(keys))
        lams = np.linspace(-1.0, 1.0, chunk).astype(np.float32)

    row = {
        "chunk": chunk,
        "hidden_width": width or None,
        "n_iter": n_iter,
        "rows_per_member": cfg.n_mc_train * cfg.n_batch,
        "effective_rows": chunk * cfg.n_mc_train * cfg.n_batch,
    }

    def force(out):
        _, logs = out
        return float(np.asarray(logs.train[-1, -1, 0]).ravel()[0])

    for arm, up in (("xla", False), ("pallas", True)):
        member_fn = build_member_fn(cfg.replace(use_pallas=up), case)

        def run(keys_data, lams_):
            import jax

            ks = jax.random.wrap_key_data(keys_data)
            return jax.vmap(member_fn)(ks, lams_)

        t_c0 = time.perf_counter()
        compiled = jax.jit(run).lower(keys, lams).compile()
        row[f"{arm}_compile_s"] = round(time.perf_counter() - t_c0, 1)
        force(compiled(keys, lams))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            force(compiled(keys, lams))
            best = min(best, time.perf_counter() - t0)
        row[f"{arm}_member_steps_per_sec"] = round(chunk * n_iter / best, 1)
        row[f"{arm}_time_s"] = round(best, 3)
    row["pallas_speedup"] = round(
        row["pallas_member_steps_per_sec"] / row["xla_member_steps_per_sec"],
        3)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunks", type=int, nargs="+", default=list(CHUNKS))
    ap.add_argument("--widths", type=int, nargs="+", default=list(WIDTHS),
                    help="hidden_width values; 0 = reference architecture")
    ap.add_argument("--n_iter", type=int, default=500)
    ap.add_argument("--case", default="damped_oscillator")
    ap.add_argument("--preset", default="dpivae")
    ap.add_argument("--out", default="benchmarks/results/sweep_pallas.json")
    args = ap.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    case = get_case(args.case)
    base_cfg = (
        TrainConfig()
        .with_preset(case.presets[args.preset])
        .replace(use_seed=True, patience=10**9)
    )
    result = {
        "meta": {
            "device_kind": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "case": args.case,
            "preset": args.preset,
            "n_iter": args.n_iter,
            "n_mc_train": base_cfg.n_mc_train,
            "n_batch": base_cfg.n_batch,
            "protocol": (
                "jax.vmap(build_member_fn) chunk program (what train_sweep "
                "runs), use_pallas forced per arm; compile, warmup, "
                "best-of-3 timed runs"
            ),
        },
        "cells": [],
    }

    def flush():
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    for chunk, width in itertools.product(args.chunks, args.widths):
        try:
            result["cells"].append(
                measure_cell(case, base_cfg, chunk, width, args.n_iter))
        except Exception as e:
            print(f"[sweep_pallas] chunk={chunk} width={width} failed: {e}",
                  file=sys.stderr, flush=True)
            result["cells"].append(
                {"chunk": chunk, "hidden_width": width or None,
                 "error": str(e)})
        flush()
    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
