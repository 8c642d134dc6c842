"""Measure mc_chunk in the vmapped-sweep regime (the last unmeasured pin).

``sweep._resolve_sweep_config`` resolves ``mc_chunk="auto"`` to None
(single-shot decode) because the residency-cliff threshold behind auto
(train.setup.resolve_mc_chunk, measured on the SINGLE-RUN train program,
benchmarks/results/scaled_arms.json) was never measured under vmap: the
member axis multiplies the decode working set — a chunk of C members
presents a ``(C, n_mc*n_batch, width)`` batched activation to every
decode matmul, so the VMEM cliff should bite at
``C * n_mc * n_batch * width >= 32M`` f32 elements rather than at the
single-run boundary. This experiment times the ACTUAL chunk program
train_sweep runs (``jax.vmap(build_member_fn(...))``) with mc_chunk
forced per arm (None / 8, plus optional +bf16) at:

- the reference sweep shape (C=11, mc16 x b64 x ref width) — below any
  cliff; chunking must measure as pure overhead there (the no-regression
  guard for the resolver rule), and
- scaled cells straddling the predicted vmapped boundary
  (C * rows/member * width from ~23M to ~134M elements).

Timing protocol mirrors sweep_pallas.py: compile, warmup run, best-of-3
timed runs at a short n_iter. Writes
benchmarks/results/sweep_mc_chunk.json incrementally — the numbers that
back whatever rule ``_resolve_sweep_config`` ships for mc_chunk.

Usage:
    python benchmarks/experiments/sweep_mc_chunk.py            # full grid (TPU)
    python benchmarks/experiments/sweep_mc_chunk.py --cells ref
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# name -> (members, n_mc_train, n_batch, hidden_width or 0=reference)
# f32 working-set elements = members * n_mc * n_batch * width:
#   ref        11*16*64*128      =  1.4M  (far below any cliff)
#   edge       11*64*64*512      = 23.1M  (just below the 32M single-run rule)
#   past       11*64*128*512     = 46.2M  (just past it)
#   deep        4*64*1024*512    =134.2M  (deep past; the single-run roof cell
#                                          w512_b1024_mc64 vmapped over 4 members)
CELLS = {
    "ref": (11, 16, 64, 0),
    "edge": (11, 64, 64, 512),
    "past": (11, 64, 128, 512),
    "deep": (4, 64, 1024, 512),
}


def measure_cell(case, base_cfg, name: str, spec, n_iter: int):
    import jax

    from dpivae_tpu.sweep.sweep import build_member_fn
    from dpivae_tpu.utils import on_host_cpu

    members, n_mc, n_batch, width = spec
    cfg = base_cfg.replace(
        n_iter=n_iter, n_mc_train=n_mc, n_batch=n_batch,
        hidden_width=width or None,
    )
    with on_host_cpu():
        keys = jax.random.split(jax.random.PRNGKey(0), members)
        keys = np.asarray(jax.random.key_data(keys))
        lams = np.linspace(-1.0, 1.0, members).astype(np.float32)

    row = {
        "cell": name,
        "members": members,
        "n_mc_train": n_mc,
        "n_batch": n_batch,
        "hidden_width": width or None,
        "n_iter": n_iter,
        "rows_per_member": n_mc * n_batch,
        "workset_elems_m": round(members * n_mc * n_batch * (width or 128)
                                 / 2**20, 1),
    }

    def force(out):
        _, logs = out
        return float(np.asarray(logs.train[-1, -1, 0]).ravel()[0])

    arms = (
        ("single", dict(mc_chunk=None)),
        ("chunk8", dict(mc_chunk=8)),
        ("chunk8_bf16", dict(mc_chunk=8, compute_dtype="bfloat16")),
    )
    for arm, over in arms:
        member_fn = build_member_fn(cfg.replace(**over), case)

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
        row[f"{arm}_member_steps_per_sec"] = round(members * n_iter / best, 1)
        row[f"{arm}_time_s"] = round(best, 3)
    for arm in ("chunk8", "chunk8_bf16"):
        row[f"{arm}_speedup"] = round(
            row[f"{arm}_member_steps_per_sec"]
            / row["single_member_steps_per_sec"], 3)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", nargs="+", default=list(CELLS),
                    choices=list(CELLS))
    ap.add_argument("--n_iter", type=int, default=100)
    ap.add_argument("--case", default="damped_oscillator")
    ap.add_argument("--preset", default="dpivae")
    ap.add_argument("--out", default="benchmarks/results/sweep_mc_chunk.json")
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
            "protocol": (
                "jax.vmap(build_member_fn) chunk program (what train_sweep "
                "runs), mc_chunk forced per arm; compile, warmup, best-of-3 "
                "timed runs"
            ),
        },
        "cells": [],
    }

    def flush():
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    for name in args.cells:
        try:
            result["cells"].append(
                measure_cell(case, base_cfg, name, CELLS[name], args.n_iter))
        except Exception as e:
            print(f"[sweep_mc_chunk] cell={name} failed: {e}",
                  file=sys.stderr, flush=True)
            result["cells"].append({"cell": name, "error": str(e)})
        flush()
    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
