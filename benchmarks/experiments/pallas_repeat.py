"""Repeat-confirm (or refute) the Pallas neighbor wins in the scaling grid.

The round-4 grid (benchmarks/results/scaling.json) shows four cells outside
the enabled auto band where the kernel arm measured 3-7% faster single-shot:
w512_b256_mc16 (1.058), w1024_b256_mc16 (1.067), w1024_b1024_mc16 (1.047),
w512_b64_mc64 (1.029). Only w256_b1024_mc64 ever got the fresh-process,
cache-disabled repeat protocol that justified enabling the band. This
driver applies the same protocol to the neighbors: each (cell, repeat) runs
in a FRESH subprocess with the persistent compilation cache DISABLED
(DPIVAE_COMPILATION_CACHE=0), so every row is an independent trace+compile
and a reproducing ratio is a deterministic compiler effect, not cache or
process luck. Results merge into scaling.json's "repeats" section.

Usage:
    python benchmarks/experiments/pallas_repeat.py                # driver
    python benchmarks/experiments/pallas_repeat.py --cell w512_b256_mc16 \
        --one-shot                                                # child
"""

import argparse
import importlib.util
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

_here = os.path.dirname(os.path.abspath(__file__))

NEIGHBOR_CELLS = (
    "w512_b256_mc16",
    "w1024_b256_mc16",
    "w1024_b1024_mc16",
    "w512_b64_mc64",
)
N_REPEATS = 2


def _parse_cell(label: str):
    m = re.fullmatch(r"w(\d+)_b(\d+)_mc(\d+)", label)
    if not m:
        raise ValueError(f"bad cell label {label!r} (want wW_bB_mcM)")
    return tuple(int(g) for g in m.groups())


def measure_one(label: str, n_iter: int, case_name: str):
    """Both use_pallas arms of the full train program at one cell; same
    timing protocol as the grid (compiled (1,1)-unroll, warmup,
    best-of-3)."""
    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.train import setup_model
    from dpivae_tpu.train.train import build_train_fn, make_train_key
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    _spec = importlib.util.spec_from_file_location(
        "scaling", os.path.join(_here, "scaling.py"))
    _scaling = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_scaling)

    w, b, mc = _parse_cell(label)
    base_case = get_case(case_name)
    case = _scaling.widened_case(base_case, w)
    cfg = (
        TrainConfig()
        .with_preset(base_case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9, n_iter=n_iter,
                 hidden_width=w, n_batch=b, n_mc_train=mc,
                 n_train=max(1024, b))
    )
    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = jax.tree.map(np.asarray, sample_response(
            case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva = jax.tree.map(np.asarray, sample_response(
            case, k2, cfg.n_val, sample_dist=case.gt_dist()))
    model = setup_model(cfg.replace(use_pallas=False), case, dtr)
    with on_host_cpu():
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)
    args = (params, make_train_key(2), tuple(dtr[:3]), tuple(dva[:3]), lam)

    def force(out):
        _, logs = out
        return float(np.asarray(logs.train[-1, 0]))

    row = {"config": label, "hidden_width": w, "n_batch": b,
           "n_mc_train": mc, "n_iter": n_iter, "decoder_rows": mc * b}
    for arm, up in (("xla", False), ("pallas", True)):
        compiled = jax.jit(
            build_train_fn(cfg.replace(use_pallas=up), case, unroll=(1, 1))
        ).lower(*args).compile()
        force(compiled(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            force(compiled(*args))
            best = min(best, time.perf_counter() - t0)
        row[f"{arm}_steps_per_sec"] = round(n_iter / best, 1)
        row[f"{arm}_step_us"] = round(best / n_iter * 1e6, 1)
    row["pallas_speedup"] = round(
        row["pallas_steps_per_sec"] / row["xla_steps_per_sec"], 3)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", nargs="+", default=list(NEIGHBOR_CELLS))
    ap.add_argument("--cell", help="(child mode) single cell to measure")
    ap.add_argument("--one-shot", action="store_true",
                    help="child mode: measure --cell, print one JSON row")
    ap.add_argument("--n_iter", type=int, default=500)
    ap.add_argument("--n_repeats", type=int, default=N_REPEATS)
    ap.add_argument("--case", default="simple_beam")
    ap.add_argument("--scaling-json",
                    default="benchmarks/results/scaling.json")
    args = ap.parse_args()

    if args.one_shot:
        row = measure_one(args.cell, args.n_iter, args.case)
        print("ROW " + json.dumps(row), flush=True)
        return

    rows = []
    for label in args.cells:
        for rep in range(args.n_repeats):
            env = dict(os.environ, DPIVAE_COMPILATION_CACHE="0")
            print(f"[repeat] {label} rep {rep} (fresh process, cache off)",
                  flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one-shot", "--cell", label,
                 "--n_iter", str(args.n_iter), "--case", args.case],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            out_rows = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("ROW ")]
            if proc.returncode != 0 or not out_rows:
                print(f"[repeat] {label} rep {rep} FAILED rc="
                      f"{proc.returncode}\n{proc.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            row = json.loads(out_rows[-1][4:])
            row["repeat"] = rep
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Merge into scaling.json's repeats section (append rows; keep note).
    with open(args.scaling_json) as f:
        scaling = json.load(f)
    rep = scaling.setdefault("repeats", {"rows": []})
    rep["rows"].extend(rows)
    rep["neighbor_note"] = (
        "neighbor cells re-measured with the same fresh-process, "
        "cache-disabled protocol as w256_b1024_mc64 (one subprocess per "
        "row, DPIVAE_COMPILATION_CACHE=0, independent trace+compile)"
    )
    with open(args.scaling_json, "w") as f:
        json.dump(scaling, f, indent=1)
    print(f"merged {len(rows)} repeat rows into {args.scaling_json}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=False)
