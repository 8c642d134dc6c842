"""Attack the HBM-bound cells of the scaling grid: bf16 + remat arms.

The round-4 scaling study (benchmarks/experiments/scaling.py →
benchmarks/results/scaling.json) found that at 65k decoder rows the fused
trainer lands ON the all-logical-bytes HBM roof with f32 everything (step ÷
byte-bound ≈ 0.9-1.2) and MXU utilization *falls* (29.4% → 16.2% at
w1024_b1024 mc16→mc64), with a superlinear MC-axis collapse (w512_b1024:
1,919 → 260 steps/s — 7.4× slower for 4× MC work). This experiment measures
the two counter-moves shipped as TrainConfig fields (both exact no-ops at
defaults, see tests/test_precision.py):

- ``compute_dtype="bfloat16"``: decoder/physics MLP math in bf16 — halves
  every (rows, width) activation byte and doubles arithmetic intensity.
- ``remat_decode=True``: jax.checkpoint around decode — the backward
  recomputes the (rows, width) activations instead of reading them back
  from HBM (bytes-for-FLOPs at exactly the byte-bound cells).
- ``mc_chunk=k``: lax.scan the decode over equal MC chunks so the
  per-chunk (k*n_batch, width) working set stays VMEM-resident — the
  direct counter-move to the diagnosed residency cliff (the mc64 collapse
  is matmul->matmul edges spilling to HBM, not a bandwidth squeeze).

Arms per cell — f32 (the committed-grid baseline), bf16, remat,
bf16+remat, mc8/mc16 chunking and mc8+bf16 — at the roof cells plus the
mc16 collapse anchors; all arms run ``use_pallas=False`` so the effects
are isolated from the kernel band. Chunk arms whose mc_chunk >= the
cell's n_mc_train are no-ops and are skipped. Per arm: steady-state
steps/s (same protocol as the grid: compiled (1,1)-unroll, warmup,
best-of-3 at n_iter=500) and the executable's ``memory_analysis``
(temp/argument/output bytes — the temp figure is the XLA buffer
assignment's actual HBM scratch, the direct witness of which
intermediates materialize). For the collapse diagnosis the f32 arms also
dump the largest buffer shapes from the optimized HLO, naming what spills.

Writes benchmarks/results/scaled_arms.json incrementally, MERGING into an
existing file per cell+arm (a later arms-only run never drops committed
rows; speedup_vs_f32 is recomputed against the merged cell's f32 row).

Usage:
    python benchmarks/experiments/scaled_arms.py            # full (TPU)
    python benchmarks/experiments/scaled_arms.py --cells w512_b1024_mc64
    python benchmarks/experiments/scaled_arms.py --arms f32 mc8 mc16
"""

import argparse
import importlib.util
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(_here, "scaling.py"))
_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_scaling)
widened_case = _scaling.widened_case

_rspec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(_here, "roofline.py"))
_roofline = importlib.util.module_from_spec(_rspec)
_rspec.loader.exec_module(_roofline)
device_peaks = _roofline.device_peaks

# The grid's roof cells (step ÷ logical-byte-bound ≈ 1 in scaling.json)
# plus the mc16 anchors of the MC-collapse pairs.
CELLS = (
    "w256_b1024_mc64",
    "w512_b1024_mc16",
    "w512_b1024_mc64",
    "w1024_b1024_mc16",
    "w1024_b1024_mc64",
)

ARMS = {
    "f32": {},
    "bf16": {"compute_dtype": "bfloat16"},
    "remat": {"remat_decode": True},
    "bf16_remat": {"compute_dtype": "bfloat16", "remat_decode": True},
    "mc8": {"mc_chunk": 8},
    "mc16": {"mc_chunk": 16},
    "mc8_bf16": {"mc_chunk": 8, "compute_dtype": "bfloat16"},
}

_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|s32|u32|pred|s8|u8)\[([0-9,]+)\]")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def _parse_cell(label: str):
    m = re.fullmatch(r"w(\d+)_b(\d+)_mc(\d+)", label)
    if not m:
        raise ValueError(f"bad cell label {label!r} (want wW_bB_mcM)")
    return tuple(int(g) for g in m.groups())


def top_hlo_shapes(hlo_text: str, k: int = 8):
    """The k largest distinct tensor shapes in an optimized-HLO dump with
    occurrence counts — a census of what the compiled program materializes.
    Counting every textual occurrence over-counts (operands repeat), so the
    count is of *defining* instructions (shape at line start after `=`)."""
    sizes = {}
    for line in hlo_text.splitlines():
        # defining occurrence: "  %name = f32[65536,512]{...} op(...)"
        m = re.search(r"=\s*(f32|bf16|f16|s32|u32|pred|s8|u8)\[([0-9,]+)\]",
                      line)
        if not m:
            continue
        dt, dims = m.group(1), m.group(2)
        n = int(np.prod([int(d) for d in dims.split(",")]))
        nbytes = n * _DTYPE_BYTES[dt]
        if nbytes < 1 << 20:  # ignore <1MB tensors
            continue
        key = f"{dt}[{dims}]"
        if key not in sizes:
            sizes[key] = {"shape": key, "bytes": nbytes, "defs": 0}
        sizes[key]["defs"] += 1
    rows = sorted(sizes.values(), key=lambda r: -r["bytes"] * r["defs"])[:k]
    for r in rows:
        r["total_mb"] = round(r["bytes"] * r["defs"] / 2**20, 1)
        r["bytes_mb"] = round(r["bytes"] / 2**20, 1)
        del r["bytes"]
    return rows


def memory_analysis_dict(compiled):
    try:
        ma = compiled.memory_analysis()
    except Exception as e:
        return {"error": str(e)}
    out = {}
    for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "generated_code_size_in_bytes",
                 "alias_size_in_bytes", "peak_memory_in_bytes"):
        v = getattr(ma, name, None)
        if v is not None:
            out[name] = int(v)
    return out


def measure_cell(base_case, base_cfg, label, peaks, dump_hlo, n_time_reps=3,
                 arms=None):
    import jax

    from dpivae_tpu.train.train import build_train_fn, make_train_key
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    w, b, mc = _parse_cell(label)
    case = widened_case(base_case, w)
    cfg = base_cfg.replace(
        hidden_width=w, n_batch=b, n_mc_train=mc,
        n_train=max(base_cfg.n_train, b),
    )
    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = jax.tree.map(np.asarray, sample_response(
            case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva = jax.tree.map(np.asarray, sample_response(
            case, k2, cfg.n_val, sample_dist=case.gt_dist()))
    from dpivae_tpu.train import setup_model

    model = setup_model(cfg.replace(use_pallas=False), case, dtr)
    with on_host_cpu():
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)
    args = (params, make_train_key(2), tuple(dtr[:3]), tuple(dva[:3]), lam)

    cell = {
        "config": label, "hidden_width": w, "n_batch": b, "n_mc_train": mc,
        "n_iter": cfg.n_iter, "decoder_rows": mc * b, "arms": {},
    }

    def force(out):
        _, logs = out
        return float(np.asarray(logs.train[-1, 0]))

    for arm in (arms if arms is not None else list(ARMS)):
        overrides = ARMS[arm]
        if overrides.get("mc_chunk") and overrides["mc_chunk"] >= mc:
            continue  # chunking is a no-op at this cell's n_mc_train
        cfg_arm = cfg.replace(use_pallas=False, **overrides)
        t_c0 = time.perf_counter()
        compiled = jax.jit(
            build_train_fn(cfg_arm, case, unroll=(1, 1))
        ).lower(*args).compile()
        compile_s = time.perf_counter() - t_c0
        force(compiled(*args))
        best = np.inf
        for _ in range(n_time_reps):
            t0 = time.perf_counter()
            force(compiled(*args))
            best = min(best, time.perf_counter() - t0)
        row = {
            "steps_per_sec": round(cfg.n_iter / best, 1),
            "step_us": round(best / cfg.n_iter * 1e6, 1),
            "compile_s": round(compile_s, 1),
            "memory": memory_analysis_dict(compiled),
        }
        if arm == "f32" and dump_hlo:
            try:
                row["top_hlo_buffers"] = top_hlo_shapes(compiled.as_text())
            except Exception as e:
                row["top_hlo_buffers"] = [{"error": str(e)}]
        cell["arms"][arm] = row
        print(json.dumps({label: {arm: row}}), flush=True)

    _recompute_speedups(cell)
    return cell


def _recompute_speedups(cell):
    """speedup_vs_f32 for every arm present, against the cell's f32 row
    (after a merge the f32 row may come from a different run)."""
    f32 = cell.get("arms", {}).get("f32", {}).get("steps_per_sec")
    if not f32:
        return
    for row in cell["arms"].values():
        if "steps_per_sec" in row:
            row["speedup_vs_f32"] = round(row["steps_per_sec"] / f32, 3)


def merge_results(old, new):
    """Merge a run's cells into an existing results file: arms union per
    cell (new wins per arm), unknown old cells kept, new meta wins."""
    by_cfg = {c.get("config"): dict(c) for c in old.get("cells", [])}
    for cell in new.get("cells", []):
        prev = by_cfg.get(cell.get("config"))
        if prev and "arms" in prev and "arms" in cell:
            arms = dict(prev["arms"])
            arms.update(cell["arms"])
            merged = {**prev, **cell, "arms": arms}
        else:
            merged = dict(cell)
        _recompute_speedups(merged)
        by_cfg[cell.get("config")] = merged
    return {"meta": new.get("meta", old.get("meta")),
            "cells": list(by_cfg.values())}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cells", nargs="+", default=list(CELLS))
    ap.add_argument("--arms", nargs="+", default=None, choices=list(ARMS),
                    help="subset of arms to (re)measure (default: all)")
    ap.add_argument("--n_iter", type=int, default=500)
    ap.add_argument("--case", default="simple_beam")
    ap.add_argument("--skip-hlo", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="overwrite --out instead of merging into it")
    ap.add_argument("--out", default="benchmarks/results/scaled_arms.json")
    args = ap.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    base_case = get_case(args.case)
    base_cfg = (
        TrainConfig()
        .with_preset(base_case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9, n_iter=args.n_iter,
                 # pin the single-shot decode: this experiment charts the
                 # RAW residency cliff / arm deltas, so the mc_chunk="auto"
                 # default (which engages past the cliff) must not fire here
                 mc_chunk=None)
    )
    result = {
        "meta": {
            "device_kind": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "peaks": device_peaks(),
            "case": args.case,
            "n_iter": args.n_iter,
            "protocol": (
                "same as scaling.json train rows: compiled (1,1)-unroll "
                "train program, warmup run, best-of-3 timed runs; all arms "
                "use_pallas=False"
            ),
        },
        "cells": [],
    }

    def flush():
        out = result
        if not args.fresh and os.path.exists(args.out):
            with open(args.out) as f:
                out = merge_results(json.load(f), result)
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    for label in args.cells:
        try:
            result["cells"].append(measure_cell(
                base_case, base_cfg, label,
                result["meta"]["peaks"], dump_hlo=not args.skip_hlo,
                arms=args.arms,
            ))
        except Exception as e:
            print(f"[scaled_arms] {label} failed: {e}", file=sys.stderr,
                  flush=True)
            result["cells"].append({"config": label, "error": str(e)})
        flush()
    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
