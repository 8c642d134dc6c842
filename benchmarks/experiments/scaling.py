"""Scaling study: the fused trainer at shapes where the MXU is load-bearing.

Every committed number so far lives at reference scale (MLP widths 64-128,
batch 64, MC 16), where the TPU's MXU runs at 0.5-1.5% and the binding
constraint is sequential op latency (benchmarks/results/roofline.json).
This study answers two questions the reference shapes cannot:

1. **Where does the framework's throughput curve bend as the workload
   grows?** Sweeps the reference architecture family (the per-case preset
   widths are 64-256, ref cases/simple_beam/__init__.py:116-123) up to
   width 1024, batch 1024, MC 64 via ``TrainConfig.hidden_width`` (every
   trainable MLP trunk) plus a width-matched frozen tanh surrogate as the
   in-loss physics (the bridge pattern, ref cases/bridge MLP physics).
   Each config gets a roofline point: per-step FLOPs by the dividing-
   unroll differencing method (see experiments/roofline.py) and measured
   steady-state steps/s => MXU utilization vs width/batch/MC.

2. **Does the Pallas fused-MLP kernel (ops/pallas_mlp.py) ever beat XLA's
   fusion, and where?** (a) a kernel microbench grid — rows x hidden,
   forward and forward+backward through the custom VJP — and (b) the full
   train program with use_pallas on/off per config. The measured boundary
   feeds ``use_pallas="auto"`` (ops/pallas_mlp.py:auto_select).

Writes benchmarks/results/scaling.json incrementally (each finished row is
flushed, so a tunnel outage keeps partial data) and prints a table.

Usage:
    python benchmarks/experiments/scaling.py                  # full grid
    python benchmarks/experiments/scaling.py --quick          # 1 config/axis
    python benchmarks/experiments/scaling.py --micro-only     # kernel grid only
"""

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# benchmarks/ is scripts-not-a-package; load the roofline helpers by path
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "roofline.py"))
_roofline = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_roofline)
device_peaks = _roofline.device_peaks
step_cost = _roofline.step_cost

WIDTHS = (128, 256, 512, 1024)
BATCHES = (64, 256, 1024)
MCS = (16, 64)
MICRO_ROWS = (1024, 4096, 16384, 65536)
MICRO_HIDDEN = (128, 256, 512, 1024)


def _force(x):
    """Force execution with a host transfer of one element (the tunneled
    backend's block_until_ready is a no-op)."""
    return float(np.asarray(x).ravel()[0])


def widened_case(base_case, width: int):
    """The base case with a width-``width`` frozen tanh-MLP surrogate as
    the in-loss physics (two hidden layers, the bridge/oscillator surrogate
    family shape — ref models/nn.py:28-80). Weights are random (throughput
    does not depend on their values); a small scale keeps the loss finite.
    Data generation (full_model / gt_dist) is untouched.
    """
    import jax

    from dpivae_tpu.cases import Surrogate
    from dpivae_tpu.models.nn import mlp_init
    from dpivae_tpu.utils import on_host_cpu

    d_in = base_case.nz_x + len(base_case.idx_c_phys)
    with on_host_cpu():
        params = mlp_init(
            jax.random.PRNGKey(width),
            [d_in, width, width, base_case.nd_x],
        )
        params = jax.tree.map(lambda a: np.asarray(a) * 0.1, params)
    surrogate = Surrogate(
        params=params,
        scaler_mean=np.zeros((d_in,), np.float32),
        scaler_scale=np.ones((d_in,), np.float32),
    )
    return dataclasses.replace(base_case, part_model=surrogate)


def _micro_reps(rows: int, d_h: int) -> int:
    """Scan length per timed call. One tunneled jit call costs ~25-30 ms
    RTT regardless of work (measured), so small shapes need thousands of
    in-program reps before the kernel cost is visible above the floor;
    big shapes need fewer to keep the run bounded."""
    work = rows * d_h
    if work <= 1 << 20:
        return 4000
    if work <= 1 << 24:
        return 1000
    return 200


def micro_grid(rows_list, hidden_list):
    """Kernel microbench: pallas fused_mlp vs XLA at the decoder-branch
    shape family (d_in=4, d_out=nd_x-like 32), forward AND train-style
    forward+backward (grad wrt x and both weight matrices through the
    custom VJP). Returns rows of us/call and the speedup ratio."""
    import jax
    import jax.numpy as jnp

    from dpivae_tpu.ops.pallas_mlp import _reference_mlp, fused_mlp

    d_in, d_out = 4, 32
    out = []
    from dpivae_tpu.utils import on_host_cpu

    for rows, d_h in itertools.product(rows_list, hidden_list):
        reps = _micro_reps(rows, d_h)
        # Input construction on the host CPU backend: each eager op on the
        # tunneled TPU pays a ~1s remote compile (CLAUDE.md).
        with on_host_cpu():
            ks = jax.random.split(jax.random.PRNGKey(0), 5)
            x = np.asarray(jax.random.normal(ks[0], (rows, d_in)))
            w0 = np.asarray(jax.random.normal(ks[1], (d_in, d_h))) * 0.3
            b0 = np.asarray(jax.random.normal(ks[2], (d_h,))) * 0.1
            w1 = np.asarray(jax.random.normal(ks[3], (d_h, d_out))) * 0.3
            b1 = np.asarray(jax.random.normal(ks[4], (d_out,))) * 0.1

        def timed(f):
            def body(c, _):
                return c + 1e-6, jnp.sum(f(c, w0, b0, w1, b1))

            def run(x0):
                _, ys = jax.lax.scan(body, x0, None, length=reps)
                return jnp.sum(ys)

            g = jax.jit(run)
            _force(g(x))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _force(g(x))
                best = min(best, time.perf_counter() - t0)
            return best / reps * 1e6

        def loss_p(x_, w0_, w1_):
            return jnp.sum(fused_mlp(x_, w0_, b0, w1_, b1) ** 2)

        def loss_r(x_, w0_, w1_):
            return jnp.sum(_reference_mlp(x_, w0_, b0, w1_, b1) ** 2)

        def timed_grad(loss):
            g = jax.grad(loss, argnums=(0, 1, 2))

            def body(c, _):
                dx, dw0, dw1 = g(c, w0, w1)
                return c + 1e-6 * dx, jnp.sum(dw0) + jnp.sum(dw1)

            def run(x0):
                _, ys = jax.lax.scan(body, x0, None, length=reps)
                return jnp.sum(ys)

            f = jax.jit(run)
            _force(f(x))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _force(f(x))
                best = min(best, time.perf_counter() - t0)
            return best / reps * 1e6

        row = {
            "rows": rows, "d_hidden": d_h, "reps": reps,
            "fwd_pallas_us": round(timed(fused_mlp), 2),
            "fwd_xla_us": round(timed(_reference_mlp), 2),
            "train_pallas_us": round(timed_grad(loss_p), 2),
            "train_xla_us": round(timed_grad(loss_r), 2),
        }
        row["fwd_xla_over_pallas"] = round(
            row["fwd_xla_us"] / row["fwd_pallas_us"], 3)
        row["train_xla_over_pallas"] = round(
            row["train_xla_us"] / row["train_pallas_us"], 3)
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


def train_config_row(case, cfg, peaks, inner_len, label):
    """One scaling-grid row: roofline point (XLA arm) + measured
    steady-state steps/s for both use_pallas arms."""
    import jax

    from dpivae_tpu.train import setup_model
    from dpivae_tpu.train.train import build_train_fn, make_train_key
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = jax.tree.map(np.asarray, sample_response(
            case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva = jax.tree.map(np.asarray, sample_response(
            case, k2, cfg.n_val, sample_dist=case.gt_dist()))
    model = setup_model(cfg, case, dtr)
    with on_host_cpu():
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)
    args = (params, make_train_key(2), tuple(dtr[:3]), tuple(dva[:3]), lam)

    row = {
        "config": label,
        "hidden_width": cfg.hidden_width,
        "n_batch": cfg.n_batch,
        "n_mc_train": cfg.n_mc_train,
        "n_iter": cfg.n_iter,
        "decoder_rows": cfg.n_mc_train * cfg.n_batch,
    }

    # Arms are EXPLICIT booleans: with use_pallas="auto" as the config
    # default, building from the bare cfg would resolve the pallas path
    # at exactly the win-band shapes and self-contaminate the study that
    # feeds the auto band.
    cfg_xla = cfg.replace(use_pallas=False)
    cfg_pallas = cfg.replace(use_pallas=True)

    # Roofline point (XLA arm): per-step flops by dividing-unroll
    # differencing (roofline.step_cost — the pinned original); the
    # (1,1)-unroll base executable is passed in so it is REUSED as the
    # XLA timing arm instead of re-tracing the identical program
    # (~5-7s/row on this 1-core host).
    compiled_xla = jax.jit(
        build_train_fn(cfg_xla, case, unroll=(1, 1))
    ).lower(*args).compile()
    flops, nbytes = step_cost(
        lambda unroll: build_train_fn(cfg_xla, case, unroll=unroll),
        args, inner_len, base_compiled=compiled_xla,
    )
    row["flops_per_step"] = flops
    row["logical_bytes_per_step"] = nbytes
    if flops is not None and peaks:
        row["sol_step_mxu_s"] = flops / peaks["flops"]

    compiled_pallas = jax.jit(
        build_train_fn(cfg_pallas, case, unroll=(1, 1))
    ).lower(*args).compile()
    for arm, compiled in (("xla", compiled_xla), ("pallas", compiled_pallas)):

        def force(out):
            _, logs = out
            return float(np.asarray(logs.train[-1, 0]))

        force(compiled(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            force(compiled(*args))
            best = min(best, time.perf_counter() - t0)
        sps = cfg.n_iter / best
        row[f"{arm}_steps_per_sec"] = round(sps, 1)
        row[f"{arm}_step_us"] = round(best / cfg.n_iter * 1e6, 1)
        if arm == "xla" and flops is not None and peaks:
            row["mxu_utilization"] = flops * sps / peaks["flops"]
    row["pallas_speedup"] = round(
        row["pallas_steps_per_sec"] / row["xla_steps_per_sec"], 3
    )  # >1 means the pallas arm trains faster
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--widths", type=int, nargs="+", default=list(WIDTHS))
    ap.add_argument("--batches", type=int, nargs="+", default=list(BATCHES))
    ap.add_argument("--mcs", type=int, nargs="+", default=list(MCS))
    ap.add_argument("--n_iter", type=int, default=500)
    ap.add_argument("--case", default="simple_beam")
    ap.add_argument("--quick", action="store_true",
                    help="one config per axis extreme (smoke/preview)")
    ap.add_argument("--micro-only", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    ap.add_argument("--out", default="benchmarks/results/scaling.json")
    args = ap.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    peaks = device_peaks()
    result = {
        "meta": {
            "device_kind": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "peaks": peaks,
            "case": args.case,
            "n_iter": args.n_iter,
            "note": (
                "hidden_width scales every trainable MLP trunk AND the "
                "frozen in-loss surrogate (two tanh hidden layers of the "
                "same width); decoder_rows = n_mc_train*n_batch is the "
                "row count the pallas kernel sees in training"
            ),
        },
        "micro": [],
        "train": [],
    }

    def flush():
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    if not args.skip_micro:
        rows_list = MICRO_ROWS[:2] + MICRO_ROWS[-1:] if args.quick else MICRO_ROWS
        hid_list = MICRO_HIDDEN[:1] + MICRO_HIDDEN[-1:] if args.quick else MICRO_HIDDEN
        print("== kernel microbench (us/call; ratio >1 => pallas wins) ==",
              flush=True)
        result["micro"] = micro_grid(rows_list, hid_list)
        flush()
    if args.micro_only:
        flush()
        print(f"wrote {args.out}")
        return

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
    inner_len = base_cfg.val_freq - 1

    grid = list(itertools.product(args.widths, args.batches, args.mcs))
    if args.quick:
        grid = [
            (args.widths[0], args.batches[0], args.mcs[0]),
            (args.widths[-1], args.batches[-1], args.mcs[-1]),
        ]
    print(f"== train-program grid: {len(grid)} configs ==", flush=True)
    cases_by_width = {}
    for w, b, mc in grid:
        if w not in cases_by_width:
            cases_by_width[w] = widened_case(base_case, w)
        cfg = base_cfg.replace(
            hidden_width=w, n_batch=b, n_mc_train=mc,
            n_train=max(base_cfg.n_train, b),
        )
        label = f"w{w}_b{b}_mc{mc}"
        try:
            result["train"].append(
                train_config_row(cases_by_width[w], cfg, peaks, inner_len,
                                 label)
            )
        except Exception as e:  # keep partial grid on a per-config failure
            print(f"[scaling] {label} failed: {e}", file=sys.stderr,
                  flush=True)
            result["train"].append({"config": label, "error": str(e)})
        flush()

    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
