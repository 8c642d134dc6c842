"""Roofline / speed-of-light analysis of the fused training programs.

"Fast" needs a denominator. This script derives the XLA-compiled cost of
ONE training step inside the two shipping hot programs — the single-run
fused training scan (bench.py's workload) and one sweep chunk program
(the study's workload) — and places the measured throughput against the
chip's two roofs:

- **MXU roof**: peak matmul FLOP/s (TPU v5e: 197e12 bf16 FLOP/s, public
  spec), time_mxu = flops / peak_flops.
- **naive HBM roof**: peak memory bandwidth (v5e: 819e9 B/s) against the
  analysis's "bytes accessed". That figure is LOGICAL operand traffic —
  every op's inputs/outputs as if nothing were fused — so it is an upper
  bound on true HBM traffic, and the roof built from it is pessimistic.
  Measured step time BEATING this roof (>100% of it) is expected and is
  direct evidence that XLA fusion keeps intermediate traffic in
  VMEM/registers; only MXU utilization is reported as a utilization.

For this model family (MLP widths 64-128, latent dims <= 16, batch 64)
the honest result is that MXU utilization is far below 1e-1 and the
binding constraint is the *sequential op-latency chain*: a training step
is ~hundreds of tiny fused ops with data dependencies, each far below
MXU tile sizes (SURVEY.md §6: ~1e4-1e5 params) — the single-run step is
slower than even the pessimistic unfused-bytes bound, so no memory model
explains its time. The framework's answer is architectural, not
kernel-level: batch independent members into the same ops (vmap sweeps),
which multiplies arithmetic per op at ~constant op count — the sweep
rows quantify exactly that.

**Extracting per-step cost.** ``compiled.cost_analysis()`` (XLA's
HloCostAnalysis) counts a loop body ONCE, not multiplied by trip count
(verified on both CPU and the TPU plugin; pinned by
``tests/test_roofline.py``). The fused trainer is an outer scan over
validation blocks whose body holds an inner scan of ``val_freq - 1``
train steps (the block's first step + validation sit outside it), both
optionally unrolled. Unrolling by ``u`` puts ``u`` steps in the body —
counted once — so differencing compiles at inner unroll ``u`` and 1
cancels the val pass, setup, and epilogue, leaving ``u - 1`` steps'
flops/bytes. ``u`` MUST divide the inner length: jax inlines the
remainder steps of a non-dividing unroll outside the loop, and the
analysis counts those in full (unroll=2 on the default 9-step inner scan
reports 3 bodies and doubles the estimate — exactly the bug this
comment guards). Cross-step fusion inside the unrolled body can only
shrink the diff, so utilization is if anything understated.

Writes benchmarks/results/roofline.json and prints a table.

Usage:
    python benchmarks/experiments/roofline.py            # measure on TPU
    python benchmarks/experiments/roofline.py --analyze-only   # no timing
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# Public TPU v5e peak specs (per chip).
PEAKS = {
    "tpu v5 lite": {"flops": 197e12, "hbm_bw": 819e9},
    # other backends: no peak table -> report costs/intensity only
}


def device_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for name, peaks in PEAKS.items():
        if name in kind:
            return peaks
    return None


def cost_of(compiled):
    """(flops, bytes_accessed) from XLA's cost analysis, robust to the
    dict-vs-list-of-dicts return across jax versions; (None, None) when
    the backend doesn't implement the analysis (some PJRT plugins)."""
    try:
        ca = compiled.cost_analysis()
    except Exception as e:  # plugin backends may not implement it
        print(f"[roofline] cost_analysis unavailable: {e}", file=sys.stderr)
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    return flops, nbytes


# Largest unroll the analysis will compile: a prime inner length has no
# divisor but itself, and fully unrolling e.g. a 1022-step body (val_freq
# 1023) just for cost analysis can take minutes of compile. Past this cap
# the differencing is skipped (step_cost returns None) instead.
_MAX_ANALYSIS_UNROLL = 16


def _unroll_divisor(inner_len: int) -> int:
    """Smallest divisor >1 of the inner scan length (capped — see
    ``_MAX_ANALYSIS_UNROLL``). Divisibility matters: a non-dividing unroll
    makes jax inline the remainder steps OUTSIDE the loop, and HLO cost
    analysis counts those in full — e.g. unroll=2 on the default 9-step
    inner scan reports 3 step-bodies, silently doubling the differenced
    per-step cost (caught in review; pinned by tests/test_roofline.py).
    Prime lengths within the cap fall back to the full unroll; past it
    returns 1, signalling "skip the differencing"."""
    for u in range(2, min(inner_len, _MAX_ANALYSIS_UNROLL) + 1):
        if inner_len % u == 0:
            return u
    return inner_len if inner_len <= _MAX_ANALYSIS_UNROLL else 1


def step_cost(make_fn, args, inner_len, base_compiled=None):
    """Per-step (flops, bytes) by differencing two compiles of the same
    program at inner unroll u vs 1, where u divides the inner scan length
    (``inner_len`` = val_freq - 1: the block's first step + validation sit
    outside the inner scan). The unrolled body is counted once as u steps,
    so (cost(u) - cost(1)) / (u - 1) isolates one step; the val pass,
    setup, and epilogue cancel exactly. ``base_compiled`` lets callers
    that already hold the (1,1)-unroll executable (the scaling study's
    XLA timing arm) skip re-tracing it (~5-7s on this 1-core host)."""
    import jax

    u = _unroll_divisor(inner_len)
    if u < 2:
        return None, None  # val_freq=2: nothing to difference
    costs = []
    for unroll in ((1, 1), (u, 1)):
        if unroll == (1, 1) and base_compiled is not None:
            compiled = base_compiled
        else:
            compiled = jax.jit(make_fn(unroll)).lower(*args).compile()
        f, b = cost_of(compiled)
        if f is None:
            return None, None
        costs.append((f, b))
    (f1, b1), (fu, bu) = costs
    return (fu - f1) / (u - 1), (bu - b1) / (u - 1)


def make_single(case, cfg):
    """(make_fn(unroll), args) for the single-run fused trainer."""
    import jax

    from dpivae_tpu.train import setup_model
    from dpivae_tpu.train.train import build_train_fn, make_train_key
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = jax.tree.map(
            np.asarray,
            sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist()),
        )
        dva = jax.tree.map(
            np.asarray,
            sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist()),
        )
    model = setup_model(cfg, case, dtr)
    with on_host_cpu():
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)
    args = (params, make_train_key(2), tuple(dtr[:3]), tuple(dva[:3]), lam)
    return (lambda unroll: build_train_fn(cfg, case, unroll=unroll)), args


def make_sweep_chunk(case, cfg, n_members):
    """(make_fn(unroll), args) for one vmapped sweep chunk."""
    import jax

    from dpivae_tpu.sweep.sweep import build_member_fn
    from dpivae_tpu.utils import on_host_cpu

    with on_host_cpu():
        keys = jax.random.split(jax.random.PRNGKey(0), n_members)
        lams = jax.numpy.full((n_members,), cfg.lambda_g0, jax.numpy.float32)
    return (
        lambda unroll: jax.vmap(build_member_fn(cfg, case, unroll=unroll)),
        (keys, lams),
    )


def analyze(label, make_fn, args, ship_unroll, n_steps, n_members,
            measure, peaks, inner_len):
    import jax

    flops, nbytes = step_cost(make_fn, args, inner_len)
    row = {
        "program": label,
        "n_steps": n_steps,
        "n_members": n_members,
        "flops_per_step": flops,
        # logical operand traffic (unfused upper bound on HBM bytes)
        "logical_bytes_per_step": nbytes,
    }
    if flops is not None:
        row["arithmetic_intensity"] = flops / nbytes if nbytes else None
        if peaks:
            row["sol_step_mxu_s"] = flops / peaks["flops"]
            row["naive_hbm_step_s"] = nbytes / peaks["hbm_bw"]
    if measure:
        compiled = jax.jit(make_fn(ship_unroll)).lower(*args).compile()

        def force(out):
            # Host transfer of a TINY slice forces execution on the
            # tunneled backend (block_until_ready is a no-op there;
            # copying whole logs would add seconds of transfer to the
            # timing). The eager slice compiles once, then hits the cache.
            _, logs = out
            tail = logs.train[..., -1, 0]  # scalar or (n_members,)
            return float(np.asarray(tail).ravel()[0])

        force(compiled(*args))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(compiled(*args))
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        row["measured_time_s"] = dt
        row["measured_step_s"] = dt / n_steps
        row["measured_steps_per_s"] = n_steps / dt
        row["measured_member_steps_per_s"] = n_steps * n_members / dt
        if flops is not None:
            row["delivered_flops_per_s"] = flops * n_steps / dt
            row["delivered_logical_bytes_per_s"] = nbytes * n_steps / dt
            if peaks:
                row["mxu_utilization"] = (
                    row["delivered_flops_per_s"] / peaks["flops"]
                )
                # >1 means fusion kept intermediates on-chip (the bound
                # is an unfused upper bound), not >100% of the HBM pins
                row["speedup_vs_naive_hbm_roof"] = (
                    row["naive_hbm_step_s"] / row["measured_step_s"]
                )
    return row


def fmt(row):
    out = [f"== {row['program']} =="]
    if row.get("flops_per_step") is not None:
        out.append(
            f"  per step: {row['flops_per_step'] / 1e6:.2f} MFLOP, "
            f"{row['logical_bytes_per_step'] / 1e6:.3f} MB logical traffic, "
            f"intensity {row['arithmetic_intensity']:.2f} FLOP/B"
        )
    if "sol_step_mxu_s" in row:
        out.append(
            f"  roofs: mxu speed-of-light "
            f"{row['sol_step_mxu_s'] * 1e6:.3f} us/step; naive (unfused) "
            f"hbm bound {row['naive_hbm_step_s'] * 1e6:.2f} us/step"
        )
    if "measured_time_s" in row:
        out.append(
            f"  measured: {row['measured_time_s']:.3f} s total, "
            f"{row['measured_step_s'] * 1e6:.1f} us/step "
            f"({row['measured_steps_per_s']:.0f} steps/s, "
            f"{row['measured_member_steps_per_s']:.0f} member-steps/s)"
        )
        if "delivered_flops_per_s" in row:
            out.append(
                f"  delivered: "
                f"{row['delivered_flops_per_s'] / 1e12:.4f} TFLOP/s "
                f"({row['delivered_logical_bytes_per_s'] / 1e9:.2f} GB/s "
                "logical)"
            )
        if "mxu_utilization" in row:
            ratio = row["speedup_vs_naive_hbm_roof"]
            if ratio >= 1:
                hbm_note = (
                    f"step beats the naive (unfused-bytes) hbm bound by "
                    f"{ratio:.2f}x — fusion keeps intermediates in VMEM"
                )
            else:
                hbm_note = (
                    f"step takes {1 / ratio:.2f}x even the pessimistic "
                    "unfused-bytes hbm bound — no memory model explains "
                    "its time"
                )
            out.append(
                f"  mxu utilization {row['mxu_utilization'] * 100:.3f}%; "
                f"{hbm_note}; the binding constraint is sequential op "
                "latency, not a roof"
            )
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze-only", action="store_true",
                    help="cost analysis without timing (any backend)")
    ap.add_argument("--n_iter", type=int, default=20000)
    ap.add_argument("--sweep_members", type=int, default=11)
    ap.add_argument("--out", default="benchmarks/results/roofline.json")
    args = ap.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    case = get_case("simple_beam")
    cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9, n_iter=args.n_iter)
    )
    peaks = device_peaks()
    measure = not args.analyze_only

    inner_len = cfg.val_freq - 1  # the inner scan's true length
    rows = []
    make_fn, fargs = make_single(case, cfg)
    rows.append(analyze(
        "single-run fused train (beam-S, reference scale)",
        make_fn, fargs, "auto", cfg.n_iter, 1, measure, peaks, inner_len,
    ))
    make_fn, fargs = make_sweep_chunk(case, cfg, args.sweep_members)
    rows.append(analyze(
        f"sweep chunk ({args.sweep_members} members, vmapped)",
        # shipping sweep programs run unrolled=False ((1,1))
        make_fn, fargs, False, cfg.n_iter, args.sweep_members, measure,
        peaks, inner_len,
    ))

    import jax

    meta = {
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "peaks": peaks,
        "n_iter": args.n_iter,
        "method": (
            "per-step cost = (cost(inner_unroll=u) - cost(inner_unroll=1))"
            " / (u-1), u the smallest divisor >1 of the inner scan length"
            f" val_freq-1 = {cfg.val_freq - 1}"
        ),
    }
    for r in rows:
        print(fmt(r))
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"meta": meta, "programs": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
