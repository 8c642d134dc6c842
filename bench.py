"""Headline benchmark: fused DPI-VAE training throughput on one TPU chip.

Trains the beam "dpivae" (S) preset at the reference's exact scale — 20,000
iterations, batch 64, 16 train MC samples, full validation pass (512 points,
64 MC) every 10 iterations — as one jitted lax.scan program, and reports
steps/sec of the steady-state (pre-compiled) run.

vs_baseline compares against the measured PyTorch-reference hot loop on this
image's CPU *including* the same validation cadence (48.2 steps/s; see
BASELINE.md and benchmarks/torch_baseline.py). The driver-set north star is
>= 10x (BASELINE.json).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train import setup_model
from dpivae_tpu.train.train import build_train_fn
from dpivae_tpu.utils.data import sample_response

TORCH_CPU_BASELINE_STEPS_PER_SEC = 48.19  # see BASELINE.md "Measured"


def main():
    case = get_case("simple_beam")
    cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9)  # time all 20k steps
    )
    from dpivae_tpu.utils import on_host_cpu

    # Host-phase data/init on CPU (eager ops on the TPU tunnel pay ~1s/op
    # remote-compile latency and would pollute the timing queue)
    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        data_train = jax.tree.map(
            np.asarray,
            sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist()),
        )
        data_val = jax.tree.map(
            np.asarray,
            sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist()),
        )
    model = setup_model(cfg, case, data_train)
    train_fn = jax.jit(build_train_fn(cfg, case))
    with on_host_cpu():
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
    # Single-run training key: rbg on TPU (hardware generator, +17%
    # measured, deterministic at fixed shape) — the same default
    # train_model/script 0 use; sweeps keep threefry (see make_train_key).
    from dpivae_tpu.train.train import make_train_key

    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)
    dtr, dva = tuple(data_train[:3]), tuple(data_val[:3])

    def force(out):
        # jax.block_until_ready is unreliable on the tunneled backend;
        # a host transfer of a result scalar forces execution for real.
        state, logs = out
        return float(np.asarray(logs.train[-1, 0]))

    # Compile + warm up
    force(train_fn(params, make_train_key(2), dtr, dva, lam))

    dts = []
    for rep in range(3):
        t0 = time.perf_counter()
        force(train_fn(params, jax.random.fold_in(make_train_key(3), rep),
                       dtr, dva, lam))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    steps_per_sec = cfg.n_iter / dt
    return {
        "metric": "beam_dpivae_train_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(
            steps_per_sec / TORCH_CPU_BASELINE_STEPS_PER_SEC, 2
        ),
    }


if __name__ == "__main__":
    import os
    import sys

    # Heal the known environment fault classes (attach hang -> subprocess-
    # probed wait; transient tunnel drop -> wait + retry; stale libtpu
    # compile cache -> clear + retry); deterministic failures propagate.
    from dpivae_tpu.utils.cache_guard import run_with_healing

    # Stdout hygiene: while the benchmark runs, fd 1 is rerouted to stderr
    # so environment noise (e.g. XLA:CPU AOT machine-feature warnings that
    # C++ code prints straight to stdout) cannot land near the result.
    # Real stdout then carries exactly ONE line, printed last: the JSON the
    # driver parses.
    sys.stdout.flush()
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        result = run_with_healing(main, wait_device=True)
    finally:
        sys.stdout.flush()
        os.dup2(real_stdout, 1)
        os.close(real_stdout)
    print(json.dumps(result), flush=True)
