"""Measure batched-sweep training throughput.

The reference's disentanglement study trains 66 models serially
(11 λ × 6 seeds, reference 1_disentanglement_metric.py:54-56). Here the full
grid trains as one vmapped program; this benchmark times it and reports
aggregate model-steps/sec plus the implied wall-clock for the whole study,
vs the torch-CPU serial estimate (48.2 steps/s incl. validation =>
66 × 20000 / 48.2 ≈ 7.6 hours).

Run: python benchmarks/sweep_bench.py [--n_members 66] [--n_iter 2000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.sweep import train_sweep

TORCH_CPU_BASELINE_STEPS_PER_SEC = 48.19


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default="damped_oscillator")
    parser.add_argument("--n_members", type=int, default=66)
    parser.add_argument("--n_iter", type=int, default=2000)
    args = parser.parse_args()

    case = get_case(args.case)
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, patience=10**9, n_iter=args.n_iter
    )
    lambdas = np.linspace(-1.0, 1.0, args.n_members)

    def run(key):
        res = train_sweep(cfg, case, lambdas=lambdas, n_runs=1,
                          key=jax.random.PRNGKey(key))
        # Force execution with a host transfer (block_until_ready is
        # unreliable on the tunneled backend)
        return float(np.asarray(res.logs.train[-1, -1, 0]))

    run(0)  # compile + warmup
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0

    model_steps_per_sec = args.n_members * args.n_iter / dt
    serial_cpu_sec = args.n_members * args.n_iter / TORCH_CPU_BASELINE_STEPS_PER_SEC
    print(json.dumps({
        "metric": "sweep_model_steps_per_sec",
        "value": round(model_steps_per_sec, 1),
        "unit": "member-steps/s",
        "n_members": args.n_members,
        "n_iter": args.n_iter,
        "wall_s": round(dt, 2),
        "vs_serial_cpu": round(serial_cpu_sec / dt, 1),
    }))


if __name__ == "__main__":
    main()
