"""Certify the batched MLP probe against sklearn at study scale.

The batched ``mlp_jax`` probe (eval/probes.py) deviates from sklearn's
``MLPRegressor(128, 128)`` (ref: dpivae.py:684-693) in two documented ways:
fixed-epoch Adam instead of a tol-based stop, and internally standardized
targets. Unit tests certify it at toy scale; this experiment certifies it at
REAL study scale: a >= 12-member λ-sweep at reference training scale, the
SAME extracted latents pushed through both probe backends, and the
per-(member, factor, block) R² differences committed as a CSV.

    python benchmarks/experiments/probe_certify.py \
        [--case damped_oscillator] [--n_runs 2] [--n_iter 20000]

Writes benchmarks/results/probe_certify_<case>.csv and prints a summary
(mean/p95/max |ΔR²|). The sklearn fits run in a process pool — 108 serial
MLPRegressor fits would take the better part of an hour.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def _sklearn_member(args):
    """One member's 3 x n_factors MLPRegressor fits (child process)."""
    lat_tr, lat_te, z_tr, z_te = args
    from sklearn.neural_network import MLPRegressor

    n_factors = z_tr.shape[1]
    scores = np.zeros((n_factors, 3))
    for i in range(n_factors):
        for k, block in enumerate(("zx", "zc", "zy")):
            rgr = MLPRegressor(hidden_layer_sizes=(128, 128), max_iter=20000)
            rgr.fit(lat_tr[block], z_tr[:, i])
            scores[i, k] = rgr.score(lat_te[block], z_te[:, i])
    return scores


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", default="damped_oscillator")
    parser.add_argument("--preset", default="dpivae")
    parser.add_argument("--n_runs", type=int, default=2)
    parser.add_argument("--n_iter", type=int, default=20000)
    parser.add_argument("--n_reg", type=int, default=2048)
    parser.add_argument("--probe_epochs", type=int, default=300)
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument(
        "--lambdas", type=float, nargs="*",
        default=[1.0, 0.1, 0.01, 0.0, 0.001, 0.0001],
        help="λ grid (x n_runs seeds -> members; default 6x2=12 members)",
    )
    args = parser.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.eval import batched_probe_scores
    from dpivae_tpu.sweep import sweep_disentanglement_latents, train_sweep

    case = get_case(args.case)
    cfg = TrainConfig().with_preset(case.presets[args.preset]).replace(
        use_seed=True, seed=args.seed, n_iter=args.n_iter
    )
    n_members = len(args.lambdas) * args.n_runs
    print(f"Training {n_members} members at {args.n_iter} iters ...",
          file=sys.stderr)
    t0 = time.perf_counter()
    result = train_sweep(
        cfg, case, lambdas=args.lambdas, n_runs=args.n_runs,
        key=jax.random.PRNGKey(args.seed),
    )
    latents = sweep_disentanglement_latents(
        cfg, case, result, args.n_reg, args.n_reg,
        key=jax.random.PRNGKey(args.seed + 1),
    )
    latents = {k: np.asarray(v) for k, v in latents.items()}
    print(f"train+latents: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    n_factors = len(case.factors)
    t0 = time.perf_counter()
    scores_jax = batched_probe_scores(
        {b: latents[f"{b}_train"] for b in ("zx", "zc", "zy")},
        {b: latents[f"{b}_test"] for b in ("zx", "zc", "zy")},
        latents["z_train"], latents["z_test"],
        n_factors=n_factors, regressor="mlp_jax",
        key=jax.random.PRNGKey(args.seed + 2), n_epochs=args.probe_epochs,
    )
    print(f"mlp_jax (all {n_members * n_factors * 3} probes, one program): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # sklearn on the SAME latents, one member per child process. Spawn
    # context: forking a live JAX (multithreaded) process can deadlock.
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    jobs = [
        (
            {b: latents[f"{b}_train"][m] for b in ("zx", "zc", "zy")},
            {b: latents[f"{b}_test"][m] for b in ("zx", "zc", "zy")},
            latents["z_train"][m], latents["z_test"][m],
        )
        for m in range(n_members)
    ]
    t0 = time.perf_counter()
    with ProcessPoolExecutor(
        max_workers=args.workers, mp_context=mp.get_context("spawn")
    ) as pool:
        scores_sk = np.stack(list(pool.map(_sklearn_member, jobs)))
    print(f"sklearn MLPRegressor ({args.workers} workers): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    lambdas_m = np.asarray(result.lambdas)
    rows = []
    for m in range(n_members):
        for i, factor in enumerate(case.factors):
            for k, block in enumerate(("zx", "zc", "zy")):
                rows.append([
                    m, float(lambdas_m[m]), factor.name, block,
                    float(scores_jax[m, i, k]), float(scores_sk[m, i, k]),
                    float(scores_jax[m, i, k] - scores_sk[m, i, k]),
                ])

    import pandas as pd

    df = pd.DataFrame(
        rows,
        columns=["member", "lambda", "factor", "block", "r2_jax",
                 "r2_sklearn", "diff"],
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
    )
    os.makedirs(out_dir, exist_ok=True)
    out_csv = os.path.join(out_dir, f"probe_certify_{args.case}.csv")
    df.to_csv(out_csv, index=False)

    adiff = np.abs(df["diff"].to_numpy())
    print(
        f"probes={len(df)} members={n_members} "
        f"mean|dR2|={adiff.mean():.4f} p95|dR2|={np.quantile(adiff, 0.95):.4f} "
        f"max|dR2|={adiff.max():.4f}"
    )
    print(f"Wrote {out_csv}")


if __name__ == "__main__":
    main()
