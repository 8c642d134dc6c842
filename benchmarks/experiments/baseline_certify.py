"""Certify the batched comparison baselines against sklearn at study scale.

The transfer study's comparison baselines (ref: dpivae.py:561-615 via
2_regression_comparison.py:191-193) are LIN / GPR(RBF+White) / MLP(64,64)
sklearn fits per (run, domain) member. ``eval/baselines.py`` fits each
family for ALL members as one batched device program. This experiment
builds the REAL study members (bridge quadrant folds at reference data
scale), pushes the SAME datasets through both backends, and commits the
per-(member, model, y-dim) R² pairs.

    python benchmarks/experiments/baseline_certify.py \
        [--case bridge] [--dist_type extrapolation] [--n_runs 2]

Writes benchmarks/results/baseline_certify_<case>.csv and prints a summary
(per-model mean/max |ΔR²| and both backends' wall time).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

N_DOMAINS = 4


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", default="bridge")
    parser.add_argument("--dist_type", default="extrapolation",
                        choices=["interpolation", "extrapolation"])
    parser.add_argument("--n_runs", type=int, default=2)
    parser.add_argument("--mlp_epochs", type=int, default=300)
    parser.add_argument("--seed", type=int, default=123)
    args = parser.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.eval import run_comparison_batched
    from dpivae_tpu.eval.evaluate import run_comparison
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response
    from dpivae_tpu.utils.priors import make_square_dist

    case = get_case(args.case)
    cfg = TrainConfig().replace(use_seed=True, seed=args.seed)
    if args.dist_type == "interpolation":
        dists_train, dists_test = make_square_dist(case)
    else:
        dists_test, dists_train = make_square_dist(case)

    # The exact member construction of scripts/2_regression_comparison.py
    key = jax.random.PRNGKey(args.seed)
    members = []
    with on_host_cpu():
        for j in range(args.n_runs):
            for i in range(N_DOMAINS):
                k = jax.random.fold_in(key, j * N_DOMAINS + i)
                k_tr, k_va, k_te = jax.random.split(k, 3)
                dtr = sample_response(case, k_tr, cfg.n_train,
                                      sample_dist=dists_train[i])
                dte = sample_response(case, k_te, cfg.n_test,
                                      sample_dist=dists_test[i])
                members.append(jax.tree.map(np.asarray, (dtr, dte)))
    n_members = len(members)

    def stack(idx):
        return tuple(
            np.stack([np.asarray(m[idx][k]) for m in members])
            for k in range(3)
        )

    data_train_stack, data_test_stack = stack(0), stack(1)

    # Separate the tunnel attach from the measured backend times
    float(np.asarray(jax.jit(lambda a: a + 1)(jax.numpy.zeros(()))))

    t0 = time.perf_counter()
    metrics_jax, _ = run_comparison_batched(
        data_train_stack, data_test_stack,
        key=jax.random.fold_in(key, 777),
        mlp_kwargs={"n_epochs": args.mlp_epochs},
    )
    t_jax = time.perf_counter() - t0
    print(f"batched jax backend ({n_members} members x 3 models): "
          f"{t_jax:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    metrics_sk = []
    for m, (dtr, dte) in enumerate(members):
        print(f"sklearn member {m + 1}/{n_members}", file=sys.stderr)
        metrics, _ = run_comparison(cfg, case, dtr, dte)
        metrics_sk.append(metrics)
    t_sk = time.perf_counter() - t0
    print(f"serial sklearn backend: {t_sk:.1f}s", file=sys.stderr)

    rows = []
    for m in range(n_members):
        j, i = divmod(m, N_DOMAINS)
        for model in ("LIN", "GPR", "MLP"):
            r2_j = np.atleast_1d(metrics_jax[m][model]["R2"])
            r2_s = np.atleast_1d(metrics_sk[m][model]["R2"])
            for q in range(r2_j.shape[0]):
                rows.append([
                    m, j, i + 1, model, q,
                    float(r2_j[q]), float(r2_s[q]),
                    float(r2_j[q] - r2_s[q]),
                ])

    import pandas as pd

    df = pd.DataFrame(rows, columns=[
        "member", "run", "domain", "model", "y_dim",
        "r2_jax", "r2_sklearn", "diff",
    ])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
    )
    os.makedirs(out_dir, exist_ok=True)
    out_csv = os.path.join(out_dir, f"baseline_certify_{args.case}.csv")
    df.to_csv(out_csv, index=False)

    for model in ("LIN", "GPR", "MLP"):
        d = np.abs(df.loc[df["model"] == model, "diff"].to_numpy())
        print(f"{model}: mean|dR2|={d.mean():.4f} max|dR2|={d.max():.4f}")
    print(f"timing: jax={t_jax:.1f}s sklearn={t_sk:.1f}s "
          f"({t_sk / max(t_jax, 1e-9):.1f}x)")
    print(f"Wrote {out_csv}")


if __name__ == "__main__":
    main()
