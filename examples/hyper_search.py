"""Hyperparameter search as ONE compiled program.

The reference has no hyperparameter search — its only sweep is the λ-grid,
trained serially. Here a grid over any traceable config fields (per-group
learning rates, weight decays, grad-clip norm, β/α loss weights; see
``train.TRACEABLE_HYPER_FIELDS``) trains as a single vmapped XLA program:
the values are *traced member inputs*, so the whole grid costs one compile
regardless of its size. Like every sweep trainer it also takes
``checkpoint_dir=`` (chunk-level resume, manifest-guarded) and
``chunk_callback=`` (stream completed chunks during training).

This demo crosses learning rate × weight decay for the beam S-model and
ranks the grid by seed-averaged final validation loss.

Run: python examples/hyper_search.py [--n_iter 2000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_iter", type=int, default=2000)
    parser.add_argument("--n_runs", type=int, default=2)
    args = parser.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=args.n_iter
    )

    # Cross product -> pre-crossed columns (members are rows, not axes)
    lrs, wds = np.meshgrid([3e-4, 1e-3, 3e-3], [0.0, 1e-3])
    grid = {"lr_e": lrs.ravel(), "wd_e": wds.ravel()}
    n_rows = lrs.size

    print(
        f"Training {n_rows} grid points x {args.n_runs} seeds "
        f"({n_rows * args.n_runs} members) as one batched program ..."
    )
    res = train_hyper_sweep(
        cfg, case, grid=grid, n_runs=args.n_runs, key=jax.random.PRNGKey(0)
    ).host()

    # Mean final val loss per grid row, over seeds
    final = res.logs.val[:, -1, 0].reshape(n_rows, args.n_runs).mean(axis=1)
    order = np.argsort(final)
    for i in order:
        ov = res.member_overrides(i * args.n_runs)
        print(
            f"  lr_e={ov['lr_e']:8.1e}  wd_e={ov['wd_e']:8.1e}  "
            f"val loss {final[i]:+.4f}"
        )
    best = res.member_overrides(int(order[0]) * args.n_runs)
    print(f"best: {best}")
    assert np.all(np.isfinite(final))
    print("hyper_search OK")


if __name__ == "__main__":
    main()
