"""Annealing-schedule demo plot (ref: utils/annealing.py:54-80 __main__).

    python scripts/plot_annealing.py [--n_iter 30000] [--out annealing.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_iter", type=int, default=30_000)
    parser.add_argument("--mu", type=float, default=0.1)
    parser.add_argument("--cov", type=float, default=0.15)
    parser.add_argument("--n_cycles", type=int, default=5)
    parser.add_argument("--R", type=float, default=0.5)
    parser.add_argument("--out", default="annealing.png")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import jax
    import numpy as np
    from matplotlib import pyplot as plt

    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.annealing import cyclical_schedule, sigmoid_schedule

    cyc = cyclical_schedule(args.n_iter, args.n_cycles, args.R)
    sig = sigmoid_schedule(args.n_iter, args.mu, args.cov)
    with on_host_cpu():
        t = np.arange(args.n_iter)
        y_cyc = np.asarray(jax.vmap(cyc)(t))
        y_sig = np.asarray(jax.vmap(sig)(t))

    fig, ax = plt.subplots()
    ax.plot(t, y_cyc, label="cyclical")
    ax.plot(t, y_sig, label="sigmoid")
    ax.legend()
    ax.grid()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
