"""Defining a brand-new case study from scratch.

The three shipped cases import pretrained surrogates, but a ``Case`` only
needs callables: this example builds a toy *cantilever* case with a fully
analytic data generator and physics model, registers it, trains the S-model
briefly, and evaluates — demonstrating that the framework is extensible
beyond the reference's case studies.

Run: python examples/custom_case.py [--n_iter 2000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.cases import Case, Factor, PriorSpec, register_case
from dpivae_tpu.config import TrainConfig

ND_X = 32


def cantilever_tip_load(z, L=1.0, I=2e-6, npts=ND_X):
    """Deflection of a cantilever under a tip load: the known physics.
    z[..., 0] = Young's modulus E [MPa]."""
    x = jnp.linspace(0.0, L, npts)
    E = z[..., 0:1] * 1e6
    w = x**2 * (3 * L - x) / (6 * E * I)
    return -1000.0 * w


def full_response(z):
    """The "true" generative process: cantilever physics plus a
    temperature-dependent stiffness effect and a damage-dependent local
    softening — the parts the data-driven branch must learn."""
    E, d, T = z[..., 0:1], z[..., 1:2], z[..., 2:3]
    x = jnp.linspace(0.0, 1.0, ND_X)
    base = cantilever_tip_load(z)
    thermal = 1.0 + 0.01 * (T - 20.0)
    damage = 1.0 + d * jnp.exp(-((x - 0.3) ** 2) / 0.02)
    return base * thermal * damage


FACTORS = (
    Factor("E", 2.0, 6.0, "uniform", {"low": 2.5, "high": 4.5}, "x",
           r"$E$ [MPa]", 3.5),
    Factor("d", 0.0, 1.0, "uniform", {"low": 0.0, "high": 0.8}, "y",
           r"$d$ [-]", 0.2),
    Factor("T", 0.0, 40.0, "uniform", {"low": 5.0, "high": 35.0}, "c",
           r"$T$ [C]", 20.0),
)

PRIOR_X = (PriorSpec("E", 2.0, 6.0, "normal", {"loc": 3.5, "scale": 1.0}),)

PRESETS = {
    "dpivae": {"model_type": "S", "lambda_g0": 1 / 256, "lambda_x": None,
               "nz_c": 2, "nz_y": 2},
}


@register_case("cantilever")
def build() -> Case:
    return Case(
        name="cantilever",
        factors=FACTORS,
        prior_x=PRIOR_X,
        nd_x=ND_X,
        t_min=0.0,
        t_max=1.0,
        sigma_x=0.02,
        sigma_c=0.05,
        sigma_y=0.01,
        full_model=full_response,
        part_model=cantilever_tip_load,
        presets=PRESETS,
        x_unit="Distance [m]",
        y_unit="[mm]",
        ylim=(-6.0, 1.0),
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_iter", type=int, default=2000)
    args = parser.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.eval import disentanglement_metric, evaluate_model
    from dpivae_tpu.train import setup_model, train_model
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    case = get_case("cantilever")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=args.n_iter, name="cantilever",
        n_mc_test=64,
    )
    with on_host_cpu():
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        dist = case.gt_dist()
        dtr = jax.tree.map(np.asarray,
                           sample_response(case, ks[0], cfg.n_train, sample_dist=dist))
        dva = jax.tree.map(np.asarray,
                           sample_response(case, ks[1], cfg.n_val, sample_dist=dist))
        dte = jax.tree.map(np.asarray,
                           sample_response(case, ks[2], cfg.n_test, sample_dist=dist))

    model = setup_model(cfg, case, dtr)
    print(f"Training the custom cantilever case for {cfg.n_iter} iters ...")
    params, logs = train_model(cfg, model, case, dtr, dva,
                               key=jax.random.PRNGKey(1))
    i, e = logs.scalars("ELBO")
    print(f"ELBO {e[0]:.3f} -> {e[-1]:.3f} (stopped at {logs.stop_iter})")

    metrics, _ = evaluate_model(cfg, case, model, params, dte)
    print(f"damage-label test R2: {metrics['cantilever']['R2']}")
    rows = disentanglement_metric(cfg, model, params, case, dtr, dte)
    for block, factor, score in rows:
        print(f"  {block} -> {factor}: R2 = {score:.3f}")


if __name__ == "__main__":
    main()
