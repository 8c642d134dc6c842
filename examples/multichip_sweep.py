"""Multi-chip training without multi-chip hardware.

Demonstrates the framework's two real sharding axes on a *virtual* CPU
mesh (``--xla_force_host_platform_device_count``), exactly how the test
suite and the driver's dry run validate them:

1. **Sweep-member sharding** — a λ-sweep's members are embarrassingly
   parallel; ``train_sweep(mesh=...)`` shards the member axis so each
   device trains its own members. ICI carries nothing but the final
   gathered results.
2. **Data parallelism** — ``train_model(mesh=...)`` shards every
   minibatch and the validation pass over the ``dp`` axis with params
   replicated; XLA's SPMD partitioner inserts the gradient all-reduces
   derived from the sharding annotations (no hand-written collectives).

On a real TPU pod slice the same code runs unchanged — the mesh just maps
to real chips and the collectives ride ICI.

Run: python examples/multichip_sweep.py [--n_devices 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_devices", type=int, default=8)
    parser.add_argument("--n_iter", type=int, default=200)
    args = parser.parse_args()

    # Virtual device setup must happen before jax initializes its backend.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.n_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.parallel import make_mesh
    from dpivae_tpu.sweep import train_sweep
    from dpivae_tpu.train import setup_model, train_model
    from dpivae_tpu.utils.data import sample_response

    print(f"devices: {jax.devices()}")
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_train=256, n_val=64, n_batch=32,
        n_iter=args.n_iter, val_freq=20, n_mc_train=4, n_mc_val=4,
    )

    # --- 1. λ-sweep with the member axis sharded over all devices -------
    mesh = make_mesh(args.n_devices, axes=("sweep",))
    lambdas = np.linspace(-1.0, 1.0, args.n_devices)
    res = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, mesh=mesh)
    final = np.asarray(res.logs.val[:, -1, 0])
    print(f"sweep over {mesh.shape}: final val losses {final.round(3)}")
    assert np.all(np.isfinite(final))

    # --- 2. one training, data-parallel over the same devices -----------
    mesh = make_mesh(args.n_devices, axes=("dp",))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtr = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    dva = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, dtr)
    params, logs = train_model(cfg, model, case, dtr, dva, mesh=mesh)
    elbo = np.asarray(logs.scalars("ELBO_val")[1])
    print(f"dp over {mesh.shape}: val ELBO {elbo[0]:.3f} -> {elbo[-1]:.3f}")
    assert elbo[-1] < elbo[0], "training should reduce val ELBO"

    # --- 3. both at once: a 2-D (sweep x dp) mesh -----------------------
    # Members shard over "sweep" while each member's minibatches and
    # validation pass shard over "dp" — one program, both parallelisms;
    # XLA composes the shardings (vmap names the member axis via
    # spmd_axis_name so the dp constraints don't conflict).
    n_sweep = 2 if args.n_devices % 2 == 0 else 1
    mesh = make_mesh(
        args.n_devices, axes=("sweep", "dp"),
        shape=(n_sweep, args.n_devices // n_sweep),
    )
    lambdas = np.linspace(-1.0, 1.0, n_sweep)
    res = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, mesh=mesh)
    final = np.asarray(res.logs.val[:, -1, 0])
    print(f"sweep x dp over {mesh.shape}: final val losses {final.round(3)}")
    assert np.all(np.isfinite(final))
    print("multichip_sweep OK")


if __name__ == "__main__":
    main()
