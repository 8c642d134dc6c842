"""Compare the pallas fused-MLP decoder path against the XLA path on TPU.

Checks numeric parity of loss/gradients between ``use_pallas`` on/off and
times the fused train step at single-run and sweep-like row counts.

Run (needs the TPU free): python benchmarks/pallas_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.ops.pallas_mlp import _reference_mlp, fused_mlp
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils import on_host_cpu
from dpivae_tpu.utils.data import sample_response


def _force(x):
    return float(np.asarray(x).ravel()[0])


def kernel_microbench(rows: int, d_in: int = 4, d_h: int = 128, d_out: int = 32,
                      reps: int = 30):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (rows, d_in))
    w0 = jax.random.normal(ks[1], (d_in, d_h)) * 0.3
    b0 = jax.random.normal(ks[2], (d_h,)) * 0.1
    w1 = jax.random.normal(ks[3], (d_h, d_out)) * 0.3
    b1 = jax.random.normal(ks[4], (d_out,)) * 0.1

    def loop(f):
        def body(c, _):
            return c, jnp.sum(f(c, w0, b0, w1, b1))
        def run(x):
            _, ys = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(ys)
        return jax.jit(run)

    out_p = loop(fused_mlp)
    out_r = loop(_reference_mlp)
    # parity
    np.testing.assert_allclose(
        np.asarray(fused_mlp(x, w0, b0, w1, b1)),
        np.asarray(_reference_mlp(x, w0, b0, w1, b1)),
        rtol=2e-5, atol=2e-5,
    )
    res = {}
    for name, f in (("pallas", out_p), ("xla", out_r)):
        _force(f(x))
        t0 = time.perf_counter()
        _force(f(x))
        res[name] = (time.perf_counter() - t0) / reps * 1e6
    return res


def main():
    print(json.dumps({"rows_1024": kernel_microbench(1024)}))
    print(json.dumps({"rows_65536": kernel_microbench(65536)}))

    # End-to-end: beam-S train program with/without pallas decoder
    from dpivae_tpu.train.train import build_train_fn

    case = get_case("simple_beam")
    results = {}
    for use_pallas in (False, True):
        cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
            use_seed=True, patience=10**9, n_iter=4000, val_freq=4000,
            use_pallas=use_pallas,
        )
        with on_host_cpu():
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            dtr = jax.tree.map(np.asarray, sample_response(
                case, k1, cfg.n_train, sample_dist=case.gt_dist())[:3])
            dva = jax.tree.map(np.asarray, sample_response(
                case, k2, cfg.n_val, sample_dist=case.gt_dist())[:3])
        model = setup_model(cfg, case, dtr + (None,))
        fn = jax.jit(build_train_fn(cfg, case))
        with on_host_cpu():
            params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(1)))
        lam = jnp.asarray(cfg.lambda_g0)
        out = fn(params, jax.random.PRNGKey(2), dtr, dva, lam)
        _force(out[1].train[-1, 0])
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(3), dtr, dva, lam)
        elbo = _force(out[1].train[-1, 0])
        dt = time.perf_counter() - t0
        results["pallas" if use_pallas else "xla"] = {
            "steps_per_sec": round(cfg.n_iter / dt, 1),
            "final_elbo": round(elbo, 4),
        }
    print(json.dumps({"train_4000_iters": results}))


if __name__ == "__main__":
    main()
