"""Ablate the vmapped sweep train step to locate the scaling bottleneck.

Round-1 finding (VERDICT What's-weak #2): a 12-member vmapped chunk step
costs ~16x a single step for 12x the work. Suspects: per-member top_k batch
sampling, the dataset gather, per-step log-row assembly. This experiment
times the full member training (oscillator dpivae preset, short n_iter)
under vmap sizes {1, 12} with the batch sampler swapped between variants:

  topk    — current: top_k(uniform(1024), 64) + native gather
  randint — randint indices (with replacement; wrong dist, isolates top_k)
  onehot  — top_k indices + one-hot-matmul gather (isolates native gather)
  slice   — static x[:64] slice (no sampler, no gather; lower bound)

Run on the TPU: python benchmarks/experiments/sweep_ablation.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train import train as train_mod
from dpivae_tpu.sweep.sweep import build_member_fn

N_ITER = 3000


def samp_topk(key, x, c, y, n_train, n_batch):
    idx = jax.lax.top_k(jax.random.uniform(key, (n_train,)), n_batch)[1]
    return x[idx], c[idx], y[idx]


def samp_randint(key, x, c, y, n_train, n_batch):
    idx = jax.random.randint(key, (n_batch,), 0, n_train)
    return x[idx], c[idx], y[idx]


def samp_onehot(key, x, c, y, n_train, n_batch):
    idx = jax.lax.top_k(jax.random.uniform(key, (n_train,)), n_batch)[1]
    onehot = (idx[:, None] == jnp.arange(n_train)[None, :]).astype(x.dtype)
    xcy = jnp.concatenate([x, c, y], axis=-1)
    sel = onehot @ xcy
    return (
        sel[:, : x.shape[-1]],
        sel[:, x.shape[-1] : x.shape[-1] + c.shape[-1]],
        sel[:, x.shape[-1] + c.shape[-1] :],
    )


def samp_slice(key, x, c, y, n_train, n_batch):
    return x[:n_batch], c[:n_batch], y[:n_batch]


VARIANTS = {
    "topk": samp_topk,
    "randint": samp_randint,
    "onehot": samp_onehot,
    "slice": samp_slice,
}


def time_variant(name, fn, n_members):
    train_mod._sample_batch = fn
    case = get_case("damped_oscillator")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, patience=10**9, n_iter=N_ITER
    )
    member = build_member_fn(cfg, case)
    batched = jax.jit(jax.vmap(member))
    keys = jax.random.split(jax.random.PRNGKey(0), n_members)
    lams = jnp.linspace(-1.0, 1.0, n_members)

    def run():
        params, logs = batched(keys, lams)
        return float(np.asarray(logs.train[-1, -1, 0]))

    run()  # compile
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    rate = n_members * N_ITER / dt
    print(json.dumps({
        "variant": name, "n_members": n_members,
        "wall_s": round(dt, 3),
        "member_steps_per_sec": round(rate, 0),
        "us_per_chunk_step": round(1e6 * dt / N_ITER, 1),
    }), flush=True)


if __name__ == "__main__":
    orig = train_mod._sample_batch
    for n_members in (1, 12):
        for name, fn in VARIANTS.items():
            time_variant(name, fn, n_members)
    train_mod._sample_batch = orig
