"""Pin the XLA cost-analysis semantics the roofline script relies on.

benchmarks/experiments/roofline.py treats ``compiled.cost_analysis()`` of
the fused training program as the cost of ONE step, because XLA's
HloCostAnalysis counts a loop body once instead of multiplying by the
trip count. If a jax/XLA upgrade ever changes that, these tests fail and
the script's math must be revisited.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _load_roofline():
    path = os.path.join(
        os.path.dirname(__file__), "..", "benchmarks", "experiments",
        "roofline.py",
    )
    spec = importlib.util.spec_from_file_location("roofline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _flops(fn, *args):
    roofline = _load_roofline()
    f, _ = roofline.cost_of(jax.jit(fn).lower(*args).compile())
    return f


def test_cost_analysis_counts_loop_body_once():
    """Same scan at length 2 and length 1000 must report ~the same flops
    (body counted once) — the invariant roofline.py's per-step math rests
    on. If this starts scaling with trip count, the script must divide."""

    def make(n):
        def f(x):
            y, _ = jax.lax.scan(
                lambda c, _: (jnp.tanh(c @ c), ()), x, None, length=n
            )
            return y
        return f

    x = jnp.ones((32, 32))
    f2 = _flops(make(2), x)
    f1000 = _flops(make(1000), x)
    assert f2 is not None, "cost_analysis unavailable on CPU"
    matmul = 2 * 32**3  # the body's dominant cost
    assert f2 >= matmul
    # body-once: going 2 -> 1000 steps must not add another body's worth
    assert abs(f1000 - f2) < matmul / 2


def test_fused_train_step_cost_extraction():
    """The unroll-differencing method roofline.py ships must isolate one
    train step. The inner scan is val_freq - 1 = 9 steps (the block's
    first step + validation sit OUTSIDE it), so only unrolls dividing 9
    are remainder-free. Pins: (a) raw program cost is ~independent of
    n_iter (body counted once); (b) ((3,1)-(1,1))/2 is positive and at
    least the analytic flops of the step's largest matmul; (c) stable —
    ((9,1)-(1,1))/8 agrees within 30%; (d) the canary that caught the
    original bug: a NON-dividing unroll ((2,1)) inlines the remainder
    step and inflates the diff to ~2 steps — the script must never use
    one."""
    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.train import setup_model
    from dpivae_tpu.train.train import build_train_fn, make_train_key
    from dpivae_tpu.utils.data import sample_response

    case = get_case("simple_beam")

    def prog(n_iter):
        cfg = (
            TrainConfig()
            .with_preset(case.presets["dpivae"])
            .replace(use_seed=True, patience=10**9, n_iter=n_iter,
                     n_train=128, n_val=64)
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
        dva = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
        model = setup_model(cfg, case, dtr)
        params = model.init(jax.random.PRNGKey(1))
        lam = jnp.asarray(cfg.lambda_g0, jnp.float32)
        args = (params, make_train_key(2), tuple(dtr[:3]), tuple(dva[:3]), lam)
        return cfg, args

    cfg, args = prog(20)

    def flops_at(unroll):
        return _flops(build_train_fn(cfg, case, unroll=unroll), *args)

    f11 = flops_at((1, 1))
    assert f11 is not None and f11 > 0
    # body-once: 10x the steps must stay within 2x the cost
    cfg_l, args_l = prog(200)
    f_large = _flops(build_train_fn(cfg_l, case, unroll=(1, 1)), *args_l)
    assert f_large < 2 * f11

    assert cfg.val_freq == 10  # the divisor choices below assume L=9
    f31 = flops_at((3, 1))
    f91 = flops_at((9, 1))
    step_a = (f31 - f11) / 2
    step_b = (f91 - f11) / 8
    # encoder trunk matmul fwd: n_batch x nd_x @ nd_x x width
    floor = 2 * cfg.n_batch * 64 * 64
    assert step_a > floor
    assert abs(step_b - step_a) < 0.3 * step_a
    # the roofline module must pick a dividing unroll for L=9
    roofline = _load_roofline()
    assert roofline._unroll_divisor(9) == 3
    assert roofline._unroll_divisor(7) == 7  # prime within cap: full unroll
    # prime PAST the cap: never compile a giant body for analysis —
    # return 1, which step_cost treats as "skip the differencing"
    assert roofline._unroll_divisor(1023) == 3  # 1023 = 3*341, fine
    assert roofline._unroll_divisor(1021) == 1  # prime: skip
    assert roofline._unroll_divisor(34) == 2
    # canary: a NON-dividing unroll inlines the remainder step, which the
    # cost analysis counts in full — the diff then measures ~2 steps
    f21 = flops_at((2, 1))
    assert f21 - f11 > 1.5 * step_a
