"""use_pallas model path equals the plain path (fallback on CPU; on-TPU
numeric parity benchmarked by benchmarks/pallas_bench.py)."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils.data import sample_response


def test_pallas_flag_matches_plain_model():
    case = get_case("simple_beam")
    base = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=32, n_batch=32, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), 32,
                           sample_dist=case.gt_dist())
    m_plain = setup_model(base, case, data)
    m_pallas = setup_model(base.replace(use_pallas=True), case, data)
    params = m_plain.init(jax.random.PRNGKey(1))

    k = jax.random.PRNGKey(2)
    x, c, y = data[0], data[1], data[2]
    out_a = m_plain.loss(params, k, x, c, y, n=3, grl_alpha=base.lambda_g0)
    out_b = m_pallas.loss(params, k, x, c, y, n=3, grl_alpha=base.lambda_g0)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # gradients identical too (custom VJP vs autodiff)
    def total(model):
        def f(p):
            return jax.numpy.sum(
                model.loss(p, k, x, c, y, n=2, grl_alpha=base.lambda_g0)[0]
            )
        return f

    g_a = jax.grad(total(m_plain))(params)
    g_b = jax.grad(total(m_pallas))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
