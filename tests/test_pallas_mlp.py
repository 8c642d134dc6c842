"""Fused-MLP kernel: value and gradient parity with the jnp reference.

On the CPU test backend the pallas path falls back to jnp (eligibility
check), so these tests pin the *contract*; TPU-path numerical parity is
exercised by benchmarks/pallas_bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.ops.pallas_mlp import _reference_mlp, fused_mlp


def _inputs(rows=64, d_in=4, d_hidden=128, d_out=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        jax.random.normal(ks[0], (rows, d_in)),
        jax.random.normal(ks[1], (d_in, d_hidden)) * 0.3,
        jax.random.normal(ks[2], (d_hidden,)) * 0.1,
        jax.random.normal(ks[3], (d_hidden, d_out)) * 0.3,
        jax.random.normal(ks[4], (d_out,)) * 0.1,
    )


def test_forward_matches_reference():
    args = _inputs()
    np.testing.assert_allclose(
        np.asarray(fused_mlp(*args)),
        np.asarray(_reference_mlp(*args)),
        rtol=1e-5, atol=1e-5,
    )


def test_leading_axes_preserved():
    x, w0, b0, w1, b1 = _inputs()
    x3 = jnp.reshape(x, (16, 4, 4))
    out = fused_mlp(x3, w0, b0, w1, b1)
    assert out.shape == (16, 4, 32)


def test_custom_vjp_matches_autodiff():
    args = _inputs(rows=32)

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_mlp(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_jit_and_vmap():
    x, w0, b0, w1, b1 = _inputs()
    xs = jnp.stack([x, x + 1.0])
    out = jax.jit(jax.vmap(lambda xx: fused_mlp(xx, w0, b0, w1, b1)))(xs)
    assert out.shape == (2, 64, 32)
    assert np.all(np.isfinite(np.asarray(out)))
