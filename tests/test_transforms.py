"""Unit tests for bijectors: round-trips and log-dets vs numerical Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.utils.transforms import (
    Chain,
    Identity,
    Logistic,
    MaskedChain,
    ShiftScale,
    StandardScaler,
)


def numerical_log_det(fn, z):
    """log|det J| of fn at a single point z (1-D input)."""
    J = jax.jacfwd(lambda v: fn(v)[0])(z)
    return jnp.linalg.slogdet(J)[1]


def test_standard_scaler_roundtrip():
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (100, 5)) * 3.0 + 2.0
    sc = StandardScaler.fit(data)
    z, ld_f = sc.forward(data)
    assert np.allclose(np.mean(np.asarray(z), axis=0), 0.0, atol=1e-5)
    assert np.allclose(np.std(np.asarray(z), axis=0), 1.0, atol=1e-5)
    back, ld_i = sc.inverse(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(data), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)


def test_standard_scaler_log_det_numerical():
    data = np.random.RandomState(0).randn(50, 3).astype(np.float32) * 2 + 1
    sc = StandardScaler.fit(data)
    z0 = jnp.asarray(data[0])
    ld = sc.forward(z0[None])[1][0]
    np.testing.assert_allclose(
        float(ld),
        float(numerical_log_det(lambda v: (sc.forward(v[None])[0][0], None), z0)),
        rtol=1e-4,
    )


def test_shift_scale():
    ss = ShiftScale(jnp.array([2.0, 0.0]), jnp.array([6.0, 1.0]))
    z = jnp.array([[0.5, 0.5]])
    out, ld = ss.forward(z)
    np.testing.assert_allclose(np.asarray(out), [[4.0, 0.5]], atol=1e-6)
    # log_det = log(4) + log(1)
    np.testing.assert_allclose(float(ld[0]), np.log(4.0), rtol=1e-5)
    back, ld_i = ss.inverse(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-6)
    np.testing.assert_allclose(float(ld[0] + ld_i[0]), 0.0, atol=1e-5)


def test_logistic_log_det_numerical():
    lg = Logistic(k=1.0)
    z0 = jnp.array([0.3, -1.2, 2.0])
    _, ld = lg.forward(z0[None])
    np.testing.assert_allclose(
        float(ld[0]),
        float(numerical_log_det(lambda v: lg.forward(v), z0)),
        rtol=1e-4,
    )
    # range is (0, 1)
    out, _ = lg.forward(jnp.linspace(-10, 10, 7)[None])
    assert np.all(np.asarray(out) > 0) and np.all(np.asarray(out) < 1)


def test_logistic_inverse_raises():
    with pytest.raises(NotImplementedError):
        Logistic().inverse(jnp.zeros((1, 2)))


def test_chain_accumulates_log_det():
    lg = Logistic(k=1.0)
    ss = ShiftScale(jnp.array([2.0, 0.01]), jnp.array([6.0, 0.99]))
    chain = Chain(lg, ss)
    z0 = jnp.array([0.1, -0.4])
    out, ld = chain.forward(z0[None])
    np.testing.assert_allclose(
        float(ld[0]),
        float(numerical_log_det(lambda v: chain.forward(v), z0)),
        rtol=1e-4,
    )
    # output within bounds
    assert 2.0 < float(out[0, 0]) < 6.0
    assert 0.01 < float(out[0, 1]) < 0.99


def test_masked_chain_only_touches_masked_dims():
    lg = Logistic(k=1.0)
    ss = ShiftScale(jnp.array([2.0, 0.01]), jnp.array([6.0, 0.99]))
    mc = MaskedChain([0, 1], lg, ss)
    z = jnp.array([[0.2, -0.5, 3.0, -3.0]])
    out, ld = mc.forward(z)
    # untouched dims pass through
    np.testing.assert_allclose(np.asarray(out[0, 2:]), [3.0, -3.0], atol=1e-6)
    # masked dims squashed into bounds
    assert 2.0 < float(out[0, 0]) < 6.0
    # log-det equals the chain's log-det on the masked slice
    _, ld_chain = Chain(lg, ss).forward(z[..., :2])
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_chain), atol=1e-6)


def test_masked_chain_functional_no_mutation():
    mc = MaskedChain([0], Logistic(k=1.0))
    z = jnp.array([[1.0, 2.0]])
    out, _ = mc.forward(z)
    # input unchanged (no in-place mutation, unlike the torch reference)
    np.testing.assert_allclose(np.asarray(z), [[1.0, 2.0]])
    assert float(out[0, 0]) != 1.0


def test_identity():
    ident = Identity()
    z = jnp.ones((3, 2))
    out, ld = ident.forward(z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z))
    np.testing.assert_allclose(np.asarray(ld), 0.0)


def test_transforms_jittable():
    sc = StandardScaler(mean=jnp.zeros((1, 2)), scale=jnp.ones((1, 2)) * 2)

    @jax.jit
    def f(z):
        return sc.forward(z)[0]

    out = f(jnp.ones((4, 2)))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
