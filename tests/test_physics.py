"""Physics models: closed-form values and parity with the torch reference
formulas (re-derived, not imported)."""

import jax.numpy as jnp
import numpy as np

from dpivae_tpu.physics import (
    euler_bernoulli_point_load,
    mass_spring,
    mass_spring_dashpot,
)


def _beam_reference_numpy(z, I=2e-6, L=1.0, P=1.0, npts=200):
    """Direct numpy transcription of the closed-form beam deflection
    (Euler-Bernoulli simply-supported, point load at a)."""
    x = np.linspace(0.0, L, npts)
    E = z[..., 0:1] * 1e6
    a = z[..., 1:2]
    b = L - a
    w = P * b * x * (L**2 - b**2 - x**2) / (6 * E * I * L)
    wb = P * (x - a) ** 3 / (6 * E * I)
    w = np.where(x > a, w + wb, w)
    return -1000.0 * w


def test_beam_matches_closed_form():
    z = np.array([[3.0, 0.5], [2.5, 0.3], [4.5, 0.7]], dtype=np.float32)
    got = np.asarray(euler_bernoulli_point_load(jnp.asarray(z), npts=32))
    want = _beam_reference_numpy(z, npts=32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_beam_boundary_conditions():
    # Simply supported: zero deflection at both ends
    z = jnp.array([[3.0, 0.5]])
    w = np.asarray(euler_bernoulli_point_load(z, npts=32))
    np.testing.assert_allclose(w[:, 0], 0.0, atol=1e-8)
    np.testing.assert_allclose(w[:, -1], 0.0, atol=1e-5)
    # Midspan load on a downward-positive scale: deflection peak near center
    assert np.argmin(w[0]) in range(12, 20)


def test_beam_batch_shapes():
    z = jnp.ones((5, 7, 2))
    assert euler_bernoulli_point_load(z, npts=32).shape == (5, 7, 32)


def test_mass_spring_period_and_amplitude():
    t = jnp.linspace(0.0, 9.95, 64)
    z = jnp.array([[1.0]])  # m=1, k=1 => omega=1, x(t)=cos(t)
    x = np.asarray(mass_spring(z, t))
    np.testing.assert_allclose(x[0], np.cos(np.asarray(t)), atol=1e-5)


def test_mass_spring_extra_latent_dims_ignored():
    t = jnp.linspace(0.0, 1.0, 8)
    z1 = jnp.array([[1.5]])
    z2 = jnp.array([[1.5, 99.0, -3.0]])
    np.testing.assert_allclose(
        np.asarray(mass_spring(z1, t)), np.asarray(mass_spring(z2, t)), atol=1e-6
    )


def test_mass_spring_dashpot_limits():
    """Zero damping at reference temperature reduces to the undamped model."""
    t = jnp.linspace(0.0, 5.0, 32)
    z = jnp.array([[1.3, 0.0, 20.0, 1.0]])  # c=0, T=T0 => k_T = k
    got = np.asarray(mass_spring_dashpot(z, t))
    want = np.asarray(mass_spring(jnp.array([[1.3]]), t))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mass_spring_dashpot_decays():
    t = jnp.linspace(0.0, 9.95, 200)
    z = jnp.array([[1.5, 1.0, 20.0, 1.0]])
    x = np.asarray(mass_spring_dashpot(z, t))[0]
    assert np.max(np.abs(x[150:])) < np.max(np.abs(x[:50]))
