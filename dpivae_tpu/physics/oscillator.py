"""Mass-spring oscillator physics.

``mass_spring`` is the frozen partial physics model of the damped-oscillator
case: an *undamped* unit-stiffness oscillator where only the mass is a latent
(ref: cases/damped_oscillator/mass_spring.py:8-28). ``mass_spring_dashpot``
is the full damped, temperature-dependent generator kept for data-provenance
parity (ref: mass_spring.py:31-67) — implemented with the closed-form damped
solution instead of an RK45 host solve so it is jittable and vmappable.
"""

import jax.numpy as jnp


def mass_spring(z, t):
    """Undamped oscillator response x(t) = x0 * cos(sqrt(k/m) t), k = x0 = 1.

    Args:
        z: (..., >=1) latents; z[..., 0] = mass.
        t: (npts,) time grid.

    Returns:
        (..., npts) displacement.
    """
    k = 1.0
    x0 = 1.0
    xd0 = 0.0
    m = z[..., 0:1]
    omega = jnp.sqrt(k / m)
    B = xd0 / omega
    return B * jnp.sin(omega * t) + x0 * jnp.cos(omega * t)


def mass_spring_dashpot(z, t, k=1.0, omega_f=None, T0=20.0, alpha_T=0.01):
    """Damped oscillator with temperature-dependent stiffness (closed form).

    Reproduces the dynamics of the reference's RK45 generator (ref:
    mass_spring.py:31-67) with zero forcing (A = 0, as used by the case):
    stiffness k_T = alpha_T*(T0 - T) + k, damping ratio from dashpot c.

    Args:
        z: (..., 4) inputs [m, c, T, x0].
        t: (npts,) time grid.

    Returns:
        (..., npts) displacement of the underdamped solution.
    """
    del omega_f  # forcing amplitude is zero in the case study
    m = z[..., 0:1]
    c = z[..., 1:2]
    T = z[..., 2:3]
    x0 = z[..., 3:4]
    xd0 = 0.0

    k_T = alpha_T * (T0 - T) + k
    omega0 = jnp.sqrt(k_T / m)
    zeta = c / (2.0 * jnp.sqrt(k_T * m))
    # Underdamped closed form (zeta < 1 across the case's parameter ranges)
    omega_d = omega0 * jnp.sqrt(jnp.maximum(1.0 - zeta**2, 1e-12))
    A = x0
    B = (xd0 + zeta * omega0 * x0) / omega_d
    return jnp.exp(-zeta * omega0 * t) * (
        A * jnp.cos(omega_d * t) + B * jnp.sin(omega_d * t)
    )
