"""Euler-Bernoulli simply-supported beam with a point load.

Closed-form deflection profile (ref: cases/simple_beam/simple_beam_model.py:
4-31). The reference's boolean-mask in-place add ``w[mask] += wb[mask]``
becomes a ``jnp.where`` select; the host-side range check on the load
position is dropped (inputs are squashed into (0, 1) by the encoder output
transform, so the constraint holds by construction — enforce it in data
generation, not inside jit).
"""

import jax.numpy as jnp


def euler_bernoulli_point_load(z, I=2e-6, L=1.0, P=1.0, npts=200):
    """Deflection of a simply-supported beam under a point load.

    Args:
        z: (..., 2) array; z[..., 0] = Young's modulus in MPa,
           z[..., 1] = load position a in [0, L].
        I: second moment of area.
        L: beam length.
        P: point load magnitude.
        npts: number of evaluation points along the beam.

    Returns:
        (..., npts) deflection in mm (negative down), scaled by -1000 as in
        the reference.
    """
    x = jnp.linspace(0.0, L, npts)
    E = z[..., 0:1] * 1e6
    a = z[..., 1:2]
    b = L - a

    w = P * b * x * (L**2 - b**2 - x**2) / (6.0 * E * I * L)
    wb = P * (x - a) ** 3 / (6.0 * E * I)
    w = jnp.where(x > a, w + wb, w)
    return -1000.0 * w
