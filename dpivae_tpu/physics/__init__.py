"""Analytic physics models as pure jnp functions.

These are the frozen "partial" physics decoders of the case studies. The
reference implements them in torch with in-place masked updates and host-side
input validation (cases/simple_beam/simple_beam_model.py:4-31,
cases/damped_oscillator/mass_spring.py:8-28); here they are branch-free,
static-shape jnp functions that fuse into the decoder's XLA program.
"""

from dpivae_tpu.physics.beam import euler_bernoulli_point_load  # noqa: F401
from dpivae_tpu.physics.oscillator import (  # noqa: F401
    mass_spring,
    mass_spring_dashpot,
)
