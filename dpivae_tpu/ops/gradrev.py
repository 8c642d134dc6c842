"""Gradient-reversal layer (GRL) as a jax.custom_vjp.

The adversarial-disentanglement mechanism of DPI-VAE: identity in the forward
pass, ``-alpha * g`` in the backward pass, so gradients flowing from the
data-driven decoder branch *push information out* of (z_c, z_y) whenever the
physics branch can explain it (ref: utils/transforms.py:202-238,
models/decoders.py:81-84).

``alpha`` is a traced array argument, not a Python constant, so λ-sweeps can
``vmap`` over it and annealing schedules can feed it per-step (SURVEY.md §7
"GRL under vmap"). The reference's annealing write was a dead attribute
assignment (SURVEY.md L1 note on dpivae.py:395); here annealing composes
correctly: pass ``alpha = lambda_g0 * schedule(step)``.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_reverse(x, alpha):
    """Identity forward; backward multiplies the cotangent by ``-alpha``."""
    del alpha
    return x


def _grad_reverse_fwd(x, alpha):
    return x, alpha


def _grad_reverse_bwd(alpha, g):
    # The cotangent must keep the primal's dtype (a bf16 decode path —
    # models/vae.py compute_dtype — hands bf16 cotangents through here
    # while alpha stays f32; the scale happens in the promoted dtype).
    return ((-g * alpha).astype(g.dtype), None)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


def maybe_grad_reverse(x, alpha):
    """Apply GRL unless ``alpha`` is None (disabled branch)."""
    if alpha is None:
        return x
    return grad_reverse(x, jnp.asarray(alpha))
