"""Model components: functional params-pytree modules.

Instead of translating the reference's ``nn.Module`` hierarchy
(reference models/), each component is an ``init(key, ...) -> params`` plus a
pure ``apply(params, ...)`` function over nested-dict pytrees. This keeps

- per-module optimizer groups a one-line optax ``multi_transform`` label map
  (the reference builds 10 Adam param groups, dpivae.py:335-363),
- sweep batching a plain ``jax.vmap`` over stacked params,
- torch state-dict import a mechanical ordered mapping.
"""

from dpivae_tpu.models import decoders, encoders, nn, vae  # noqa: F401
