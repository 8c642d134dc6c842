"""Pure-functional math utilities (ref: reference utils/).

Constants mirror reference utils/__init__.py:8-10; the ``device`` global and
eager ``.to(device)`` moves of the reference have no JAX equivalent — arrays
are placed by jit/sharding.
"""

import contextlib
import math

# -0.5 * log(2*pi), the Gaussian normalization constant
# (ref: utils/__init__.py:10)
GAUSSIAN_CONST = -0.5 * math.log(2.0 * math.pi)

# Infinity constants (ref: utils/__init__.py:8-9)
NEG_INF = float("-inf")
POS_INF = float("inf")

# Plotting constants (ref: utils/__init__.py:13-15)
CMAP_NAME = "plasma"
ALPHA_INTERP = 0.01
CMAP_VARS = {
    "x": "tab:blue",
    "c": "tab:green",
    "y": "tab:orange",
    "f": "tab:red",
    "p": "tab:cyan",
}


@contextlib.contextmanager
def on_host_cpu():
    """Run eager (un-jitted) array math on the CPU backend.

    On the TPU tunnel used here, every *new* eager op triggers a ~1s remote
    compile, so host-phase glue (data sampling for plots/eval, scaler fits)
    must not run op-by-op on the accelerator. Inside this context, eager
    ops execute on local CPU; jitted calls still place on the default
    accelerator explicitly via their own shardings.
    """
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # no cpu backend registered
        yield None
        return
    with jax.default_device(cpu):
        yield cpu
