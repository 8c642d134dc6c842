"""Pure-functional math utilities (ref: reference utils/).

Constants mirror reference utils/__init__.py:8-10; the ``device`` global and
eager ``.to(device)`` moves of the reference have no JAX equivalent — arrays
are placed by jit/sharding.
"""

import math

# -0.5 * log(2*pi), the Gaussian normalization constant
# (ref: utils/__init__.py:10)
GAUSSIAN_CONST = -0.5 * math.log(2.0 * math.pi)

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
