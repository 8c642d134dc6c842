"""Fused 2-layer MLP (linear -> ReLU -> linear) as a Pallas TPU kernel.

This is the innermost hot op of the model family: the data-driven decoder
branch (nz_d -> 128 -> nd_x, ref models/decoders.py:74-87), the encoder
trunk+heads, and the aux decoders are all tiny 2-layer MLPs evaluated over
(MC x batch) rows. XLA already fuses these well at single-run sizes; the
Pallas path exists for the sweep regime, where the row dimension is
members x MC x batch (tens of thousands) and a single fused kernel holding
both weight matrices in VMEM avoids two HBM round-trips for the (rows, 128)
intermediate.

The kernel tiles rows into ``block_rows`` chunks (grid over rows); weights
are small enough (<=256x256) to live fully in VMEM per program. A custom
VJP reuses the same kernel machinery for the backward matmuls.

Use ``fused_mlp(x, w0, b0, w1, b1)``; falls back to plain jnp when shapes
don't meet the tiling constraints or on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK_ROWS = 256


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref):
    h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0)
    out_ref[:] = (
        jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    )


def _mlp_hidden_kernel(x_ref, w0_ref, b0_ref, out_ref):
    h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.maximum(h + b0_ref[:], 0.0)


def _pallas_forward(x2d, w0, b0, w1, b1, block_rows: int):
    rows = x2d.shape[0]
    d_in, d_hidden = w0.shape
    d_out = w1.shape[1]
    grid = (pl.cdiv(rows, block_rows),)
    return pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d_out), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_hidden, d_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, w0, b0[None, :], w1, b1[None, :])


def _pallas_hidden(x2d, w0, b0, block_rows: int):
    rows = x2d.shape[0]
    d_in, d_hidden = w0.shape
    grid = (pl.cdiv(rows, block_rows),)
    return pl.pallas_call(
        _mlp_hidden_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d_hidden), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d_hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, w0, b0[None, :])


def _reference_mlp(x, w0, b0, w1, b1):
    return jnp.maximum(x @ w0 + b0, 0.0) @ w1 + b1


# Measured pallas-vs-XLA decision boundary for ``use_pallas="auto"``
# (benchmarks/experiments/scaling.py; committed data in
# benchmarks/results/scaling.json, measured on TPU v5e 2026-08-19).
# Kernel-level, XLA's automatic fusion beats this kernel almost
# everywhere (microbench ratios 0.38-1.0; tiny wins only for fwd+bwd at
# rows=65536 x hidden>=512). But the FULL train program is reproducibly
# ~14% FASTER with the kernel at decoder rows>=65536 x hidden=256
# (w256_b1024_mc64: 1.149, repeat-confirmed 1.143/1.144 across fresh
# compiles with the persistent cache disabled — scaling.json "repeats").
# The win is not kernel-local (the microbench LOSES 2.6x at that exact
# shape in isolation): routing the MLP through the custom call changes
# XLA's surrounding fusion/layout decisions where the fused 65536x256
# intermediate is pathological. Neighbors measure ~neutral-to-worse
# (w128: 0.61, w512: 0.98, w1024: 1.006), so "auto" enables the kernel
# ONLY inside the measured-win band below and keeps XLA elsewhere.
# The grid's four single-shot NEIGHBOR "wins" outside the band
# (w512_b256_mc16 1.058, w1024_b256_mc16 1.067, w1024_b1024_mc16 1.047,
# w512_b64_mc64 1.029) were put through the same fresh-process,
# cache-disabled repeat protocol on 2026-08-20 and are NOISE: repeats
# span 0.850-1.119 with per-cell means 0.89-1.04 (scaling.json
# "repeats"). Single-shot grid ratios carry ~+-10% compile noise; only
# the repeat-confirmed band below is trusted, and it stays as-is.
_AUTO_MIN_ROWS = 65536
_AUTO_MIN_HIDDEN = 256   # the measured-win band is exactly hidden 256:
_AUTO_MAX_HIDDEN = 256   # >=512 measured ~1.0x, 128 measured 0.61x
# The TPU generation the band was measured on. The win is a fusion/layout
# artifact of THIS device's compiler/hardware pairing, so "auto" does not
# assume it transfers: on a different device_kind auto_select warns once
# and keeps the XLA path (explicit use_pallas=True remains available).
_AUTO_DEVICE_KIND = "TPU v5 lite"
_warned_device_kind: set = set()


def _device_kind_matches() -> bool:
    """True when the current backend's band measurement applies: non-TPU
    backends pass through (``_eligible`` already keeps them on XLA, and
    CPU unit tests exercise the band logic itself); a TPU of a different
    generation gets a one-time warning and False."""
    if jax.default_backend() != "tpu":
        return True
    kind = jax.devices()[0].device_kind
    if kind == _AUTO_DEVICE_KIND:
        return True
    if kind not in _warned_device_kind:
        _warned_device_kind.add(kind)
        import warnings

        warnings.warn(
            f"use_pallas='auto': the measured win band was established on "
            f"{_AUTO_DEVICE_KIND!r} but this device is {kind!r}; keeping "
            f"the XLA path. Re-run benchmarks/experiments/scaling.py on "
            f"this device and update ops/pallas_mlp.py's _AUTO_* constants "
            f"(or set use_pallas=True explicitly) if the kernel wins here."
        )
    return False


def auto_select(rows: int, d_in: int, d_hidden: int, d_out: int) -> bool:
    """Resolve ``use_pallas="auto"`` for a fused-MLP call shape.

    Returns True only inside the band where the FULL train program
    MEASURED (and repeat-confirmed) faster with the pallas kernel on the
    TPU generation named by ``_AUTO_DEVICE_KIND`` (see module constants
    above); other TPU kinds fall back to XLA with a one-time warning, and
    the call-time ``_eligible`` fallback still guards non-TPU backends,
    so a True here is safe everywhere.
    """
    if _AUTO_MIN_ROWS is None or _AUTO_MIN_HIDDEN is None:
        return False
    if d_hidden % 128:  # kernel-ineligible shape
        return False
    in_band = (rows >= _AUTO_MIN_ROWS
               and _AUTO_MIN_HIDDEN <= d_hidden
               and (_AUTO_MAX_HIDDEN is None or d_hidden <= _AUTO_MAX_HIDDEN))
    return in_band and _device_kind_matches()


def _eligible(x, w0, w1) -> bool:
    if not _HAS_PLTPU or jax.default_backend() != "tpu":
        return False
    # Lane-dim alignment: last dims should be multiples of 128 to tile the
    # MXU cleanly; tiny dims (<8) would waste the kernel.
    return w0.shape[1] % 128 == 0 and x.shape[-1] >= 1


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp(x, w0, b0, w1, b1):
    """y = relu(x @ w0 + b0) @ w1 + b1, fused on TPU when eligible."""
    return _fused_mlp_impl(x, w0, b0, w1, b1)


def _fused_mlp_impl(x, w0, b0, w1, b1):
    if not _eligible(x, w0, w1):
        return _reference_mlp(x, w0, b0, w1, b1)
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    out = _pallas_forward(x2d, w0, b0, w1, b1, _BLOCK_ROWS)
    return out.reshape(*lead, w1.shape[1])


def _fused_mlp_fwd(x, w0, b0, w1, b1):
    return _fused_mlp_impl(x, w0, b0, w1, b1), (x, w0, b0, w1, b1)


def _fused_mlp_bwd(residuals, g):
    x, w0, b0, w1, b1 = residuals
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    if _eligible(x, w0, w1):
        h = _pallas_hidden(x2d, w0, b0, _BLOCK_ROWS)
    else:
        h = jnp.maximum(x2d @ w0 + b0, 0.0)
    # dL/dh through the second linear, gated by the ReLU mask
    dh = (g2d @ w1.T) * (h > 0.0)
    dw1 = h.T @ g2d
    db1 = jnp.sum(g2d, axis=0)
    dw0 = x2d.T @ dh
    db0 = jnp.sum(dh, axis=0)
    dx = (dh @ w0.T).reshape(*lead, x.shape[-1])
    return dx, dw0, db0, dw1, db1


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
