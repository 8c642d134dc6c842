"""Batched disentanglement probes on device.

The reference fits sklearn probes serially per (factor, latent-block)
(ref: dpivae.py:678-703): a 66-member sweep with the MLP(128,128)
regressor means 594 independent 20k-max-iter fits — hours on one host
core. Here every probe trains concurrently as ONE vmapped JAX program:
probe inputs are zero-padded to a common width and stacked on a probe
axis, and a ``lax.scan`` Adam loop trains all of them at once on the MXU.

Two regressor backends:

- ``fit_linear_probes_batched`` — closed-form min-norm least squares via
  pinv (matches sklearn ``LinearRegression`` = lstsq on centered data;
  zero-padded columns get zero coefficients).
- ``fit_mlp_probes_batched`` — MLP(128,128) trained with Adam, Glorot
  init, minibatch 200 and L2 alpha=1e-4 on the weights, mirroring sklearn
  ``MLPRegressor`` defaults (fixed epoch count instead of its tol-based
  stop; targets are standardized internally for conditioning, which
  leaves R² comparable since R² is affine-invariant in the target).

Scores are test-set R² exactly as sklearn's ``score``.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _r2(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    ss_res = jnp.sum((y_true - y_pred) ** 2, axis=-1)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true, axis=-1, keepdims=True)) ** 2,
                     axis=-1)
    return 1.0 - ss_res / ss_tot


@jax.jit
def fit_linear_probes_batched(X_train, y_train, X_test, y_test):
    """Per-probe OLS with intercept; returns test R² of shape (P,).

    Shapes: X_* (P, N, D) (zero-padded features allowed), y_* (P, N).
    """
    Xm = jnp.mean(X_train, axis=1, keepdims=True)
    ym = jnp.mean(y_train, axis=1, keepdims=True)
    Xc = X_train - Xm

    def solve(Xc_p, yc_p):
        return jnp.linalg.pinv(Xc_p) @ yc_p

    coef = jax.vmap(solve)(Xc, y_train - ym)  # (P, D)
    pred = jnp.einsum("pnd,pd->pn", X_test - Xm, coef) + ym
    return _r2(y_test, pred)


def _glorot_uniform(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32,
                              -bound, bound)


def _mlp_probe_init(key, sizes: Sequence[int]) -> list:
    layers = []
    for i in range(len(sizes) - 1):
        key, kw = jax.random.split(key)
        layers.append({
            "w": _glorot_uniform(kw, sizes[i], sizes[i + 1]),
            "b": jnp.zeros((sizes[i + 1],), jnp.float32),
        })
    return layers


def _mlp_probe_apply(layers, x):
    h = x
    for layer in layers[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    return (h @ layers[-1]["w"] + layers[-1]["b"])[..., 0]


@functools.lru_cache(maxsize=8)
def _mlp_probe_run_fn(b: int, n_rows: int, lr: float, alpha: float):
    """Compiled probe-training program, cached on its static shape/hparam
    key so repeated calls (multi-study runners, tests) reuse the
    executable instead of re-tracing the multi-thousand-step scan."""
    import optax

    tx = optax.adam(lr)

    def loss_fn(p, xb, yb):
        pred = _mlp_probe_apply(p, xb)
        sq = 0.5 * jnp.mean((pred - yb) ** 2)
        l2 = sum(jnp.sum(layer["w"] ** 2) for layer in p)
        return sq + 0.5 * alpha * l2 / xb.shape[0]

    def member_step(p, opt_state, xb, yb):
        g = jax.grad(loss_fn)(p, xb, yb)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    @jax.jit
    def run(params, keys, X_tr, y_tr, X_te, y_te, mu, sd):
        def scan_body(carry, k_step):
            p, opt_state = carry
            # Shared minibatch indices across probes: rows are iid per
            # probe, so one index draw serves the whole probe axis.
            idx = jax.random.randint(k_step, (b,), 0, n_rows)
            p, opt_state = jax.vmap(member_step)(
                p, opt_state, X_tr[:, idx, :], y_tr[:, idx]
            )
            return (p, opt_state), None

        opt_state = jax.vmap(tx.init)(params)
        (params, _), _ = jax.lax.scan(scan_body, (params, opt_state), keys)
        pred = jax.vmap(_mlp_probe_apply)(params, X_te) * sd[:, 0:1] + mu
        return _r2(y_te, pred)

    return run


def fit_mlp_probes_batched(
    X_train,
    y_train,
    X_test,
    y_test,
    hidden: Tuple[int, ...] = (128, 128),
    lr: float = 1e-3,
    batch_size: int = 200,
    n_epochs: int = 300,
    alpha: float = 1e-4,
    key=None,
    compile_only: bool = False,
    fan_in=None,
):
    """Train all P probes concurrently; returns test R² of shape (P,).

    ``compile_only=True`` lowers + compiles the training program at these
    exact shapes without executing it (warm-up use; returns None).

    ``fan_in`` (optional, shape (P,)): each probe's TRUE input width
    before zero-padding to the common D. sklearn initializes the first
    layer with bound sqrt(6/(d_true+h)); padding would silently shrink
    that to sqrt(6/(D+h)) for narrow blocks. Only the init scale changes —
    shapes and the compiled program are identical.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    X_train = jnp.asarray(X_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    X_test = jnp.asarray(X_test, jnp.float32)
    y_test = jnp.asarray(y_test, jnp.float32)
    P, N, D = X_train.shape
    b = min(batch_size, N)
    steps_per_epoch = max(N // b, 1)
    n_steps = n_epochs * steps_per_epoch
    sizes = [D, *hidden, 1]

    # Standardize targets per probe (conditioning only; R² is unchanged
    # by the affine map, and predictions are mapped back before scoring).
    mu = jnp.mean(y_train, axis=1, keepdims=True)
    sd = jnp.std(y_train, axis=1, keepdims=True) + 1e-12
    y_tr_s = (y_train - mu) / sd

    k_init, k_batch = jax.random.split(key)
    params = jax.vmap(lambda k: _mlp_probe_init(k, sizes))(
        jax.random.split(k_init, P)
    )
    if fan_in is not None:
        f = jnp.asarray(fan_in, jnp.float32)
        scale = jnp.sqrt((D + hidden[0]) / (f + hidden[0]))
        params[0]["w"] = params[0]["w"] * scale[:, None, None]
    run = _mlp_probe_run_fn(b, N, lr, alpha)
    args = (params, jax.random.split(k_batch, n_steps),
            X_train, y_tr_s, X_test, y_test, mu, sd)
    if compile_only:
        run.lower(*args).compile()
        return None
    return run(*args)


@functools.partial(jax.jit, static_argnames="n_factors")
def _pack_probe_jit(latents, z, n_factors: int):
    """Pad + broadcast one split into (P, N, D) / (P, N) probe tensors."""
    blocks = ("zx", "zc", "zy")
    d_max = max(int(latents[b].shape[-1]) for b in blocks)
    padded = [
        jnp.pad(
            jnp.asarray(latents[b], jnp.float32),
            ((0, 0), (0, 0), (0, d_max - int(latents[b].shape[-1]))),
        )
        for b in blocks
    ]
    x = jnp.stack(padded, axis=1)  # (M, B, N, D)
    m, n_blocks, n, _ = x.shape
    x = jnp.broadcast_to(x[:, None], (m, n_factors, n_blocks, n, d_max))
    y = jnp.swapaxes(jnp.asarray(z, jnp.float32), 1, 2)  # (M, F, N)
    y = jnp.broadcast_to(y[:, :, None, :], (m, n_factors, n_blocks, n))
    p = m * n_factors * n_blocks
    return x.reshape(p, n, d_max), y.reshape(p, n)


def pack_probe_batch(latents_train, latents_test, z_train, z_test, n_factors):
    """Stack (member, factor, block) probes into padded (P, N, D) tensors.

    ``latents_*`` map block name -> (M, N, d_block); ``z_*`` are
    (M, N, n_factors). Probe order is m-major, then factor, then block
    ("zx", "zc", "zy") — matching the reference's row order
    (ref: dpivae.py:678-699).

    Packing is one jitted device program (pad + broadcast, no per-probe
    host loop): device-resident latents from the sweep extraction stay on
    device all the way through the probe fit, so only the (P,) scores
    cross the host boundary. The previous host-numpy pack re-uploaded
    ~65 MB of packed probes per study, which dominated the probe phase on
    the tunneled TPU (12-40 s observed at study scale).
    """
    blocks = ("zx", "zc", "zy")
    latents_train = {b: latents_train[b] for b in blocks}
    latents_test = {b: latents_test[b] for b in blocks}
    x_tr, y_tr = _pack_probe_jit(latents_train, z_train, n_factors)
    x_te, y_te = _pack_probe_jit(latents_test, z_test, n_factors)
    return x_tr, y_tr, x_te, y_te


def batched_probe_scores(
    latents_train,
    latents_test,
    z_train,
    z_test,
    n_factors: int,
    regressor: str = "mlp_jax",
    key=None,
    **mlp_kwargs,
) -> np.ndarray:
    """All-probe R² as (M, n_factors, 3) with block order (zx, zc, zy)."""
    X_tr, y_tr, X_te, y_te = pack_probe_batch(
        latents_train, latents_test, z_train, z_test, n_factors
    )
    if regressor == "linear_jax":
        r2 = fit_linear_probes_batched(X_tr, y_tr, X_te, y_te)
    elif regressor == "mlp_jax":
        # Per-probe true input widths (probe order m-major, factor, block):
        # sklearn's Glorot bound uses the block's real dim, not the padded D
        dims = [int(latents_train[b].shape[-1]) for b in ("zx", "zc", "zy")]
        m = z_train.shape[0]
        fan_in = np.tile(np.asarray(dims, np.float32), m * n_factors)
        r2 = fit_mlp_probes_batched(X_tr, y_tr, X_te, y_te, key=key,
                                    fan_in=fan_in, **mlp_kwargs)
    else:
        raise ValueError(f"Unknown batched regressor {regressor}")
    m = z_train.shape[0]
    return np.asarray(r2).reshape(m, n_factors, 3)


def warm_batched_probes(
    block_dims: Tuple[int, int, int],
    n_factors: int,
    n_members: int,
    n_train: int,
    n_test: int,
    regressor: str = "linear_jax",
    **mlp_kwargs,
) -> None:
    """Pre-compile the batched probe programs at the exact study shapes.

    Run in a background thread while training occupies the device (see
    scripts/1_disentanglement_metric.py): the compile/cache-load that
    would otherwise surface in the post-training probe phase is host-side
    and overlaps the training chunks. The closed-form linear fit is
    additionally pre-executed (~0.05 s of device time on dummy zeros);
    the MLP fit is compile-only — executing it would cost the full
    multi-thousand-step scan. Best-effort: a failure only loses the warm.

    ``block_dims`` are the (zx, zc, zy) latent widths.
    """
    blocks = ("zx", "zc", "zy")

    def dummy(n):
        lat = {
            b: np.zeros((n_members, n, d), np.float32)
            for b, d in zip(blocks, block_dims)
        }
        return lat, np.zeros((n_members, n, n_factors), np.float32)

    lat_tr, z_tr = dummy(n_train)
    lat_te, z_te = dummy(n_test)
    x_tr, y_tr, x_te, y_te = pack_probe_batch(
        lat_tr, lat_te, z_tr, z_te, n_factors
    )
    if regressor == "linear_jax":
        r2 = fit_linear_probes_batched(x_tr, y_tr, x_te, y_te)
        # jax.block_until_ready is a no-op on the tunneled TPU backend;
        # a host transfer of one scalar forces the dummy execution.
        float(np.asarray(r2[0]))
    elif regressor == "mlp_jax":
        fit_mlp_probes_batched(x_tr, y_tr, x_te, y_te, compile_only=True,
                               **mlp_kwargs)
    else:
        raise ValueError(f"Unknown batched regressor {regressor}")
