"""Device-batched comparison baselines (LIN / GPR / MLP).

The reference's ``run_comparison`` (ref: dpivae.py:561-615) fits sklearn
``LinearRegression``, ``GaussianProcessRegressor(RBF + WhiteKernel)`` and
``MLPRegressor(64, 64)`` serially per member on the host — for the transfer
study (scripts/2_regression_comparison.py) that is 24 members x 3 models per
direction, and the GPR alone pays an O(N^3) Cholesky per marginal-likelihood
evaluation inside L-BFGS on one CPU core. Here each model family fits ALL
members as one batched device program:

- ``fit_lin_batched`` — closed-form centered least squares (pinv), the exact
  solution sklearn's ``LinearRegression`` computes via lstsq.
- ``fit_gpr_batched`` — exact GP regression with the same kernel
  ``RBF(length_scale=1) + WhiteKernel(noise_level=1)`` and the same fit
  procedure: maximize the log marginal likelihood over (log length_scale,
  log noise) from sklearn's initial point, log-bounds [1e-5, 1e5], summed
  over output dims for multi-output y (sklearn GPR semantics). The
  optimizer is BFGS (jax.scipy) — batched over members via vmap, every
  Cholesky/solve runs on device.
- ``fit_mlp_baseline_batched`` — MLP(64, 64) with Adam, Glorot init,
  minibatch 200, L2 alpha=1e-4, mirroring sklearn ``MLPRegressor`` defaults
  with a fixed epoch count instead of its tol-based stop (the same
  certified design as the batched disentanglement probes,
  eval/probes.py:15-19); targets are standardized internally and mapped
  back before scoring.

Feature prep matches ``run_comparison``: per-member StandardScaler (ddof=0)
fit on the member's train split, applied to x and c, concatenated — all
inside the jitted program, so members with different domains (the transfer
study's quadrant folds) standardize independently.

Certification: ``benchmarks/experiments/baseline_certify.py`` pushes the
same member datasets through this module and sklearn and commits the
per-member R² deltas.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.utils.metrics import regression_metrics

# sklearn kernel hyperparameter log-bounds (RBF/WhiteKernel defaults:
# (1e-5, 1e5)); the objective clips into these, matching L-BFGS-B's box.
_LOG_LB = math.log(1e-5)
_LOG_UB = math.log(1e5)
# sklearn GaussianProcessRegressor(alpha=1e-10) jitter, raised to f32-safe.
_JITTER = 1e-6


def _standardize_features(x_tr, c_tr, x, c):
    """[x ‖ c] standardized by the member's train moments (ddof=0), the
    exact feature map of run_comparison (eval/evaluate.py:87-97)."""

    def scale(train, a):
        mu = jnp.mean(train, axis=0, keepdims=True)
        sd = jnp.std(train, axis=0, keepdims=True)
        return (a - mu) / sd

    return jnp.concatenate((scale(x_tr, x), scale(c_tr, c)), axis=-1)


# Module-level jit (not per-call): repeat run_comparison_batched calls in a
# study must reuse the compiled program, not retrace it.
_feats_batched = jax.jit(jax.vmap(_standardize_features))


# ---------------------------------------------------------------------------
# LIN


@jax.jit
def fit_lin_batched(X_tr, Y_tr, X_te):
    """Batched multi-output OLS with intercept.

    Shapes: X_tr (M, N, D), Y_tr (M, N, Q), X_te (M, T, D) -> (M, T, Q).
    """
    Xm = jnp.mean(X_tr, axis=1, keepdims=True)
    Ym = jnp.mean(Y_tr, axis=1, keepdims=True)
    coef = jax.vmap(lambda Xc, Yc: jnp.linalg.pinv(Xc) @ Yc)(
        X_tr - Xm, Y_tr - Ym
    )  # (M, D, Q)
    return jnp.einsum("mtd,mdq->mtq", X_te - Xm, coef) + Ym


# ---------------------------------------------------------------------------
# GPR


def _sqdist(a, b):
    # (N, D), (T, D) -> (N, T); the clamp guards tiny negative fp residue.
    d = jnp.sum(a**2, -1)[:, None] + jnp.sum(b**2, -1)[None, :] - 2 * a @ b.T
    return jnp.maximum(d, 0.0)


def _gpr_lml(theta, X, Y):
    """Negative log marginal likelihood, summed over output dims
    (sklearn GPR's multi-output convention)."""
    theta = jnp.clip(theta, _LOG_LB, _LOG_UB)
    ls, noise = jnp.exp(theta[0]), jnp.exp(theta[1])
    n = X.shape[0]
    K = jnp.exp(-0.5 * _sqdist(X, X) / ls**2)
    K = K + (noise + _JITTER) * jnp.eye(n, dtype=X.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), Y)  # (N, Q)
    q = Y.shape[-1]
    lml = (
        -0.5 * jnp.sum(Y * alpha)
        - q * jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * q * math.log(2.0 * math.pi)
    )
    return -lml


def _gpr_fit_one(X, Y):
    """Optimize (log length_scale, log noise) from sklearn's initial point
    (1.0, 1.0) and return the clipped optimum.

    BFGS (jax.scipy) stands in for sklearn's L-BFGS-B: 2 parameters, same
    objective/gradients; the box constraint is applied by clipping inside
    the objective. Falls back to the initial point where optimization
    diverges (non-finite)."""
    from jax.scipy.optimize import minimize

    theta0 = jnp.zeros((2,), X.dtype)
    res = minimize(_gpr_lml, theta0, args=(X, Y), method="BFGS",
                   options={"maxiter": 200})
    theta = jnp.where(jnp.isfinite(res.x), res.x, theta0)
    better = jnp.isfinite(res.fun) & (res.fun < _gpr_lml(theta0, X, Y))
    theta = jnp.where(better, theta, theta0)
    return jnp.clip(theta, _LOG_LB, _LOG_UB)


def _gpr_predict_one(theta, X, Y, Xs):
    ls, noise = jnp.exp(theta[0]), jnp.exp(theta[1])
    n = X.shape[0]
    K = jnp.exp(-0.5 * _sqdist(X, X) / ls**2)
    K = K + (noise + _JITTER) * jnp.eye(n, dtype=X.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), Y)
    # WhiteKernel contributes nothing off-diagonal: cross-covariance is
    # pure RBF, exactly sklearn's K_trans @ alpha_.
    Ks = jnp.exp(-0.5 * _sqdist(Xs, X) / ls**2)  # (T, N)
    return Ks @ alpha  # (T, Q)


@jax.jit
def fit_gpr_batched(X_tr, Y_tr, X_te):
    """Batched exact GPR(RBF+White) fit+predict.

    Shapes: X_tr (M, N, D), Y_tr (M, N, Q), X_te (M, T, D) -> predictions
    (M, T, Q) and per-member kernel params (M, 2) as
    (length_scale, noise_level)."""
    theta = jax.vmap(_gpr_fit_one)(X_tr, Y_tr)
    pred = jax.vmap(_gpr_predict_one)(theta, X_tr, Y_tr, X_te)
    return pred, jnp.exp(theta)


# ---------------------------------------------------------------------------
# MLP


def _glorot(key, fan_in, fan_out, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -bound, bound)


def _mlp_init(key, sizes):
    layers = []
    for i in range(len(sizes) - 1):
        key, kw = jax.random.split(key)
        layers.append({
            "w": _glorot(kw, sizes[i], sizes[i + 1]),
            "b": jnp.zeros((sizes[i + 1],), jnp.float32),
        })
    return layers


def _mlp_apply(layers, x):
    h = x
    for layer in layers[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    return h @ layers[-1]["w"] + layers[-1]["b"]


@functools.lru_cache(maxsize=8)
def _mlp_baseline_run_fn(b: int, n_rows: int, lr: float, alpha: float):
    import optax

    tx = optax.adam(lr)

    def loss_fn(p, xb, yb):
        # sklearn's squared_loss is the mean over ALL (row, output)
        # elements / 2 — not mean-over-rows of the per-row sum. The sum
        # form would scale the data term by Q for multi-output y, weakening
        # the effective L2 by Q relative to the sklearn anchor.
        sq = 0.5 * jnp.mean((_mlp_apply(p, xb) - yb) ** 2)
        l2 = sum(jnp.sum(layer["w"] ** 2) for layer in p)
        return sq + 0.5 * alpha * l2 / xb.shape[0]

    def member_step(p, opt_state, xb, yb):
        g = jax.grad(loss_fn)(p, xb, yb)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    @jax.jit
    def run(params, keys, X_tr, Y_tr, X_te, mu, sd):
        def scan_body(carry, k_step):
            p, opt_state = carry
            idx = jax.random.randint(k_step, (b,), 0, n_rows)
            p, opt_state = jax.vmap(member_step)(
                p, opt_state, X_tr[:, idx, :], Y_tr[:, idx, :]
            )
            return (p, opt_state), None

        opt_state = jax.vmap(tx.init)(params)
        (params, _), _ = jax.lax.scan(scan_body, (params, opt_state), keys)
        return jax.vmap(_mlp_apply)(params, X_te) * sd + mu

    return run


def fit_mlp_baseline_batched(
    X_tr,
    Y_tr,
    X_te,
    hidden: Tuple[int, ...] = (64, 64),
    lr: float = 1e-3,
    batch_size: int = 200,
    n_epochs: int = 300,
    alpha: float = 1e-4,
    key=None,
):
    """Batched multi-output MLP(64,64) baseline; returns (M, T, Q) preds."""
    if key is None:
        key = jax.random.PRNGKey(0)
    X_tr = jnp.asarray(X_tr, jnp.float32)
    Y_tr = jnp.asarray(Y_tr, jnp.float32)
    X_te = jnp.asarray(X_te, jnp.float32)
    M, N, D = X_tr.shape
    Q = Y_tr.shape[-1]
    b = min(batch_size, N)
    n_steps = n_epochs * max(N // b, 1)
    sizes = [D, *hidden, Q]

    mu = jnp.mean(Y_tr, axis=1, keepdims=True)
    sd = jnp.std(Y_tr, axis=1, keepdims=True) + 1e-12
    k_init, k_batch = jax.random.split(key)
    params = jax.vmap(lambda k: _mlp_init(k, sizes))(
        jax.random.split(k_init, M)
    )
    run = _mlp_baseline_run_fn(b, N, lr, alpha)
    return run(params, jax.random.split(k_batch, n_steps),
               X_tr, (Y_tr - mu) / sd, X_te, mu, sd)


# ---------------------------------------------------------------------------
# run_comparison, batched


def run_comparison_batched(
    data_train,
    data_test,
    key=None,
    models: Tuple[str, ...] = ("LIN", "GPR", "MLP"),
    mlp_kwargs: Optional[dict] = None,
) -> Tuple[List[Dict[str, dict]], List[Dict[str, np.ndarray]]]:
    """All members' sklearn-baseline comparison as batched device programs.

    ``data_*`` are member-stacked (x, c, y, ...) tuples of shape
    (M, N, d) — the same stacks scripts build for ``train_sweep_data``.
    Returns per-member ``(metrics, predictions)`` dict lists in member
    order, drop-in for the serial ``run_comparison`` loop
    (ref: 2_regression_comparison.py:191-193).
    """
    x_tr, c_tr, y_tr = (jnp.asarray(a, jnp.float32) for a in data_train[:3])
    x_te, c_te, y_te = (jnp.asarray(a, jnp.float32) for a in data_test[:3])
    X_tr = _feats_batched(x_tr, c_tr, x_tr, c_tr)
    X_te = _feats_batched(x_tr, c_tr, x_te, c_te)

    preds = {}
    if "LIN" in models:
        preds["LIN"] = np.asarray(fit_lin_batched(X_tr, y_tr, X_te))
    if "GPR" in models:
        pred, _ = fit_gpr_batched(X_tr, y_tr, X_te)
        preds["GPR"] = np.asarray(pred)
    if "MLP" in models:
        preds["MLP"] = np.asarray(
            fit_mlp_baseline_batched(X_tr, y_tr, X_te, key=key,
                                     **(mlp_kwargs or {}))
        )

    y_te_h = np.asarray(y_te)
    M = y_te_h.shape[0]
    metrics_by_member: List[Dict[str, dict]] = []
    preds_by_member: List[Dict[str, np.ndarray]] = []
    for m in range(M):
        metrics_by_member.append({
            name: regression_metrics(y_te_h[m], p[m])
            for name, p in preds.items()
        })
        preds_by_member.append({name: p[m] for name, p in preds.items()})
    return metrics_by_member, preds_by_member
