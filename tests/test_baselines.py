"""Device-batched comparison baselines vs sklearn (eval/baselines.py).

The batched LIN must match sklearn exactly (same closed form); the batched
GPR must match sklearn's GaussianProcessRegressor(RBF+WhiteKernel) —
same kernel, same LML objective, both optimized from the same initial
point — to R² tolerance; the batched MLP is SGD so it is held to the same
agreement standard as the certified MLP probes (tests/test_probes.py).
"""

import numpy as np
import pytest

from dpivae_tpu.eval.baselines import (
    fit_gpr_batched,
    fit_lin_batched,
    fit_mlp_baseline_batched,
    run_comparison_batched,
)


def _toy_members(M=3, N=96, T=48, D=2, Q=2, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    X_tr = rng.uniform(-2, 2, (M, N, D)).astype(np.float32)
    X_te = rng.uniform(-2, 2, (M, T, D)).astype(np.float32)

    def f(X, m):
        base = np.sin(X[..., 0] * (1 + 0.2 * m)) + 0.5 * X[..., 1] ** 2
        cols = [base + 0.3 * q * X[..., 0] for q in range(Q)]
        return np.stack(cols, axis=-1)

    Y_tr = np.stack([f(X_tr[m], m) for m in range(M)]).astype(np.float32)
    Y_te = np.stack([f(X_te[m], m) for m in range(M)]).astype(np.float32)
    Y_tr += noise * rng.standard_normal(Y_tr.shape).astype(np.float32)
    return X_tr, Y_tr, X_te, Y_te


def _r2(y, p):
    ss_res = np.sum((y - p) ** 2, axis=0)
    ss_tot = np.sum((y - y.mean(axis=0)) ** 2, axis=0)
    return 1 - ss_res / ss_tot


def test_lin_matches_sklearn_exactly():
    from sklearn.linear_model import LinearRegression

    X_tr, Y_tr, X_te, _ = _toy_members()
    pred = np.asarray(fit_lin_batched(X_tr, Y_tr, X_te))
    for m in range(X_tr.shape[0]):
        ref = LinearRegression().fit(X_tr[m], Y_tr[m]).predict(X_te[m])
        np.testing.assert_allclose(pred[m], ref, rtol=0, atol=5e-4)


def test_gpr_matches_sklearn():
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel

    X_tr, Y_tr, X_te, Y_te = _toy_members()
    pred, kparams = fit_gpr_batched(X_tr, Y_tr, X_te)
    pred, kparams = np.asarray(pred), np.asarray(kparams)
    assert np.isfinite(pred).all()
    for m in range(X_tr.shape[0]):
        gpr = GaussianProcessRegressor(RBF() + WhiteKernel())
        gpr.fit(X_tr[m], Y_tr[m])
        ref = gpr.predict(X_te[m])
        # Both optimized the same LML from the same start; f32 + optimizer
        # differences leave small prediction deltas, R²-negligible.
        r2_jax = _r2(Y_te[m], pred[m])
        r2_ref = _r2(Y_te[m], ref)
        np.testing.assert_allclose(r2_jax, r2_ref, rtol=0, atol=0.02)
        # Learned kernel: same order of magnitude as sklearn's optimum
        ls_ref = gpr.kernel_.k1.length_scale
        noise_ref = gpr.kernel_.k2.noise_level
        assert 0.2 < kparams[m, 0] / ls_ref < 5.0
        assert 0.2 < kparams[m, 1] / max(noise_ref, 1e-5) < 5.0


def test_gpr_interpolates_noiseless():
    # Clean function, plenty of data: GPR must essentially interpolate.
    X_tr, Y_tr, X_te, Y_te = _toy_members(noise=0.0, N=128)
    pred, _ = fit_gpr_batched(X_tr, Y_tr, X_te)
    pred = np.asarray(pred)
    for m in range(X_tr.shape[0]):
        assert _r2(Y_te[m], pred[m]).min() > 0.99


def test_mlp_baseline_learns_and_agrees_with_sklearn():
    X_tr, Y_tr, X_te, Y_te = _toy_members(N=128)
    pred = np.asarray(
        fit_mlp_baseline_batched(X_tr, Y_tr, X_te, n_epochs=400)
    )
    from sklearn.neural_network import MLPRegressor

    for m in range(X_tr.shape[0]):
        ref = MLPRegressor(hidden_layer_sizes=(64, 64), max_iter=10000).fit(
            X_tr[m], Y_tr[m]
        ).predict(X_te[m])
        r2_jax = _r2(Y_te[m], pred[m])
        r2_ref = _r2(Y_te[m], ref)
        # SGD backends: certified to the probe standard (|ΔR²| where
        # there is signal; see BASELINE.md probe certification)
        assert r2_jax.min() > 0.5
        np.testing.assert_allclose(r2_jax, r2_ref, rtol=0, atol=0.15)


def test_run_comparison_batched_matches_serial_path():
    """The batched comparison must agree with eval.run_comparison
    (the serial sklearn path) on the same members."""
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.eval.evaluate import run_comparison

    rng = np.random.default_rng(1)
    M, N, T = 2, 64, 32
    cfg = TrainConfig().replace(n_train=N, n_batch=32)
    x_tr = rng.uniform(-1, 1, (M, N, 2)).astype(np.float32)
    c_tr = rng.uniform(-1, 1, (M, N, 1)).astype(np.float32)
    y_tr = (np.sin(x_tr.sum(-1, keepdims=True)) + 0.5 * c_tr).astype(
        np.float32
    )
    x_te = rng.uniform(-1, 1, (M, T, 2)).astype(np.float32)
    c_te = rng.uniform(-1, 1, (M, T, 1)).astype(np.float32)
    y_te = (np.sin(x_te.sum(-1, keepdims=True)) + 0.5 * c_te).astype(
        np.float32
    )

    metrics_b, preds_b = run_comparison_batched(
        (x_tr, c_tr, y_tr), (x_te, c_te, y_te), models=("LIN", "GPR")
    )
    assert len(metrics_b) == M and len(preds_b) == M
    for m in range(M):
        ref_metrics, _ = run_comparison(
            cfg, case=None,
            data_train=(x_tr[m], c_tr[m], y_tr[m]),
            data_test=(x_te[m], c_te[m], y_te[m]),
        )
        for name in ("LIN", "GPR"):
            np.testing.assert_allclose(
                metrics_b[m][name]["R2"], ref_metrics[name]["R2"],
                rtol=0, atol=0.02,
            )


def test_gpr_flat_targets_do_not_nan():
    # Degenerate member: constant targets. The fit must stay finite.
    X_tr, Y_tr, X_te, _ = _toy_members(M=2, N=48, T=16)
    Y_tr[1] = 1.0
    pred, kparams = fit_gpr_batched(X_tr, Y_tr, X_te)
    assert np.isfinite(np.asarray(pred)).all()
    assert np.isfinite(np.asarray(kparams)).all()
