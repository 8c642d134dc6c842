"""Regression metrics (ref: utils/metrics.py:11-32).

Per-output-dim R², MSE, MAE computed in pure numpy/jnp — numerically
identical to sklearn's ``multioutput="raw_values"`` — so metrics can also be
evaluated on device inside jitted evaluation paths.
"""

from __future__ import annotations

import numpy as np


def _to_numpy(a):
    return np.asarray(a)


def r2_score_raw(y_true, y_pred) -> np.ndarray:
    y_true, y_pred = _to_numpy(y_true), _to_numpy(y_pred)
    ss_res = np.sum((y_true - y_pred) ** 2, axis=0)
    ss_tot = np.sum((y_true - np.mean(y_true, axis=0)) ** 2, axis=0)
    return 1.0 - ss_res / ss_tot


def mse_raw(y_true, y_pred) -> np.ndarray:
    y_true, y_pred = _to_numpy(y_true), _to_numpy(y_pred)
    return np.mean((y_true - y_pred) ** 2, axis=0)


def mae_raw(y_true, y_pred) -> np.ndarray:
    y_true, y_pred = _to_numpy(y_true), _to_numpy(y_pred)
    return np.mean(np.abs(y_true - y_pred), axis=0)


def regression_metrics(y_test, y_pred) -> dict:
    """R²/MSE/MAE with per-output-dim values (ref: utils/metrics.py:28-32)."""
    return {
        "R2": r2_score_raw(y_test, y_pred),
        "MSE": mse_raw(y_test, y_pred),
        "MAE": mae_raw(y_test, y_pred),
    }
