"""Evaluation paths (ref: dpivae.py:527-703).

Device/host boundary follows the reference: the VAE produces predictions and
latents on device (jitted ``model.sample``); sklearn regressors (comparison
baselines, disentanglement probes) fit on host numpy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.cases import Case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models.vae import DPIVAE
from dpivae_tpu.utils.jit_cache import cached_sample_mean
from dpivae_tpu.utils.metrics import regression_metrics
from dpivae_tpu.utils.transforms import StandardScaler


def build_eval_sample_fn(config: TrainConfig, case: Case, cond: bool, n: int):
    """A pure ``(params, key, data_train, x, c) -> model.sample(...)`` with
    the member's input scalers re-fitted from the *traced* ``data_train`` —
    the same trick the fused train function uses. One compiled program then
    serves every sweep member under vmap (no per-member recompiles)."""
    from dpivae_tpu.train.setup import setup_model

    def sample_fn(params, key, data_train, x, c):
        model = setup_model(config, case, data_train)
        return model.sample(
            params, key, jnp.asarray(x), jnp.asarray(c), cond=cond, n=n,
            grl_alpha=config.lambda_g0,
        )

    return sample_fn


def evaluate_model(
    config: TrainConfig,
    case: Case,
    model: DPIVAE,
    params: dict,
    data_test,
    cond: bool = False,
    key=None,
) -> Tuple[Dict[str, dict], Dict[str, np.ndarray]]:
    """Test-set regression metrics on the posterior-mean ŷ
    (ref: dpivae.py:527-559)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x_test, c_test, y_test = data_test[0], data_test[1], data_test[2]

    # MC mean reduced inside the jitted program: the (n_mc, n_test, d)
    # sample tensors never materialize as program outputs.
    (y_mean,) = cached_sample_mean(
        model, params, key, x_test, c_test,
        cond=cond, n=config.n_mc_test, grl_alpha=config.lambda_g0,
        outputs=(4,),
    )
    y_pred = np.asarray(y_mean)

    metrics = regression_metrics(np.asarray(y_test), y_pred)
    return {config.name: metrics}, {config.name: y_pred}


def run_comparison(
    config: TrainConfig, case: Case, data_train, data_test
) -> Tuple[Dict[str, dict], Dict[str, np.ndarray]]:
    """sklearn baselines on standardized [x ‖ c] -> y
    (ref: dpivae.py:561-615): LinearRegression, GPR(RBF+White), MLP(64,64)."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel
    from sklearn.linear_model import LinearRegression
    from sklearn.neural_network import MLPRegressor

    x_train, c_train, y_train = data_train[0], data_train[1], data_train[2]
    x_test, c_test, y_test = data_test[0], data_test[1], data_test[2]

    assert x_train.shape[0] == config.n_train
    assert config.n_batch <= config.n_train

    from dpivae_tpu.utils import on_host_cpu

    with on_host_cpu():
        sc_x = StandardScaler.fit(jnp.asarray(x_train))
        sc_c = StandardScaler.fit(jnp.asarray(c_train))

        def features(x, c):
            xt, _ = sc_x.forward(jnp.asarray(x))
            ct, _ = sc_c.forward(jnp.asarray(c))
            return np.asarray(jnp.concatenate((xt, ct), axis=-1))

        X_train = features(x_train, c_train)
        X_test = features(x_test, c_test)
    Y_train = np.asarray(y_train)
    Y_test = np.asarray(y_test)
    if Y_train.shape[-1] == 1:
        Y_train = Y_train[:, 0]

    regressors = {
        "LIN": LinearRegression(),
        "GPR": GaussianProcessRegressor(RBF() + WhiteKernel()),
        "MLP": MLPRegressor(hidden_layer_sizes=(64, 64), max_iter=10000),
    }

    dict_pred, dict_metrics = {}, {}
    for name, rgr in regressors.items():
        rgr.fit(X_train, Y_train)
        pred = np.asarray(rgr.predict(X_test))
        if pred.ndim == 1:
            pred = pred[:, None]
        dict_pred[name] = pred
        dict_metrics[name] = regression_metrics(Y_test, pred)
    return dict_metrics, dict_pred


def sample_latents(
    config: TrainConfig,
    model: DPIVAE,
    params: dict,
    x,
    c,
    cond: bool = False,
    n: int = 1,
    key=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Posterior latents (z_x, z_c, z_y), MC-averaged, as host numpy."""
    if key is None:
        key = jax.random.PRNGKey(0)
    zx, zc, zy = cached_sample_mean(
        model, params, key, x, c, cond=cond, n=n, grl_alpha=config.lambda_g0,
        outputs=(5, 6, 7),
    )
    return np.asarray(zx), np.asarray(zc), np.asarray(zy)


def make_probe_regressor(regressor: str):
    """The disentanglement probe regressor (ref: dpivae.py:684-693)."""
    from sklearn.linear_model import LinearRegression
    from sklearn.neural_network import MLPRegressor

    if regressor == "linear":
        return LinearRegression()
    if regressor == "mlp":
        return MLPRegressor(hidden_layer_sizes=(128, 128), max_iter=20000)
    raise ValueError(f"Unknown regressor type {regressor}")


def fit_disentanglement_probes(
    latents_train: dict,
    latents_test: dict,
    z_train,
    z_test,
    factors,
    regressor: str = "linear",
) -> List[list]:
    """Fit per-(factor, latent-block) probes on pre-computed latents and
    return ``[block, factor, test-R²]`` rows (ref: dpivae.py:678-703).

    ``latents_*`` map block names ("zx", "zc", "zy") to (n, dim) arrays.
    Shared by the single-run metric and the batched sweep path.
    """
    z_train = np.asarray(z_train)
    z_test = np.asarray(z_test)
    rows = []
    for i, factor in enumerate(factors):
        for block in ("zx", "zc", "zy"):
            rgr = make_probe_regressor(regressor).fit(
                np.asarray(latents_train[block]), z_train[:, i]
            )
            rows.append(
                [block, factor.name,
                 rgr.score(np.asarray(latents_test[block]), z_test[:, i])]
            )
    return rows


def disentanglement_metric(
    config: TrainConfig,
    model: DPIVAE,
    params: dict,
    case: Case,
    data_train,
    data_test,
    regressor: str = "linear",
    cond: bool = False,
    use_mean: bool = False,
    key=None,
) -> List[list]:
    """The paper's disentanglement score (ref: dpivae.py:618-703).

    For every ground-truth factor, fit a regressor from each latent block
    (z_x, z_c, z_y) to the factor and record the test R². Returns rows
    ``[block, factor, score]``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n = config.n_mc_test if use_mean else 1

    x_train, c_train, z_train = data_train[0], data_train[1], data_train[3]
    x_test, c_test, z_test = data_test[0], data_test[1], data_test[3]

    zx_tr, zc_tr, zy_tr = sample_latents(
        config, model, params, x_train, c_train, cond=cond, n=n, key=k1
    )
    zx_te, zc_te, zy_te = sample_latents(
        config, model, params, x_test, c_test, cond=cond, n=n, key=k2
    )
    return fit_disentanglement_probes(
        {"zx": zx_tr, "zc": zc_tr, "zy": zy_tr},
        {"zx": zx_te, "zc": zc_te, "zy": zy_te},
        z_train, z_test, case.factors, regressor=regressor,
    )
