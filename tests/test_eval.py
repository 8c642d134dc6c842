"""Evaluation-layer tests: metrics, baselines, disentanglement probes."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.eval import (
    disentanglement_metric,
    evaluate_model,
    run_comparison,
)
from dpivae_tpu.train import setup_model, train_model
from dpivae_tpu.utils.data import sample_response
from dpivae_tpu.utils.metrics import regression_metrics


def test_regression_metrics_match_sklearn():
    from sklearn.metrics import (
        mean_absolute_error,
        mean_squared_error,
        r2_score,
    )

    rng = np.random.RandomState(0)
    y = rng.randn(100, 3)
    p = y + 0.3 * rng.randn(100, 3)
    got = regression_metrics(y, p)
    np.testing.assert_allclose(
        got["R2"], r2_score(y, p, multioutput="raw_values"), rtol=1e-6
    )
    np.testing.assert_allclose(
        got["MSE"], mean_squared_error(y, p, multioutput="raw_values"), rtol=1e-6
    )
    np.testing.assert_allclose(
        got["MAE"], mean_absolute_error(y, p, multioutput="raw_values"), rtol=1e-6
    )


def _trained(n_iter=200):
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=256, n_val=64, n_test=64, n_batch=64, n_iter=n_iter,
        val_freq=50, n_mc_train=4, n_mc_val=8, n_mc_test=32, use_seed=True,
        name="beam-s",
    )
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    data_train = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    data_val = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    data_test = sample_response(case, k3, cfg.n_test, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, data_train)
    params, _ = train_model(cfg, model, case, data_train, data_val,
                            key=jax.random.PRNGKey(1))
    return case, cfg, model, params, data_train, data_test


def test_evaluate_model_and_baselines():
    case, cfg, model, params, data_train, data_test = _trained()
    metrics, preds = evaluate_model(cfg, case, model, params, data_test)
    assert "beam-s" in metrics
    assert preds["beam-s"].shape == (64, 1)
    assert np.isfinite(metrics["beam-s"]["R2"]).all()

    base_metrics, base_preds = run_comparison(cfg, case, data_train, data_test)
    assert set(base_metrics) == {"LIN", "GPR", "MLP"}
    # Linear baseline on this nearly-linear problem should be decent
    assert base_metrics["LIN"]["R2"][0] > 0.5


def test_disentanglement_metric_rows():
    case, cfg, model, params, data_train, data_test = _trained()
    rows = disentanglement_metric(
        cfg, model, params, case, data_train, data_test
    )
    # 4 factors x 3 blocks
    assert len(rows) == 12
    blocks = {r[0] for r in rows}
    assert blocks == {"zx", "zc", "zy"}
    factors = {r[1] for r in rows}
    assert factors == {"E", "x_F", "log_kv", "T"}
    for _, _, score in rows:
        assert np.isfinite(score)
