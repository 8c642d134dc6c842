"""Smoke tests for the plotting suite: every figure builds and saves.

Uses a briefly-trained tiny model; asserts figures are produced with the
expected axes grids (matplotlib Agg backend, no display).
"""

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train import setup_model, train_model
from dpivae_tpu.utils.data import sample_response
from dpivae_tpu.viz import (
    interp_corner_latent_space,
    plot_ground_truth_posterior,
    plot_interp_pred,
    plot_marginal_post,
    plot_marginal_prior,
    plot_pred,
    plot_regression_error,
    save_close_fig,
    visualize_training_loss,
)


@pytest.fixture(scope="module")
def trained():
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=64, n_val=32, n_batch=16, n_iter=20, val_freq=10,
        n_mc_train=2, n_mc_val=2, use_seed=True, n_interp=3, n_plot=50,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtr = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    dva = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, dtr)
    params, logs = train_model(cfg, model, case, dtr, dva,
                               key=jax.random.PRNGKey(1))
    return case, cfg, model, params, logs, dtr


def test_loss_curve(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig, ax = visualize_training_loss(logs)
    assert len(ax) == 5
    save_close_fig(fig, str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()


def test_regression_error(trained, tmp_path):
    case, cfg, model, params, logs, dtr = trained
    y = np.asarray(dtr[2])
    pred = y + 0.1
    fig, ax = plot_regression_error(y, pred, case,
                                    metrics={"R2": np.array([0.9])})
    assert len(ax) == case.nd_y
    save_close_fig(fig, str(tmp_path / "reg.png"))


def test_ground_truth_posterior(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig = plot_ground_truth_posterior(
        model, params, cfg, case, case.gt_dist(), n_plot=50
    )
    save_close_fig(fig, str(tmp_path / "gt_post.png"))
    assert (tmp_path / "gt_post.png").exists()


def test_interp_corner(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig = interp_corner_latent_space(model, params, cfg, case, 0, 2, n_plot=40)
    save_close_fig(fig, str(tmp_path / "corner.png"))


def test_marginal_prior(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig, ax = plot_marginal_prior(model, params, cfg, case, n_plot=40)
    assert ax.shape == (cfg.nz_c + cfg.nz_y, len(case.factors))
    save_close_fig(fig, str(tmp_path / "prior_marg.png"))


def test_marginal_post(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig, ax = plot_marginal_post(model, params, cfg, case, n_plot=40,
                                 vars_interp=[0, 1])
    assert ax.shape == (case.nz_x + cfg.nz_c + cfg.nz_y, 2)
    save_close_fig(fig, str(tmp_path / "post_marg.png"))


def test_interp_pred(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig, ax = plot_interp_pred(model, params, cfg, case, n_plot=40)
    assert ax.shape == (3, len(case.factors))
    save_close_fig(fig, str(tmp_path / "interp_pred.png"))


def test_pred_single_factor(trained, tmp_path):
    case, cfg, model, params, logs, _ = trained
    fig, ax = plot_pred(model, params, cfg, case, 1, n_plot=40)
    assert len(ax) == 3
    save_close_fig(fig, str(tmp_path / "pred.png"))
