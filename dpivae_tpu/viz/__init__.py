"""Plotting suite (ref: utils/visualization.py)."""

from dpivae_tpu.viz.visualization import (  # noqa: F401
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
