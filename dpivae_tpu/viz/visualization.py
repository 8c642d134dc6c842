"""The plotting suite (ref: utils/visualization.py:21-732).

Same nine figures as the reference — loss curves, regression error,
ground-truth-vs-posterior pairplot, latent-traversal KDE grids, and the
physics/data-driven/combined prediction decompositions — produced from the
framework's functional model API (params passed explicitly, device arrays
pulled to host once per figure).

Traversal mechanics are the reference's: per-factor bounds at the
ground-truth distribution's icdf(alpha)/icdf(1-alpha) with alpha=0.01, other
factors pinned at their ``val``, data regenerated through
``sample_response(case, key, n_plot, z=...)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import matplotlib as mpl
import numpy as np
import pandas as pd
from matplotlib import pyplot as plt
from matplotlib.cm import ScalarMappable
from matplotlib.colors import LinearSegmentedColormap, Normalize

from dpivae_tpu.utils import ALPHA_INTERP, CMAP_NAME, CMAP_VARS, on_host_cpu
from dpivae_tpu.utils.data import sample_response
from dpivae_tpu.utils.jit_cache import cached_sample

mpl.rcParams["figure.dpi"] = 150


def save_close_fig(fig, path, show=False):
    """(ref: utils/visualization.py:21-26)"""
    fig.savefig(path)
    if show:
        plt.show()
    else:
        plt.close(fig)


# ----------------------------------------------------------------------
# Traversal helpers
# ----------------------------------------------------------------------

def _traversal_bounds(case):
    """Per-factor traversal bounds: icdf(alpha), icdf(1-alpha) of the
    ground-truth dists (ref: utils/visualization.py:237-238 etc.)."""
    dist = case.gt_dist()
    n = len(case.factors)
    lb = np.asarray(dist.icdf(np.full((1, n), ALPHA_INTERP)))[0]
    ub = np.asarray(dist.icdf(np.full((1, n), 1.0 - ALPHA_INTERP)))[0]
    return lb, ub


def _traversal_grid(case, idx, n_interp):
    """Pin all factors at their ``val``, sweep factor ``idx`` across its
    traversal bounds. Returns (z_grid (n_interp, n_factors), swept values)."""
    lb, ub = _traversal_bounds(case)
    vals = np.asarray([f.val for f in case.factors], np.float32)
    sweep = np.linspace(lb[idx], ub[idx], n_interp, dtype=np.float32)
    z = np.tile(vals, (n_interp, 1))
    z[:, idx] = sweep
    return z, sweep


def _traversal_data(case, idx, n_interp, n_plot, key):
    z, sweep = _traversal_grid(case, idx, n_interp)
    with on_host_cpu():
        x, c, y, _ = sample_response(case, key, n_plot, z=jnp.asarray(z))
        return np.asarray(x), np.asarray(c), np.asarray(y), sweep


def _colorbar(fig, ax, sweep, label, color, orientation="horizontal",
              location="top", **kwargs):
    n_interp = len(sweep)
    cmap_interp = mpl.colormaps[CMAP_NAME](np.linspace(0.0, 1.0, n_interp))
    smap = ScalarMappable(
        Normalize(vmin=sweep[0], vmax=sweep[-1]),
        cmap=LinearSegmentedColormap.from_list(CMAP_NAME, cmap_interp, N=n_interp),
    )
    cbar = fig.colorbar(smap, ax=ax, orientation=orientation,
                        location=location, **kwargs)
    cbar.set_label(label=label, size=14, color=color)
    cbar.ax.tick_params(labelsize=10)
    return cmap_interp


def _sample(model, params, config, key, x, c, cond, n=1):
    """Jitted model.sample through the shared compile cache so traversal
    loops reuse one compiled program."""
    out = cached_sample(
        model, params, key, x, c, cond=cond, n=n, grl_alpha=config.lambda_g0
    )
    return [np.asarray(o) for o in out]


# ----------------------------------------------------------------------
# Figures
# ----------------------------------------------------------------------

def visualize_training_loss(logs, n_skip_train=0, n_skip_val=0):
    """5-row loss-curve figure: ELBO, Rx, Ry, Rc, KL with twin train/val
    axes (ref: utils/visualization.py:29-117)."""
    it_tr, elbo = logs.scalars("ELBO")
    it_va, elbo_val = logs.scalars("ELBO_val")

    fig, ax = plt.subplots(5, 1, figsize=(16, 9))

    ax[0].plot(it_tr[n_skip_train:], elbo[n_skip_train:], label="Training",
               c="blue", alpha=0.3)
    ax[0].scatter(it_va[n_skip_val:], elbo_val[n_skip_val:],
                  label="Validation", c="red")
    ax[0].grid()
    ax[0].set_ylabel("ELBO")

    rows = [("Rx", "Rx_val"), ("Ry", "Ry_val"), ("Rc", "Rc_val"),
            ("KLx", "KLx_val")]
    ylabels = ["Rx", "Ry", "Rc", "KL"]
    for k, ((tr_name, va_name), ylab) in enumerate(zip(rows, ylabels), start=1):
        _, tr = logs.scalars(tr_name)
        _, va = logs.scalars(va_name)
        ax[k].plot(it_tr[n_skip_train:], tr[n_skip_train:], c="blue", alpha=0.8)
        ax_t = ax[k].twinx()
        ax_t.plot(it_va[n_skip_val:], va[n_skip_val:], color="red")
        ax[k].yaxis.label.set_color("blue")
        ax[k].tick_params(axis="y", colors="blue")
        ax_t.yaxis.label.set_color("red")
        ax_t.tick_params(axis="y", colors="red")
        ax[k].grid()
        ax[k].set_ylabel(ylab)
        ax_t.set_ylabel(f"{ylab}_val")
    return fig, ax


def plot_regression_error(y_test, y_pred, case, metrics=None, title=None):
    """ŷ-vs-y scatter with diagonal and metric annotations, one panel per
    y-dim (ref: utils/visualization.py:120-173)."""
    labels = [f.label for f in case.factors]
    z_idx_y = list(case.z_idx_y)
    nd_y = case.nd_y

    y_test = np.asarray(y_test)
    y_pred = np.asarray(y_pred)
    if y_test.ndim == 1:
        y_test = y_test[:, None]
    if y_pred.ndim == 1:
        y_pred = y_pred[:, None]

    fig, ax = plt.subplots(1, nd_y, figsize=(3 * nd_y, 4))
    ax = np.atleast_1d(ax)
    for i in range(nd_y):
        diag = np.array([y_pred[:, i].min(), y_pred[:, i].max()])
        ax[i].scatter(y_test[:, i], y_pred[:, i], c="red", s=3.0)
        ax[i].plot(diag, diag, linestyle="dashed", c="black", linewidth=2.0,
                   alpha=0.5)
        if metrics is not None:
            for j, (name, score) in enumerate(metrics.items()):
                ax[i].text(0.1, 0.90 - j * 0.05,
                           f"{name}={score[i]:.3f}", fontsize=12,
                           transform=ax[i].transAxes)
        ax[i].set_title(labels[z_idx_y[i]])
        ax[i].grid()
    if title is not None:
        plt.suptitle(title)
    return fig, ax


def plot_ground_truth_posterior(model, params, config, case, sample_dist,
                                n_plot=1000, cond=False, key=None):
    """Pairplot of {prior, ground truth, aggregated posterior} over the
    physics latents (ref: utils/visualization.py:176-223)."""
    import seaborn as sns

    if key is None:
        key = jax.random.PRNGKey(0)
    k_data, k_samp, k_prior = jax.random.split(key, 3)

    with on_host_cpu():
        x, c, y, z = sample_response(
            case, k_data, n_plot, sample_dist=sample_dist
        )
        prior_samples = np.asarray(case.prior_x_dist().sample(k_prior, (n_plot,)))
    out = _sample(model, params, config, k_samp, x, c, cond)
    zx_post = out[5][0]  # n=1 leading MC axis

    labels = [f.label for f in case.factors if f.type == "x"]
    z_idx_x = list(case.z_idx_x)

    df_gt = pd.DataFrame(np.asarray(z)[:, z_idx_x], columns=labels)
    df_gt.insert(0, "type", ["Ground truth"] * n_plot)
    df_post = pd.DataFrame(zx_post, columns=labels)
    df_post.insert(0, "type", ["Posterior Zp"] * n_plot)
    df_prior = pd.DataFrame(prior_samples, columns=labels)
    df_prior.insert(0, "type", ["Prior"] * n_plot)

    grid = sns.pairplot(pd.concat([df_prior, df_gt, df_post]),
                        hue="type", kind="hist")
    grid.fig.suptitle("Ground truth and posterior " + r"$z_p$")
    return grid.fig


def interp_corner_latent_space(model, params, config, case, idx_z_interp,
                               n_interp, n_plot=1000, cond=False, key=None):
    """Pairplot of posterior (z_x ‖ z_y) while traversing one factor
    (ref: utils/visualization.py:226-291)."""
    import seaborn as sns

    if key is None:
        key = jax.random.PRNGKey(0)
    k_data, k_samp = jax.random.split(key)
    labels = [f.label for f in case.factors]

    x, c, _, sweep = _traversal_data(case, idx_z_interp, n_interp, n_plot, k_data)

    frames = []
    for i in range(n_interp):
        out = _sample(model, params, config,
                      jax.random.fold_in(k_samp, i), x[:, i], c[:, i], cond)
        zx, zy = out[5][0], out[7][0]
        df = pd.DataFrame(np.hstack((zx, zy)))
        df.insert(0, "type",
                  [f"{labels[idx_z_interp]} = {sweep[i]:.4g}"] * n_plot)
        frames.append(df)
    grid = sns.pairplot(pd.concat(frames), hue="type", kind="hist",
                        diag_kind="kde", palette="plasma")
    grid.fig.suptitle("Posterior")
    return grid.fig


def plot_marginal_prior(model, params, config, case, n_plot=1000, key=None):
    """KDE grid of learned prior-net marginals p(z_c|c), p(z_y|y) under
    factor traversal, one colorbar per factor
    (ref: utils/visualization.py:294-375)."""
    import seaborn as sns

    if key is None:
        key = jax.random.PRNGKey(0)
    n_interp = config.n_interp
    nz_c, nz_y = config.nz_c, config.nz_y
    n_z = nz_c + nz_y
    n_factors = len(case.factors)

    zc_labels = [r"$z_\mathrm{c}$" + rf"$_{{{i}}}$" for i in range(nz_c)]
    zy_labels = [r"$z_\mathrm{y}$" + rf"$_{{{i}}}$" for i in range(nz_y)]
    z_labels = zc_labels + zy_labels

    fig, ax = plt.subplots(n_z, n_factors, figsize=(12, 6),
                           layout="compressed", sharey="row", sharex="row")
    ax = np.atleast_2d(ax)

    sample_prior = jax.jit(
        lambda p, k, c, y: model.sample_prior(p, k, c, y, n=1)
    )

    for idx in range(n_factors):
        k_data = jax.random.fold_in(key, idx)
        x, c, y, sweep = _traversal_data(case, idx, n_interp, n_plot, k_data)

        frames = []
        for i in range(n_interp):
            zc, _, zy, _ = sample_prior(
                params, jax.random.fold_in(k_data, 1000 + i),
                jnp.asarray(c[:, i]), jnp.asarray(y[:, i]),
            )
            z_cat = np.hstack((np.asarray(zc)[0], np.asarray(zy)[0]))
            df = pd.DataFrame(z_cat, columns=z_labels)
            df.insert(0, "type", [float(sweep[i])] * n_plot)
            frames.append(df)
        df_all = pd.concat(frames)

        for j in range(n_z):
            ax_ij = ax[j, idx]
            sns.kdeplot(data=df_all, x=z_labels[j], hue="type",
                        palette="plasma", ax=ax_ij, fill=True, legend=False)
            ax_ij.spines[["right", "top"]].set_visible(False)
            ax_ij.set(yticklabels=[])
            ax_ij.set_yticks([])
            ax_ij.set_ylabel(z_labels[j])
            ax_ij.set_xlabel(None)

        factor = case.factors[idx]
        _colorbar(fig, ax[0, idx], sweep, factor.label, "black",
                  fraction=1.0, pad=0.2)
    return fig, ax


def plot_marginal_post(model, params, config, case, vars_interp=None,
                       n_plot=1000, cond=False, key=None):
    """KDE grid of posterior marginals for all latent blocks under factor
    traversal (ref: utils/visualization.py:378-481)."""
    import seaborn as sns

    if key is None:
        key = jax.random.PRNGKey(0)
    n_interp = config.n_interp
    nz_x, nz_c, nz_y = case.nz_x, config.nz_c, config.nz_y
    n_z = nz_x + nz_c + nz_y

    if vars_interp is None:
        vars_interp = range(len(case.factors))
        figsize = (15, 8)
    else:
        figsize = (3 * len(vars_interp), 0.8 * n_z)

    zx_labels = [f.label for f in case.factors if f.type == "x"]
    zc_labels = [r"$z_\mathrm{c},$" + rf"$_{{{i + 1}}}$" for i in range(nz_c)]
    zy_labels = [r"$z_\mathrm{y},$" + rf"$_{{{i + 1}}}$" for i in range(nz_y)]
    z_labels = zx_labels + zc_labels + zy_labels
    z_types = ["x"] * nz_x + ["c"] * nz_c + ["y"] * nz_y

    fig, ax = plt.subplots(n_z, len(list(vars_interp)), figsize=figsize,
                           layout="compressed", sharex="row")
    ax = np.atleast_2d(ax)

    for col, idx in enumerate(vars_interp):
        k_data = jax.random.fold_in(key, idx)
        x, c, _, sweep = _traversal_data(case, idx, n_interp, n_plot, k_data)

        frames = []
        for i in range(n_interp):
            out = _sample(model, params, config,
                          jax.random.fold_in(k_data, 2000 + i),
                          x[:, i], c[:, i], cond)
            z_cat = np.hstack((out[5][0], out[6][0], out[7][0]))
            df = pd.DataFrame(z_cat, columns=z_labels)
            df.insert(0, "type", [float(sweep[i])] * n_plot)
            frames.append(df)
        df_all = pd.concat(frames)

        for j in range(n_z):
            ax_ij = ax[j, col]
            sns.kdeplot(data=df_all, x=z_labels[j], hue="type",
                        palette="plasma", ax=ax_ij, fill=True, legend=False)
            ax_ij.spines[["right", "top"]].set_visible(False)
            ax_ij.set(yticklabels=[])
            ax_ij.set_yticks([])
            ax_ij.set_ylabel(z_labels[j], color=CMAP_VARS[z_types[j]], size=12)
            ax_ij.set_xlabel(None)

        factor = case.factors[idx]
        _colorbar(fig, ax[0, col], sweep, factor.label,
                  CMAP_VARS[factor.type], fraction=1.0, pad=0.2)
    return fig, ax


def _pred_decomposition(model, params, config, case, idx, n_interp, n_plot,
                        cond, key):
    """Shared machinery of plot_interp_pred/plot_pred: traversal data +
    per-sweep-point mean/std of x̂_p, x̂_d, x̂."""
    k_data, k_samp = jax.random.split(key)
    x, c, _, sweep = _traversal_data(case, idx, n_interp, n_plot, k_data)
    rows = []
    for i in range(n_interp):
        out = _sample(model, params, config, jax.random.fold_in(k_samp, i),
                      x[:, i], c[:, i], cond)
        xh, xp, xd = out[0], out[1], out[2]
        rows.append({
            "x_data_mean": x[:, i].mean(axis=0),
            "xh_mean": xh.mean(axis=1)[0], "xh_std": xh.std(axis=1)[0],
            "xp_mean": xp.mean(axis=1)[0], "xp_std": xp.std(axis=1)[0],
            "xd_mean": xd.mean(axis=1)[0], "xd_std": xd.std(axis=1)[0],
        })
    return rows, sweep


def plot_interp_pred(model, params, config, case, n_interp=None, n_plot=1000,
                     cond=False, key=None):
    """3 x n_factors grid: x̂_p, x̂_d, x̂ = x̂_p + x̂_d mean ± 2σ bands per
    factor traversal (ref: utils/visualization.py:484-605)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_interp = n_interp or config.n_interp
    t = np.asarray(case.t)
    n_factors = len(case.factors)
    cmap_interp = mpl.colormaps[CMAP_NAME](np.linspace(0.0, 1.0, n_interp))

    fig, ax = plt.subplots(3, n_factors, figsize=(16, 9), sharex="col",
                           sharey="row", layout="compressed")
    ax = np.atleast_2d(ax)

    for idx, factor in enumerate(case.factors):
        rows, sweep = _pred_decomposition(
            model, params, config, case, idx, n_interp, n_plot, cond,
            jax.random.fold_in(key, idx),
        )
        for i, r in enumerate(rows):
            color = cmap_interp[i]
            ax[0, idx].fill_between(t, r["xp_mean"] - 2 * r["xp_std"],
                                    r["xp_mean"] + 2 * r["xp_std"],
                                    alpha=0.5, color=color)
            ax[0, idx].plot(t, r["xp_mean"], alpha=0.5, color=color,
                            label=factor.label + rf"$={sweep[i]:.3f}$")
            ax[1, idx].fill_between(t, r["xd_mean"] - 2 * r["xd_std"],
                                    r["xd_mean"] + 2 * r["xd_std"],
                                    alpha=0.3, color=color)
            ax[1, idx].plot(t, r["xd_mean"], alpha=0.5, color=color)
            ax[2, idx].fill_between(t, r["xh_mean"] - 2 * r["xh_std"],
                                    r["xh_mean"] + 2 * r["xh_std"],
                                    alpha=0.5, color=color)
            ax[2, idx].scatter(t, r["x_data_mean"], color=color)
            ax[2, idx].plot(t, r["xh_mean"], alpha=0.5, color=color)
        for row in range(3):
            ax[row, idx].grid()
        ax[2, idx].set_xlabel(case.x_unit, fontsize=16)
        _colorbar(fig, ax[0, idx], sweep, factor.label,
                  CMAP_VARS[factor.type])
    ax[0, 0].set_ylabel(r"$\hat{x_\mathrm{p}}$ " + case.y_unit, fontsize=18)
    ax[1, 0].set_ylabel(r"$\hat{x_\mathrm{d}}$ " + case.y_unit, fontsize=18)
    ax[2, 0].set_ylabel(r"$\hat{x}$ " + case.y_unit, fontsize=18)
    return fig, ax


def plot_pred(model, params, config, case, idx_var_gt, n_interp=None,
              n_plot=1000, cond=False, key=None):
    """1x3 prediction decomposition for a single factor
    (ref: utils/visualization.py:608-731)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_interp = n_interp or config.n_interp
    t = np.asarray(case.t)
    factor = case.factors[idx_var_gt]
    cmap_interp = mpl.colormaps[CMAP_NAME](np.linspace(0.0, 1.0, n_interp))

    fig, ax = plt.subplots(1, 3, figsize=(9, 3), layout="compressed")

    rows, sweep = _pred_decomposition(
        model, params, config, case, idx_var_gt, n_interp, n_plot, cond, key
    )
    for i, r in enumerate(rows):
        color = cmap_interp[i]
        ax[0].fill_between(t, r["xp_mean"] - 2 * r["xp_std"],
                           r["xp_mean"] + 2 * r["xp_std"], alpha=0.2,
                           color=color)
        ax[0].plot(t, r["xp_mean"], alpha=0.5, color=color,
                   label=factor.label + rf"$={sweep[i]:.3f}$")
        ax[1].fill_between(t, r["xd_mean"] - 2 * r["xd_std"],
                           r["xd_mean"] + 2 * r["xd_std"], alpha=0.2,
                           color=color)
        ax[1].plot(t, r["xd_mean"], alpha=0.5, color=color)
        ax[2].fill_between(t, r["xh_mean"] - 2 * r["xh_std"],
                           r["xh_mean"] + 2 * r["xh_std"], alpha=0.2,
                           color=color)
        ax[2].plot(t, r["xh_mean"], alpha=1.0, linestyle="solid", color=color)
        ax[2].scatter(t, r["x_data_mean"], alpha=1.0, s=8.0, color=color)

    for a in ax:
        a.grid()
        a.set_xlabel(case.x_unit, fontsize=16)
    _colorbar(fig, ax[-1], sweep, factor.label, CMAP_VARS[factor.type],
              orientation="vertical", location="right")
    ax[0].set_ylabel(r"$\hat{x_\mathrm{p}}$ " + case.y_unit, fontsize=18)
    ax[1].set_ylabel(r"$\hat{x_\mathrm{d}}$ " + case.y_unit, fontsize=18)
    ax[2].set_ylabel(r"$\hat{x}$ " + case.y_unit, fontsize=18)
    return fig, ax
