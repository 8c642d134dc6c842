"""Single train+eval run with the full plotting suite
(ref: 0_single_run.py).

Unlike the reference (which is configured by editing in-file variables,
ref 0_single_run.py:25-27), this is a real CLI:

    python scripts/0_single_run.py --case simple_beam --preset dpivae \
        [--name single_run] [--n_iter 20000] [--cond] [--no-plots]

Outputs mirror the reference layout: output/<name>/{metrics,figures,
settings,models} with args.json, per-series metric CSVs, the figure set,
and (as a framework improvement over the reference, which never saves
weights) a servable orbax checkpoint — params + fitted input scalers +
config — restorable with ``train.checkpoint.load_model(path, case)``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", default="simple_beam")
    parser.add_argument("--preset", default="dpivae")
    parser.add_argument("--name", default="single_run")
    parser.add_argument("--n_iter", type=int, default=None)
    parser.add_argument("--n_train", type=int, default=None)
    parser.add_argument("--n_val", type=int, default=None)
    parser.add_argument("--n_test", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--cond", action="store_true")
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--output", default="output")
    parser.add_argument(
        "--n_devices", type=int, default=1,
        help="data-parallel devices: shards each train/val batch over a "
             "'dp' mesh axis (params replicated, XLA inserts the gradient "
             "all-reduce); 1 = single-device program",
    )
    parser.add_argument(
        "--export_serving", action="store_true",
        help="also write models/predictor.shlo: a self-contained "
             "jax.export (StableHLO) serving artifact — weights baked in, "
             "shape-polymorphic batch, cpu+tpu — loadable with "
             "dpivae_tpu.serving.load_predictor and no model code",
    )
    args = parser.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.eval import evaluate_model, run_comparison
    from dpivae_tpu.train import setup_model, train_model
    from dpivae_tpu.train.checkpoint import save_model
    from dpivae_tpu.utils.data import sample_response
    from dpivae_tpu.utils.logging import save_logs_csv

    case = get_case(args.case)
    if args.preset not in case.presets:
        parser.error(
            f"unknown preset {args.preset!r} for case {args.case!r}; "
            f"have {sorted(case.presets)}"
        )
    cfg = TrainConfig().with_preset(case.presets[args.preset])
    cfg = cfg.replace(name=args.name, use_seed=True)
    for field in ("n_iter", "n_train", "n_val", "n_test", "seed"):
        value = getattr(args, field)
        if value is not None:
            cfg = cfg.replace(**{field: value})
    if cfg.n_batch > cfg.n_train:
        cfg = cfg.replace(n_batch=cfg.n_train)

    # Output layout (ref: 0_single_run.py:47-64)
    path_output = os.path.join(args.output, args.name)
    paths = {
        sub: os.path.join(path_output, sub)
        for sub in ("metrics", "figures", "settings", "models")
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    cfg.save_json(os.path.join(paths["settings"], "args.json"))

    # Data (ref: 0_single_run.py:72-91); host-phase sampling runs on CPU
    # (eager ops on the TPU tunnel pay ~1s/op remote-compile latency)
    from dpivae_tpu.utils import on_host_cpu

    dist_gt = case.gt_dist()
    key = jax.random.PRNGKey(cfg.seed)
    # 4-way split kept for stream stability: k_tr/k_va/k_te must keep
    # producing the same datasets as earlier releases; the fourth leg is
    # unused (training keys come from make_train_key(cfg.seed + 3)).
    k_tr, k_va, k_te, _ = jax.random.split(key, 4)
    with on_host_cpu():
        data_train = sample_response(case, k_tr, cfg.n_train, sample_dist=dist_gt)
        data_val = sample_response(case, k_va, cfg.n_val, sample_dist=dist_gt)
        data_test = sample_response(case, k_te, cfg.n_test, sample_dist=dist_gt)
        data_train, data_val, data_test = jax.tree.map(
            np.asarray, (data_train, data_val, data_test)
        )

    # Train (ref: 0_single_run.py:96-98)
    model = setup_model(cfg, case, data_train)
    mesh = None
    if args.n_devices > 1:
        from dpivae_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices, axes=("dp",))
        print(f"Data-parallel over {args.n_devices} devices (mesh axis 'dp')")
    print(f"Training {args.case}/{args.preset} for {cfg.n_iter} iters ...")
    # Single-run training key: rbg on TPU (+17% throughput, deterministic
    # at fixed shape), threefry on CPU — see train.make_train_key.
    from dpivae_tpu.train.train import make_train_key

    params, logs = train_model(
        cfg, model, case, data_train, data_val,
        key=make_train_key(cfg.seed + 3), mesh=mesh,
    )
    print(f"Done: stopped at iter {logs.stop_iter}, "
          f"final train ELBO {logs.scalars('ELBO')[1][-1]:.4f}, "
          f"final val ELBO {logs.scalars('ELBO_val')[1][-1]:.4f}")

    save_logs_csv(logs, paths["metrics"])
    save_model(
        os.path.join(paths["models"], "model"), model, params, cfg, case=case
    )
    if args.export_serving:
        from dpivae_tpu.serving import save_predictor

        shlo = save_predictor(
            os.path.join(paths["models"], "predictor.shlo"),
            model, params, cfg, case, cond=args.cond,
        )
        print(f"Serving artifact: {shlo} (+ .meta.json)")

    # Evaluation (ref: 0_single_run.py:115-131)
    dict_metrics, dict_pred = run_comparison(cfg, case, data_train, data_test)
    vae_metrics, vae_pred = evaluate_model(
        cfg, case, model, params, data_test, cond=args.cond
    )
    dict_metrics.update(vae_metrics)
    dict_pred.update(vae_pred)
    for name, m in dict_metrics.items():
        print(f"{name}: R2={np.round(m['R2'], 4)} MSE={np.round(m['MSE'], 5)}")

    if args.no_plots:
        return

    from dpivae_tpu.viz import (
        plot_ground_truth_posterior,
        plot_interp_pred,
        plot_marginal_post,
        plot_marginal_prior,
        plot_pred,
        plot_regression_error,
        save_close_fig,
        visualize_training_loss,
    )

    fig_dir = paths["figures"]
    y_test = np.asarray(data_test[2])

    fig, _ = visualize_training_loss(
        logs, n_skip_train=cfg.n_skip_plot_train, n_skip_val=cfg.n_skip_plot_val
    )
    save_close_fig(fig, os.path.join(fig_dir, "loss_curve.png"))

    for name, pred in dict_pred.items():
        fig, _ = plot_regression_error(
            y_test, pred, case, metrics=dict_metrics[name], title=f"{name}: Test"
        )
        save_close_fig(
            fig, os.path.join(fig_dir, f"regression_error_test_{name}.png")
        )

    # Traversal prediction plots per factor (ref: 0_single_run.py:137-143)
    for idx in range(len(case.factors)):
        fig, _ = plot_pred(model, params, cfg, case, idx, cond=args.cond,
                           n_plot=cfg.n_plot)
        save_close_fig(fig, os.path.join(fig_dir, f"fig_pred_x_{idx}.png"))

    # Interpolation / marginal plots (ref: 0_single_run.py:145-192)
    fig, _ = plot_interp_pred(model, params, cfg, case, cond=args.cond,
                              n_plot=cfg.n_plot)
    save_close_fig(fig, os.path.join(fig_dir, "fig_pred_interp_x.png"))

    fig, _ = plot_marginal_post(model, params, cfg, case, cond=args.cond,
                                n_plot=cfg.n_plot)
    save_close_fig(fig, os.path.join(fig_dir, "fig_post_marginal_z.png"))

    fig, _ = plot_marginal_post(model, params, cfg, case, vars_interp=[0, 1],
                                cond=args.cond, n_plot=cfg.n_plot)
    save_close_fig(fig, os.path.join(fig_dir, "fig_post_marginal_z_01.png"))

    fig, _ = plot_marginal_prior(model, params, cfg, case, n_plot=cfg.n_plot)
    save_close_fig(fig, os.path.join(fig_dir, "fig_prior_marginal_z.png"))

    # Aggregated posterior vs ground truth (ref: 0_single_run.py:194-202)
    fig = plot_ground_truth_posterior(
        model, params, cfg, case, dist_gt, n_plot=cfg.n_plot, cond=args.cond
    )
    save_close_fig(fig, os.path.join(fig_dir, "fig_posterior_ground_truth.png"))
    print(f"Figures written to {fig_dir}")


if __name__ == "__main__":
    # Multi-minute TPU studies self-heal the two known environment fault
    # classes (transient tunnel drop -> wait + retry; stale libtpu compile
    # cache -> clear + retry); with chunk checkpoints the retry resumes
    # from completed work. Deterministic failures propagate immediately.
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
