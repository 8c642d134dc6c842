"""Transfer/extrapolation study on the bridge case
(ref: 2_regression_comparison.py).

The physics-latent box splits into 4 quadrant domains; each fold trains on a
3-quadrant mixture and tests on the held-out quadrant (interpolation), or
vice versa (extrapolation). The reference trains 6 runs × 4 domains × 2 VAE
presets = 48 models serially plus 72 sklearn fits; here each preset's
24-member (run × domain) grid trains as one vmapped device program
(``train_sweep_data`` with per-member quadrant datasets), sklearn baselines
run on host, and results aggregate into the same mean±std LaTeX tables.

    python scripts/2_regression_comparison.py [--case bridge] \
        [--dist_type extrapolation] [--n_runs 6] [--n_iter 20000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pandas as pd

N_DOMAINS = 4


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", default="bridge")
    parser.add_argument("--name", default="transfer")
    parser.add_argument("--dist_type", default="extrapolation",
                        choices=["interpolation", "extrapolation"])
    parser.add_argument("--n_runs", type=int, default=6)
    parser.add_argument("--n_iter", type=int, default=None)
    parser.add_argument("--n_train", type=int, default=None)
    parser.add_argument("--n_val", type=int, default=None)
    parser.add_argument("--n_test", type=int, default=None)
    parser.add_argument("--cond", action="store_true")
    parser.add_argument("--plot_domain", action="store_true")
    parser.add_argument("--skip_baselines", action="store_true")
    parser.add_argument(
        "--baselines", default="sklearn", choices=["sklearn", "jax"],
        help="comparison-baseline backend: 'sklearn' is the reference's "
             "serial host path; 'jax' fits all members' LIN/GPR/MLP as "
             "three batched device programs (certified against sklearn, "
             "see benchmarks/experiments/baseline_certify.py)")
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--output", default="output")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="shard sweep members over a device mesh "
                             "(training and batched prediction)")
    args = parser.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.eval import run_comparison
    from dpivae_tpu.sweep import sweep_predict_y, train_sweep_data
    from dpivae_tpu.utils.data import sample_response
    from dpivae_tpu.utils.metrics import regression_metrics
    from dpivae_tpu.utils.priors import make_square_dist

    case = get_case(args.case)
    base_cfg = TrainConfig().replace(use_seed=True, seed=args.seed)
    overrides = {
        k: getattr(args, k)
        for k in ("n_iter", "n_train", "n_val", "n_test")
        if getattr(args, k) is not None
    }
    if overrides:
        base_cfg = base_cfg.replace(**overrides)

    path_output = os.path.join(args.output, args.name)
    for sub in ("metrics", "figures", "settings", "models"):
        os.makedirs(os.path.join(path_output, sub), exist_ok=True)
    base_cfg.save_json(os.path.join(path_output, "settings", "args.json"))

    # Domain splits (ref: :64-69)
    if args.dist_type == "interpolation":
        dists_train, dists_test = make_square_dist(case)
    else:
        dists_test, dists_train = make_square_dist(case)

    # Per-(run, domain) datasets on host CPU (eager TPU ops pay remote-
    # compile latency): member = j_run * N_DOMAINS + i_dom
    from dpivae_tpu.utils import on_host_cpu

    key = jax.random.PRNGKey(args.seed)
    members = []
    with on_host_cpu():
        for j in range(args.n_runs):
            for i in range(N_DOMAINS):
                k = jax.random.fold_in(key, j * N_DOMAINS + i)
                k_tr, k_va, k_te = jax.random.split(k, 3)
                dtr = sample_response(case, k_tr, base_cfg.n_train,
                                      sample_dist=dists_train[i])
                dva = sample_response(case, k_va, base_cfg.n_val,
                                      sample_dist=dists_train[i])
                dte = sample_response(case, k_te, base_cfg.n_test,
                                      sample_dist=dists_test[i])
                members.append(jax.tree.map(np.asarray, (dtr, dva, dte)))

    if args.plot_domain:
        from matplotlib import pyplot as plt

        labels_x = [f.label for f in case.factors if f.type == "x"]
        fig, ax = plt.subplots(1, N_DOMAINS, figsize=(12, 3),
                               layout="compressed")
        for i in range(N_DOMAINS):
            z_tr = np.asarray(members[i][0][3])
            z_te = np.asarray(members[i][2][3])
            ax[i].scatter(z_tr[:, 0], z_tr[:, 1], s=4.0)
            ax[i].scatter(z_te[:, 0], z_te[:, 1], s=4.0)
            ax[i].set_xlabel(labels_x[0], fontsize=14)
            ax[i].set_title(f"Sub-case {i + 1}")
            allz = np.vstack((z_tr[:, :2], z_te[:, :2]))
            ax[i].axvline(x=allz[:, 0].mean(), color="black")
            ax[i].axhline(y=allz[:, 1].mean(), color="black")
        ax[0].set_ylabel(labels_x[1], fontsize=14)
        fig.savefig(os.path.join(path_output, "figures", "domains.png"))
        plt.close(fig)

    def stack(idx):
        return tuple(
            np.stack([np.asarray(m[idx][k]) for m in members])
            for k in range(3)
        )

    data_train_stack = stack(0)
    data_val_stack = stack(1)

    n_members = len(members)
    mesh = None
    if args.n_devices:
        from dpivae_tpu.parallel import make_mesh

        if n_members % args.n_devices:
            parser.error(
                f"--n_devices must divide the member count ({n_members} = "
                f"{args.n_runs} runs x {N_DOMAINS} domains)"
            )
        mesh = make_mesh(args.n_devices, axes=("sweep",))
    dict_run_metrics = {j: {} for j in range(args.n_runs)}
    dict_run_pred = {j: {} for j in range(args.n_runs)}

    # Phase timings (committed breakdown contract, as in script 1)
    timings = {}
    t_study = time.perf_counter()

    def mark(phase, t0):
        timings[phase] = round(time.perf_counter() - t0, 2)
        print(f"[phase] {phase}: {timings[phase]:.1f}s", file=sys.stderr,
              flush=True)
        return time.perf_counter()

    # Separate tunnel attach (1.4s-524s observed variance) from training
    t0 = time.perf_counter()
    float(np.asarray(jax.jit(lambda a: a + 1)(jax.numpy.zeros(()))))
    t0 = mark("device_init", t0)

    # Train each preset's full (run x domain) grid as one batched program
    for preset_idx, preset in enumerate(("DPIVAE-A", "DPIVAE-B")):
        cfg = base_cfg.with_preset(case.presets[preset])
        print(f"Training {preset}: {n_members} members "
              f"({args.n_runs} runs × {N_DOMAINS} domains) batched ...")
        t0 = time.perf_counter()
        result = train_sweep_data(
            cfg, case,
            lambdas=np.full(n_members, cfg.lambda_g0, np.float32),
            data_train=data_train_stack, data_val=data_val_stack,
            # stable per-preset stream (hash() is salted per process and
            # would break reproducibility)
            key=jax.random.fold_in(key, 10_000 + preset_idx),
            mesh=mesh,
            # completed chunks persist (manifest-guarded): the healing
            # retry after a transient device fault resumes, not retrains
            checkpoint_dir=(
                None if mesh
                else os.path.join(path_output, f"chunks_{preset}")
            ),
        )
        # block_until_ready is a no-op on the tunneled backend; force with
        # a host transfer so the phase boundary is real
        float(np.asarray(jax.tree.leaves(result.params)[0]).ravel()[0])
        t0 = mark(f"train_{preset}", t0)
        # Batched evaluation: one vmapped sample over all members
        # (ref evaluate_model semantics: posterior-mean ŷ over n_mc_test MC
        # samples, dpivae.py:538-553)
        x_test_stack = np.stack([np.asarray(m[2][0]) for m in members])
        c_test_stack = np.stack([np.asarray(m[2][1]) for m in members])
        y_pred_stack = np.asarray(
            sweep_predict_y(
                cfg, case, result, data_train_stack, x_test_stack,
                c_test_stack, cond=args.cond, n=cfg.n_mc_test,
                key=jax.random.fold_in(key, 999), mesh=mesh,
            )
        )
        for m in range(n_members):
            j, i = divmod(m, N_DOMAINS)
            y_test_m = np.asarray(members[m][2][2])
            metrics = regression_metrics(y_test_m, y_pred_stack[m])
            dict_run_metrics[j].setdefault(i + 1, {})[preset] = metrics
            dict_run_pred[j].setdefault(i + 1, {})[preset] = y_pred_stack[m]
        t0 = mark(f"predict_{preset}", t0)

    # Comparison baselines (ref: :191-193). The reference fits sklearn
    # LIN/GPR/MLP serially per member; --baselines jax fits each family for
    # ALL members as one batched device program (eval/baselines.py).
    if not args.skip_baselines:
        t0 = time.perf_counter()
        if args.baselines == "jax":
            from dpivae_tpu.eval import run_comparison_batched

            data_test_stack = stack(2)
            metrics_b, preds_b = run_comparison_batched(
                data_train_stack, data_test_stack,
                key=jax.random.fold_in(key, 777),
            )
            for m in range(n_members):
                j, i = divmod(m, N_DOMAINS)
                dict_run_metrics[j].setdefault(i + 1, {}).update(metrics_b[m])
                dict_run_pred[j].setdefault(i + 1, {}).update(preds_b[m])
        else:
            for m, (dtr, dva, dte) in enumerate(members):
                j, i = divmod(m, N_DOMAINS)
                print(f"Baselines: run {j + 1}/{args.n_runs} "
                      f"domain {i + 1}/{N_DOMAINS}")
                metrics, pred = run_comparison(base_cfg, case, dtr, dte)
                dict_run_metrics[j].setdefault(i + 1, {}).update(metrics)
                dict_run_pred[j].setdefault(i + 1, {}).update(pred)
        t0 = mark("baselines", t0)

    # Aggregate to the reference's mean±std tables (ref: :226-296)
    list_domains = sorted(dict_run_metrics[0].keys())
    list_models = list(dict_run_metrics[0][list_domains[0]].keys())
    idx = pd.MultiIndex.from_product(
        [range(args.n_runs), list_domains, list_models],
        names=["Run", "Domain", "Model"],
    )
    df_dom = pd.DataFrame(index=idx, columns=["R2", "MSE", "MAE"], dtype=float)
    for j, by_domain in dict_run_metrics.items():
        for i, by_model in by_domain.items():
            for name, metrics in by_model.items():
                df_dom.loc[(j, i, name)] = [
                    float(np.mean(metrics[k])) for k in ("R2", "MSE", "MAE")
                ]

    df_run_agg = df_dom.groupby(level=["Domain", "Model"]).agg(["mean", "std"])
    df_dom_agg = df_dom.groupby(level=["Model"]).agg(["mean", "std"])

    def fmt(df_agg):
        out = pd.DataFrame(index=df_agg.index)
        for metric in ("R2", "MSE"):
            out[metric] = (
                df_agg[(metric, "mean")].map("{:.3f}".format)
                + " $\\pm$ "
                + df_agg[(metric, "std")].map("{:.3f}".format)
            )
        return out

    table_dom = fmt(df_run_agg)
    table_avg = fmt(df_dom_agg)
    print(table_dom.to_string())
    print(table_avg.to_string())

    df_dom.to_csv(os.path.join(path_output, "metrics", "raw_metrics.csv"))
    caption = f"Comparison of model performance metrics in {args.dist_type}"
    with open(os.path.join(path_output, "metrics", "table.tex"), "w") as f:
        f.write(table_dom.reset_index().to_latex(
            index=False, caption=caption, position="htb!",
        ))
        f.write("\n")
        f.write(table_avg.reset_index().to_latex(
            index=False, caption=caption + " (avg over domains)",
            position="htb!",
        ))
    timings["total"] = round(time.perf_counter() - t_study, 2)
    with open(os.path.join(path_output, "timings.json"), "w") as f:
        json.dump(timings, f, indent=2)
    print(f"[phase] total: {timings['total']:.1f}s", file=sys.stderr,
          flush=True)
    print(f"Wrote {path_output}/metrics/{{raw_metrics.csv,table.tex}} "
          f"and timings.json")


if __name__ == "__main__":
    # Multi-minute TPU studies self-heal the two known environment fault
    # classes (transient tunnel drop -> wait + retry; stale libtpu compile
    # cache -> clear + retry); with chunk checkpoints the retry resumes
    # from completed work. Deterministic failures propagate immediately.
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
