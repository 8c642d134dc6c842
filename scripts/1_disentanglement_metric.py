"""Disentanglement λ-sweep (ref: 1_disentanglement_metric.py).

The reference trains 11 λ values × 6 seeds = 66 models *serially*. Here the
whole grid trains as ONE vmapped (optionally multi-chip-sharded) device
program via ``dpivae_tpu.sweep``; the sklearn disentanglement probes then
run per member on host, and results aggregate into the same
``disentanglement_score.csv`` + symlog score-vs-λ figure.

    python scripts/1_disentanglement_metric.py --case damped_oscillator \
        [--preset dpivae] [--n_runs 6] [--n_iter 20000] [--regressor linear]
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

SCALE_LAMBDA = 1e4
# λ·10^4 grid (ref: 1_disentanglement_metric.py:53-56)
VAR_LIST = np.array(
    [1e4, 1e3, 1e2, 1e1, 1e0, 0.0, -1e0, -1e1, -1e2, -1e3, -1e4]
) / SCALE_LAMBDA


def _sklearn_probe_member(job):
    """One member's sklearn probe fits (runs in a spawn child).

    Returns (rows, None) or (None, error-string) — per-member failure
    isolation survives the pool (ref collects failures, :149-150)."""
    lat_tr, lat_te, z_tr, z_te, factors, regressor = job
    try:
        from dpivae_tpu.eval import fit_disentanglement_probes

        return fit_disentanglement_probes(
            lat_tr, lat_te, z_tr, z_te, factors, regressor=regressor
        ), None
    except Exception as e:
        return None, str(e)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--case", default="damped_oscillator")
    parser.add_argument("--preset", default="dpivae")
    parser.add_argument("--name", default="disentanglement")
    parser.add_argument("--n_runs", type=int, default=6)
    parser.add_argument("--n_iter", type=int, default=None)
    parser.add_argument(
        "--regressor", default="linear",
        choices=["linear", "mlp", "linear_jax", "mlp_jax"],
        help="probe regressor: linear/mlp = per-member sklearn (reference "
             "semantics, ref dpivae.py:684-693); *_jax = all probes "
             "trained concurrently as one batched device program",
    )
    parser.add_argument("--probe_epochs", type=int, default=300,
                        help="training epochs for the batched mlp_jax probe")
    parser.add_argument("--probe_workers", type=int,
                        default=min(8, os.cpu_count() or 1),
                        help="process-pool workers for the sklearn probe "
                             "paths (linear/mlp); 1 = serial (the default "
                             "never exceeds the host's core count — spawning "
                             "workers on a 1-core box only adds interpreter "
                             "startup to the same serialized work)")
    parser.add_argument("--n_train_regressor", type=int, default=2048)
    parser.add_argument("--n_test_regressor", type=int, default=2048)
    parser.add_argument("--cond", action="store_true")
    parser.add_argument("--use_mean", action="store_true")
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--output", default="output")
    parser.add_argument("--lambdas", type=float, nargs="*", default=None,
                        help="override the λ grid (raw values, not x1e4)")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="shard sweep members over a device mesh")
    parser.add_argument("--latents_chunk", type=int, default=None,
                        help="members per batched latent-extraction program "
                             "(default: sweep.LATENTS_CHUNK_DEFAULT)")
    args = parser.parse_args()

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.sweep import sweep_disentanglement_latents, train_sweep
    from dpivae_tpu.utils import CMAP_VARS
    from dpivae_tpu.utils.logging import save_logs_csv

    case = get_case(args.case)
    if args.preset not in case.presets:
        parser.error(
            f"unknown preset {args.preset!r} for case {args.case!r}; "
            f"have {sorted(case.presets)}"
        )
    cfg = TrainConfig().with_preset(case.presets[args.preset]).replace(
        use_seed=True, seed=args.seed
    )
    if args.n_iter is not None:
        cfg = cfg.replace(n_iter=args.n_iter)
    lambdas = np.asarray(
        args.lambdas if args.lambdas is not None else VAR_LIST, np.float32
    )

    path_output = os.path.join(args.output, args.name)
    os.makedirs(path_output, exist_ok=True)
    cfg.save_json(os.path.join(path_output, "args.json"))

    # Phase timings: committed alongside results so end-to-end wall time
    # has a measured breakdown, not a guess (timings.json).
    timings = {}
    t_start = time.perf_counter()

    def mark(phase, t0):
        timings[phase] = round(time.perf_counter() - t0, 2)
        print(f"[phase] {phase}: {timings[phase]:.1f}s", file=sys.stderr,
              flush=True)
        return time.perf_counter()

    n_members = len(lambdas) * args.n_runs
    print(
        f"Training {n_members} sweep members ({len(lambdas)} λ × "
        f"{args.n_runs} runs) as one batched program ..."
    )
    mesh = None
    if args.n_devices:
        from dpivae_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices, axes=("sweep",))
    # Separate device/tunnel attach from training: on the tunneled backend
    # the first device contact after another process just released the
    # chip can block for minutes (observed 15s-450s variance) — that's
    # environment, not training.
    t0 = time.perf_counter()
    import jax.numpy as jnp

    float(np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros(()))))
    t0 = mark("device_init", t0)

    # Warm the latent-extraction programs in a background thread while the
    # sweep occupies the device: the compile/cache-load that dominates a
    # cold extraction (~9-24s) is host-side and overlaps training; the
    # dummy execution interleaves ~0.1s/chunk into the device queue, so
    # the post-training extraction below runs at steady state.
    import threading

    from dpivae_tpu.sweep import warm_disentanglement_latents

    def _warm():
        try:
            warm_disentanglement_latents(
                cfg, case, n_members, args.n_train_regressor,
                args.n_test_regressor, cond=args.cond,
                use_mean=args.use_mean, chunk_size=args.latents_chunk,
            )
            if args.regressor.endswith("_jax"):
                from dpivae_tpu.eval.probes import warm_batched_probes

                warm_batched_probes(
                    (case.nz_x, cfg.nz_c, cfg.nz_y), len(case.factors),
                    n_members, args.n_train_regressor,
                    args.n_test_regressor, regressor=args.regressor,
                    **({"n_epochs": args.probe_epochs}
                       if args.regressor == "mlp_jax" else {}),
                )
        except Exception as e:  # best-effort; losing the warm only costs time
            print(f"[warn] latents warm-up failed: {e}", file=sys.stderr)

    warm_thread = threading.Thread(target=_warm, daemon=True)
    warm_thread.start()

    # Stream the 66 per-member metric CSV dirs (ref per-run output dirs,
    # :95-107) into the training wall time: every completed chunk hands
    # host arrays to a thread pool while later chunks still compute on the
    # device, so this host IO costs ~0 exposed seconds (was a 15s
    # post-training phase). the pyarrow CSV writer releases the GIL.
    from concurrent.futures import ThreadPoolExecutor

    from dpivae_tpu.train.train import TrainLogs

    # 2 workers: the host has ONE core, so more threads only steal cycles
    # from the chunk loop's dispatch thread; with the pyarrow writer the
    # whole 66-member CSV load is ~3.5s of C-level work.
    csv_pool = ThreadPoolExecutor(max_workers=2)
    csv_futures = []
    csv_hidden_t = []

    def _write_member(m, logs_m):
        t_w = time.perf_counter()
        save_logs_csv(logs_m, os.path.join(path_output, str(m), "metrics"))
        csv_hidden_t.append(time.perf_counter() - t_w)

    def on_chunk(start, params_chunk, logs_chunk):
        n_in_chunk = jax.tree.leaves(logs_chunk)[0].shape[0]
        for j in range(n_in_chunk):
            logs_m = TrainLogs(
                *jax.tree.map(lambda a, j=j: a[j], tuple(logs_chunk))
            )
            csv_futures.append(
                csv_pool.submit(_write_member, start + j, logs_m)
            )

    result = train_sweep(
        cfg, case, lambdas=lambdas, n_runs=args.n_runs,
        key=jax.random.PRNGKey(args.seed), mesh=mesh,
        # completed chunks persist; rerunning the same study resumes
        checkpoint_dir=None if mesh else os.path.join(path_output, "chunks"),
        chunk_callback=None if mesh else on_chunk,
    )
    # jax.block_until_ready is a no-op on the tunneled backend: force with
    # a host transfer so the phase boundary is real.
    float(np.asarray(jax.tree.leaves(result.params)[0]).ravel()[0])
    t0 = mark("train", t0)
    # The latents call below must not race the warm thread's build of the
    # same cached program (it finishes well inside the training time).
    warm_thread.join()
    print("Sweep training done; running disentanglement probes ...")

    # Batched latent extraction on device (one vmapped program), then
    # host-side sklearn probes per member (ref: :134-150)
    latents = sweep_disentanglement_latents(
        cfg, case, result, args.n_train_regressor, args.n_test_regressor,
        cond=args.cond, use_mean=args.use_mean,
        key=jax.random.PRNGKey(args.seed + 1),
        chunk_size=args.latents_chunk,
    )
    # Latents STAY on device for the *_jax probe path (the batched probe
    # program consumes them directly; only the (P,) scores come back) —
    # a host round-trip of the ~65 MB packed probes through the TPU
    # tunnel cost 12-40 s at study scale. Force with one scalar transfer
    # so the phase boundary is real (block_until_ready is a no-op here):
    # index ON DEVICE first — np.asarray of the full leaf would transfer
    # the whole multi-MB array to read one element.
    leaf = jax.tree.leaves(latents)[0]
    float(np.asarray(leaf[(0,) * leaf.ndim]))
    t0 = mark("latents", t0)
    # One bulk device->host copy; the per-member loops below would
    # otherwise pay ~1s/member for eager device slices (see
    # SweepResult.host).
    result = result.host()
    t0 = mark("host_copy", t0)

    df_columns = ["set", "gen_factor", "score", "idx_var", "iter", "lambda"]
    rows_all = []
    list_fail = []
    if args.regressor.endswith("_jax"):
        # All (member, factor, block) probes train as ONE batched device
        # program instead of M*F*3 serial sklearn fits.
        from dpivae_tpu.eval import batched_probe_scores

        mlp_kwargs = (
            {"n_epochs": args.probe_epochs}
            if args.regressor == "mlp_jax" else {}
        )
        scores = batched_probe_scores(
            {b: latents[f"{b}_train"] for b in ("zx", "zc", "zy")},
            {b: latents[f"{b}_test"] for b in ("zx", "zc", "zy")},
            latents["z_train"], latents["z_test"],
            n_factors=len(case.factors), regressor=args.regressor,
            key=jax.random.PRNGKey(args.seed + 2),
            **mlp_kwargs,
        )
        for m in range(result.n_members):
            i_lambda, j_run = divmod(m, args.n_runs)
            if not np.all(np.isfinite(scores[m])):
                # Per-member failure isolation, matching the sklearn
                # path's collect-don't-abort contract: a diverged member
                # (NaN latents -> NaN probe R²) is recorded, not written
                # as silent NaN rows.
                list_fail.append(
                    [i_lambda, j_run, m, float(result.lambdas[m]),
                     "non-finite probe scores"]
                )
                continue
            for i, factor in enumerate(case.factors):
                for k, block in enumerate(("zx", "zc", "zy")):
                    rows_all.append(
                        [block, factor.name, float(scores[m, i, k]),
                         i_lambda, j_run, float(result.lambdas[m])]
                    )
    else:
        # Per-member sklearn fits are independent -> process pool (spawn:
        # forking a live JAX process can deadlock). 66 members x 9 serial
        # MLPRegressor fits is the reference's real bottleneck.
        # sklearn needs host arrays: one bulk copy here.
        latents = {k: np.asarray(v) for k, v in latents.items()}
        jobs = [
            (
                {b: latents[f"{b}_train"][m] for b in ("zx", "zc", "zy")},
                {b: latents[f"{b}_test"][m] for b in ("zx", "zc", "zy")},
                latents["z_train"][m], latents["z_test"][m],
                case.factors, args.regressor,
            )
            for m in range(result.n_members)
        ]
        if args.probe_workers > 1 and result.n_members > 1:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(
                max_workers=args.probe_workers,
                mp_context=mp.get_context("spawn"),
            ) as pool:
                outcomes = list(pool.map(_sklearn_probe_member, jobs))
        else:
            outcomes = [_sklearn_probe_member(j) for j in jobs]
        for m, (rows, err) in enumerate(outcomes):
            i_lambda, j_run = divmod(m, args.n_runs)
            if err is not None:  # collect, don't abort (ref: :149-150)
                list_fail.append(
                    [i_lambda, j_run, m, float(result.lambdas[m]), err]
                )
                continue
            rows_all += [
                r + [i_lambda, j_run, float(result.lambdas[m])] for r in rows
            ]

    t0 = mark("probes", t0)

    # Per-member metric CSVs streamed during training via the chunk
    # callback above — this phase only joins the stragglers. The mesh path
    # runs as one sharded program (no chunk stream), so it writes here.
    if mesh is not None:
        for m in range(result.n_members):
            csv_futures.append(
                csv_pool.submit(
                    _write_member, m, result.member_logs(m)
                )
            )
    for f in csv_futures:
        f.result()
    csv_pool.shutdown()
    t0 = mark("member_csvs", t0)
    timings["member_csvs_hidden"] = round(sum(csv_hidden_t), 2)

    df = pd.DataFrame(rows_all, columns=df_columns)
    df["lambda"] = df["lambda"] * SCALE_LAMBDA
    df.to_csv(os.path.join(path_output, "disentanglement_score.csv"), index=False)
    if list_fail:
        print(f"{len(list_fail)} member probes failed: {list_fail}")

    # Symlog score-vs-λ figure (ref: :163-225)
    from matplotlib import pyplot as plt

    factors = [f.name for f in case.factors]
    labels = [f.label for f in case.factors]
    colors = ["tab:blue", "tab:green", "tab:orange"]
    fig, ax = plt.subplots(len(factors), 1, sharex="col")
    ax = np.atleast_1d(ax)
    for i, factor in enumerate(case.factors):
        df_i = df[df["gen_factor"] == factor.name]
        for color, block, label in zip(
            colors, ["zx", "zc", "zy"],
            [r"$z_\mathrm{x}$", r"$z_\mathrm{c}$", r"$z_\mathrm{y}$"],
        ):
            df_b = df_i[df_i["set"] == block]
            grp = df_b[["lambda", "score"]].groupby("lambda")
            mean, std = grp.mean(), grp.std()
            ax[i].fill_between(
                std.index.values,
                (mean["score"] - std["score"]).values,
                (mean["score"] + std["score"]).values,
                alpha=0.4, color=color,
            )
            ax[i].plot(mean.index.values, mean["score"].values, alpha=1.0,
                       label=label, color=color)
            ax[i].scatter(df_b["lambda"], df_b["score"], alpha=0.9, s=4.0,
                          color=color)
        ax[i].set_xscale("symlog", linthresh=1)
        ax[i].set_ylabel(labels[i], color=CMAP_VARS[factor.type])
    ax[-1].legend(bbox_transform=fig.transFigure, loc="lower center",
                  bbox_to_anchor=(0.5, 0.90), ncol=3)
    ax[-1].set_xlabel(r"$\lambda \cdot 10^4$")
    fig.tight_layout()
    fig.savefig(os.path.join(path_output, "disentanglement_score.png"))
    mark("figure", t0)
    timings["total"] = round(time.perf_counter() - t_start, 2)
    with open(os.path.join(path_output, "timings.json"), "w") as f:
        json.dump(timings, f, indent=2)
    print(f"[phase] total: {timings['total']:.1f}s", file=sys.stderr,
          flush=True)
    print(f"Wrote {path_output}/disentanglement_score.{{csv,png}} "
          f"and timings.json")


if __name__ == "__main__":
    # Multi-minute TPU studies self-heal the two known environment fault
    # classes (transient tunnel drop -> wait + retry; stale libtpu compile
    # cache -> clear + retry); with chunk checkpoints the retry resumes
    # from completed work. Deterministic failures propagate immediately.
    from dpivae_tpu.utils.cache_guard import run_with_healing

    run_with_healing(main, wait_device=True)
