"""Serving-artifact benchmark: exported StableHLO predictor vs live model.

Measures per-request latency (p50/p95 over repeated calls) and throughput
of a ``dpivae_tpu.serving`` artifact across batch sizes, against the live
``jax.jit`` predict path as the reference point — the exported program
should match it (same XLA computation; the artifact only fixes the ABI).

Runs on whatever backend is attached (CPU or the TPU tunnel). Prints one
JSON line per (path, batch) row, then a summary line.

    python benchmarks/serving_bench.py [--batches 1 16 256] [--calls 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[1, 16, 256])
    parser.add_argument("--calls", type=int, default=30)
    parser.add_argument("--n_mc", type=int, default=64)
    parser.add_argument("--case", default="simple_beam")
    args = parser.parse_args()

    from dpivae_tpu.utils.cache_guard import wait_for_device

    if not wait_for_device():
        print("device wait budget exhausted; aborting", file=sys.stderr)
        return 1

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.serving import build_predict_fn, save_predictor, load_predictor
    from dpivae_tpu.train import setup_model
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    backend = jax.devices()[0].platform
    case = get_case(args.case)
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_mc_test=args.n_mc, n_train=256, n_batch=64, use_seed=True,
        name="serving_bench",
    )
    with on_host_cpu():
        data_train = sample_response(
            case, jax.random.PRNGKey(0), 256, sample_dist=case.gt_dist()
        )
        data_train = jax.tree.map(np.asarray, data_train)
    model = setup_model(cfg, case, data_train)
    params = model.init(jax.random.PRNGKey(1))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        path = save_predictor(
            f"{td}/p.shlo", model, params, cfg, case, n=args.n_mc,
        )
        export_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        served = load_predictor(path)
        load_s = time.perf_counter() - t0
        print(json.dumps({"row": "artifact", "backend": backend,
                          "export_s": round(export_s, 3),
                          "load_s": round(load_s, 3),
                          "bytes": os.path.getsize(path)}),
              flush=True)

        live = jax.jit(build_predict_fn(model, params, cfg, n=args.n_mc))
        key_data = np.asarray(
            jax.random.key_data(jax.random.PRNGKey(7)), np.uint32
        )

        rows = []
        for b in args.batches:
            x = np.zeros((b, case.nd_x), np.float32)
            c = np.zeros((b, case.nd_c), np.float32)
            for name, call in (
                ("served", lambda: served(x, c, seed=7)["y"]),
                ("live_jit", lambda: np.asarray(live(key_data, x, c)[0])),
            ):
                t0 = time.perf_counter()
                call()  # compile
                compile_s = time.perf_counter() - t0
                lat = []
                for _ in range(args.calls):
                    t0 = time.perf_counter()
                    call()  # includes host->device->host transfer (sync)
                    lat.append(time.perf_counter() - t0)
                lat_ms = np.asarray(lat) * 1e3
                row = {
                    "row": name, "backend": backend, "batch": b,
                    "first_call_s": round(compile_s, 3),
                    "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
                    "p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
                    "req_per_s": round(
                        b / float(np.percentile(lat_ms, 50)) * 1e3, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

        served_50 = {r["batch"]: r["p50_ms"] for r in rows
                     if r["row"] == "served"}
        live_50 = {r["batch"]: r["p50_ms"] for r in rows
                   if r["row"] == "live_jit"}
        overhead = {
            str(b): round(served_50[b] / max(live_50[b], 1e-9), 3)
            for b in served_50
        }
        print(json.dumps({"row": "summary", "backend": backend,
                          "served_over_live_p50": overhead}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
