"""Metric logging: on-device log arrays -> host CSV files.

The reference logs 21 scalar series through torchrl's CSVLogger and reads
them back from its in-memory store for plotting (SURVEY.md §5). Here metrics
accumulate *on device* inside the fused training scan (train.TrainLogs); this
module persists them with the same column names, one CSV per series plus
combined train/val tables, so the reference's observability contract
survives without a per-iteration host round-trip.
"""

from __future__ import annotations

import os

import numpy as np

from dpivae_tpu.train.train import TRAIN_COLUMNS, VAL_COLUMNS, TrainLogs


def _write_csv(path: str, columns, arrays) -> None:
    """Fastest available C-level csv writer. Study IO is formatting-bound
    (66 members × 23 files × up to 20k rows ≈ 50M float→str conversions);
    measured per member on this host: pyarrow 51ms, pandas 290ms,
    np.savetxt ~600ms. Both emit shortest-roundtrip reprs, so the files
    parse to identical doubles (bytes differ only on integral floats:
    pyarrow ``0`` vs pandas ``0.0``) — pyarrow also quotes headers, hence
    the manual header line. pandas stays as the fallback (pyarrow is
    present in this image but not a declared dependency)."""
    try:
        import pyarrow as pa
        import pyarrow.csv as pacsv
    except ImportError:
        import pandas as pd

        pd.DataFrame(dict(zip(columns, arrays))).to_csv(path, index=False)
        return
    table = pa.table(dict(zip(columns, arrays)))
    with pa.OSFile(path, "wb") as f:
        f.write((",".join(columns) + "\n").encode())
        pacsv.write_csv(table, f, pacsv.WriteOptions(include_header=False))


def save_logs_csv(logs: TrainLogs, path_metrics: str) -> None:
    """Write per-series CSVs (``<name>.csv`` with iter,value rows) and
    combined ``train.csv``/``val.csv`` tables under ``path_metrics``."""
    os.makedirs(path_metrics, exist_ok=True)

    train = np.asarray(logs.train)
    val = np.asarray(logs.val)
    t_mask = np.asarray(logs.train_active)
    v_mask = np.asarray(logs.val_active)
    t_iters = np.arange(train.shape[0])[t_mask]
    v_iters = np.asarray(logs.val_iters)[v_mask]

    _write_csv(
        os.path.join(path_metrics, "train.csv"),
        ["iter", *TRAIN_COLUMNS],
        [t_iters, *train[t_mask].T],
    )
    _write_csv(
        os.path.join(path_metrics, "val.csv"),
        ["iter", *VAL_COLUMNS],
        [v_iters, *val[v_mask].T],
    )

    for name in TRAIN_COLUMNS + VAL_COLUMNS:
        iters, vals = logs.scalars(name)
        _write_csv(
            os.path.join(path_metrics, f"{name}.csv"),
            ["iter", "value"],
            [iters, vals],
        )


def get_logger_training_curve(logs: TrainLogs, label: str):
    """(iters, values) for a named series — API-parity alias for the
    reference's logger read-back (ref: utils/loss.py:1-4)."""
    return logs.scalars(label)


def load_series_csv(path_metrics: str, name: str):
    """(iters, values) from a saved series CSV."""
    data = np.loadtxt(
        os.path.join(path_metrics, f"{name}.csv"), delimiter=",", skiprows=1,
        ndmin=2,
    )
    return data[:, 0].astype(int), data[:, 1]
