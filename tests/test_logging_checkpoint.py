"""CSV logging round-trip and orbax checkpoint save/restore."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train import setup_model, train_model
from dpivae_tpu.train.checkpoint import (
    load_checkpoint,
    load_checkpoint_config,
    load_model,
    save_checkpoint,
    save_model,
)
from dpivae_tpu.utils.data import sample_response
from dpivae_tpu.utils.logging import load_series_csv, save_logs_csv


def _train_tiny():
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=64, n_val=32, n_batch=16, n_iter=20, val_freq=10,
        n_mc_train=2, n_mc_val=2, use_seed=True,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtr = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    dva = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, dtr)
    params, logs = train_model(cfg, model, case, dtr, dva, key=jax.random.PRNGKey(1))
    return case, cfg, model, params, logs


def test_csv_writer_backends_value_identical(tmp_path, monkeypatch):
    """The pyarrow fast path and the pandas fallback must emit files that
    parse to identical headers and values — consumers (and committed study
    artifacts) must not depend on which writer the image happens to provide.
    Bytes may differ on integral floats (pyarrow writes ``0``, pandas
    ``0.0``); both are shortest-roundtrip so parsed doubles match exactly."""
    import builtins
    import os

    case, cfg, model, params, logs = _train_tiny()
    save_logs_csv(logs, str(tmp_path / "fast"))

    real_import = builtins.__import__

    def no_pyarrow(name, *a, **k):
        if name.startswith("pyarrow"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pyarrow)
    save_logs_csv(logs, str(tmp_path / "fallback"))
    monkeypatch.undo()

    names = sorted(os.listdir(tmp_path / "fast"))
    assert names == sorted(os.listdir(tmp_path / "fallback")) and names
    for name in names:
        fast_lines = (tmp_path / "fast" / name).read_text().splitlines()
        slow_lines = (tmp_path / "fallback" / name).read_text().splitlines()
        assert fast_lines[0] == slow_lines[0], f"{name} headers differ"
        fast_vals = np.loadtxt(
            tmp_path / "fast" / name, delimiter=",", skiprows=1, ndmin=2
        )
        slow_vals = np.loadtxt(
            tmp_path / "fallback" / name, delimiter=",", skiprows=1, ndmin=2
        )
        np.testing.assert_array_equal(
            fast_vals, slow_vals, err_msg=f"{name} values differ"
        )


def test_csv_roundtrip(tmp_path):
    case, cfg, model, params, logs = _train_tiny()
    save_logs_csv(logs, str(tmp_path))
    iters, vals = load_series_csv(str(tmp_path), "ELBO")
    np.testing.assert_array_equal(iters, np.arange(20))
    np.testing.assert_allclose(vals, np.asarray(logs.train[:, 0]), rtol=1e-6)
    v_iters, v_vals = load_series_csv(str(tmp_path), "ELBO_val")
    np.testing.assert_array_equal(v_iters, [0, 10])
    # combined tables exist
    assert (tmp_path / "train.csv").exists()
    assert (tmp_path / "val.csv").exists()


def test_checkpoint_roundtrip(tmp_path):
    case, cfg, model, params, _ = _train_tiny()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, config=cfg)
    restored = load_checkpoint(path, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    cfg2 = load_checkpoint_config(path)
    assert cfg2 == cfg


def test_save_load_model_servable(tmp_path):
    """save_model/load_model rebuilds a ready-to-sample (model, params) in
    a fresh object graph: same fitted scalers, identical sample outputs —
    no training data needed at restore time."""
    case, cfg, model, params, _ = _train_tiny()
    path = str(tmp_path / "model")
    save_model(path, model, params, cfg, case=case)

    model2, params2 = load_model(path, case)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for name in ("transform_x", "transform_c", "transform_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(model, name).mean),
            np.asarray(getattr(model2, name).mean),
        )
        np.testing.assert_allclose(
            np.asarray(getattr(model, name).scale),
            np.asarray(getattr(model2, name).scale),
        )

    key = jax.random.PRNGKey(7)
    k1, _ = jax.random.split(key)
    dte = sample_response(case, k1, 8, sample_dist=case.gt_dist())
    out_a = model.sample(params, key, dte[0], dte[1], n=3)
    out_b = model2.sample(params2, key, dte[0], dte[1], n=3)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # Explicit config wins over the sidecar; sidecar parses back to cfg
    assert load_checkpoint_config(path) == cfg


def test_load_model_warns_on_case_fingerprint_mismatch(tmp_path):
    import dataclasses

    import pytest

    case, cfg, model, params, _ = _train_tiny()
    path = str(tmp_path / "model")
    save_model(path, model, params, cfg, case=case)

    changed = dataclasses.replace(case, sigma_x=float(case.sigma_x) * 2.0)
    with pytest.warns(UserWarning, match="fingerprint"):
        load_model(path, changed)
