"""CLI entry-point smoke tests (subprocess, CPU backend, tiny sizes)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Neutralize the axon sitecustomize (registers the TPU plugin)
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=420,
    )


@pytest.mark.slow
def test_single_run_cli(tmp_path):
    res = _run(
        [os.path.join(REPO, "scripts", "0_single_run.py"),
         "--case", "simple_beam", "--preset", "dpivae",
         "--n_iter", "40", "--n_train", "64", "--n_val", "32",
         "--n_test", "32", "--name", "t0", "--no-plots",
         "--export_serving", "--output", str(tmp_path)],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "final train ELBO" in res.stdout
    # Output layout contract (ref: 0_single_run.py:47-64)
    for sub in ("metrics", "settings", "models"):
        assert (tmp_path / "t0" / sub).exists()
    # Servable checkpoint: orbax tree + config sidecar + case meta
    model_ckpt = tmp_path / "t0" / "models" / "model"
    assert model_ckpt.is_dir()
    assert (tmp_path / "t0" / "models" / "model.config.json").exists()
    assert (tmp_path / "t0" / "models" / "model.meta.json").exists()
    # Serving artifact (StableHLO + meta sidecar), loadable without model code
    shlo = tmp_path / "t0" / "models" / "predictor.shlo"
    assert shlo.exists() and shlo.stat().st_size > 0
    with open(str(shlo) + ".meta.json") as f:
        assert json.load(f)["outputs"] == ["y"]
    with open(tmp_path / "t0" / "settings" / "args.json") as f:
        snap = json.load(f)
    assert snap["model_type"] == "S" and snap["n_iter"] == 40
    elbo = np.loadtxt(tmp_path / "t0" / "metrics" / "ELBO.csv",
                      delimiter=",", skiprows=1)
    assert elbo.shape == (40, 2)


@pytest.mark.slow
def test_custom_case_example(tmp_path):
    """The extensibility example (new case from scratch) runs end-to-end."""
    res = _run(
        [os.path.join(REPO, "examples", "custom_case.py"), "--n_iter", "40"],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "damage-label test R2" in res.stdout


@pytest.mark.slow
def test_disentanglement_cli_batched_probes(tmp_path):
    """Script 1 with the batched mlp_jax probe backend (one device program
    for all member×factor×block probes) produces the same CSV layout as
    the sklearn path."""
    res = _run(
        [os.path.join(REPO, "scripts", "1_disentanglement_metric.py"),
         "--case", "damped_oscillator", "--n_runs", "1",
         "--n_iter", "30", "--lambdas", "0.0", "1.0",
         "--regressor", "mlp_jax", "--probe_epochs", "30",
         "--n_train_regressor", "256", "--n_test_regressor", "256",
         "--latents_chunk", "2", "--output", str(tmp_path)],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    csv = tmp_path / "disentanglement" / "disentanglement_score.csv"
    rows = np.genfromtxt(csv, delimiter=",", names=True, dtype=None,
                         encoding="utf-8")
    # 2 members x 4 oscillator factors x 3 latent blocks
    assert rows.shape == (24,)
    assert np.all(np.isfinite(rows["score"]))
    assert (tmp_path / "disentanglement" / "disentanglement_score.png").exists()


@pytest.mark.slow
def test_regression_comparison_cli_jax_baselines(tmp_path):
    """Script 2 (transfer study) with the batched device baselines: the
    full pipeline — quadrant folds, two batched preset sweeps, batched
    prediction, LIN/GPR/MLP via eval/baselines.py — at tiny scale."""
    res = _run(
        [os.path.join(REPO, "scripts", "2_regression_comparison.py"),
         "--case", "bridge", "--n_runs", "1", "--n_iter", "30",
         "--n_train", "64", "--n_val", "32", "--n_test", "32",
         "--baselines", "jax", "--name", "t2",
         "--output", str(tmp_path)],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import pandas as pd

    df = pd.read_csv(tmp_path / "t2" / "metrics" / "raw_metrics.csv")
    # 1 run x 4 domains x 5 models (DPIVAE-A/B + LIN/GPR/MLP)
    assert sorted(df["Model"].unique()) == [
        "DPIVAE-A", "DPIVAE-B", "GPR", "LIN", "MLP"]
    assert df.shape[0] == 20
    assert np.isfinite(df["R2"]).all()
    assert (tmp_path / "t2" / "metrics" / "table.tex").exists()
    assert (tmp_path / "t2" / "timings.json").exists()


@pytest.mark.slow
def test_single_run_cli_bad_preset(tmp_path):
    res = _run(
        [os.path.join(REPO, "scripts", "0_single_run.py"),
         "--case", "simple_beam", "--preset", "nope"],
        cwd=str(tmp_path),
    )
    assert res.returncode != 0
    assert "unknown preset" in res.stderr


@pytest.mark.slow
def test_multichip_sweep_example(tmp_path):
    """The virtual-mesh example (sweep sharding + dp) runs end-to-end."""
    res = _run(
        [os.path.join(REPO, "examples", "multichip_sweep.py"),
         "--n_devices", "4", "--n_iter", "60"],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "multichip_sweep OK" in res.stdout


@pytest.mark.slow
def test_hyper_search_example(tmp_path):
    """The hyperparameter-search example (traced lr/wd grid) runs."""
    res = _run(
        [os.path.join(REPO, "examples", "hyper_search.py"),
         "--n_iter", "40"],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "hyper_search OK" in res.stdout
