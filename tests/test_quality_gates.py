"""Quality-regression gates: study-scale STRUCTURE, not just parity.

The suite pins loss/gradient parity at init (test_torch_parity*.py) and
short-run convergence smoke (test_train.py), but those cannot catch a
regression that keeps the math well-formed while destroying the paper's
*results* — e.g. a GRL sign flip under some config path, or a silently
dropped loss term. The committed benchmark artifacts hold the expected
structure; these slow gates re-train reduced versions and assert it:

1. **λ-sweep disentanglement structure** (ref 1_disentanglement_metric.py
   :163-225; committed benchmarks/results/disentanglement_score_
   oscillator.csv): the damage factor ζ reads out of z_y with high R² at
   moderate λ and COLLAPSES out of z_y at extreme λ (the adversarial
   mechanism working). A GRL sign flip makes extreme +λ behave like -λ,
   where the committed data shows z_y *keeps* ζ (R² 0.94) — the collapse
   assertion fails. Dropping the y-reconstruction term kills ζ→z_y at
   moderate λ — the readout assertion fails.
2. **Transfer ranking** (ref 2_regression_comparison.py:228-296; committed
   benchmarks/results/transfer_extrapolation_metrics.csv): DPIVAE-B beats
   the sklearn MLP baseline on a held-out quadrant domain (committed fold
   2: B 0.73 vs MLP 0.38 R² at 20k iters).

Thresholds leave the probe_certify near-tie tolerance (|ΔR²| <= 0.12, see
benchmarks/experiments/probe_certify.py) between the asserted structure
and the committed means, so seed-level noise cannot flip the gate while a
structural regression still trips it. Calibrated at the reduced scale
below on CPU (values in the asserts' comments); run with
``pytest -m slow tests/test_quality_gates.py``.
"""

import jax
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig

# The certified near-tie tolerance of the batched-vs-sklearn probe
# comparison (benchmarks/experiments/probe_certify.py operating point).
NEAR_TIE = 0.12

# Reduced λ-sweep scale: structure is already formed here (calibration run
# committed in the asserts' comments); full scale is 11 λ x 6 seeds x 20k.
LAMBDA_MODERATE = 100.0 / 1e4   # committed: ζ→z_y R² ≈ 0.92
LAMBDA_EXTREME = 10000.0 / 1e4  # committed: z_y loses ζ (z_x wins at 0.47)
N_SEEDS = 2
N_ITER = 2000
N_REGRESSOR = 1024


@pytest.mark.slow
def test_lambda_sweep_disentanglement_structure():
    """ζ reads out of z_y at moderate λ; extreme λ collapses that readout.

    Guards the GRL sign and the y-branch loss terms at study scale
    (committed pattern: benchmarks/results/disentanglement_score_
    oscillator.csv — ζ→z_y 0.89-0.92 for λ·1e4 in [-100, 100]; at +1e4
    the z_y readout collapses and z_x wins weakly at 0.47)."""
    from dpivae_tpu.eval import batched_probe_scores
    from dpivae_tpu.sweep import sweep_disentanglement_latents, train_sweep

    case = get_case("damped_oscillator")
    cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, n_iter=N_ITER)
    )
    lambdas = np.asarray([LAMBDA_MODERATE, LAMBDA_EXTREME], np.float32)

    result = train_sweep(
        cfg, case, lambdas=lambdas, n_runs=N_SEEDS,
        key=jax.random.PRNGKey(0),
    )
    latents = sweep_disentanglement_latents(
        cfg, case, result, N_REGRESSOR, N_REGRESSOR,
        key=jax.random.PRNGKey(1),
    )
    scores = np.asarray(batched_probe_scores(
        {b: latents[f"{b}_train"] for b in ("zx", "zc", "zy")},
        {b: latents[f"{b}_test"] for b in ("zx", "zc", "zy")},
        latents["z_train"], latents["z_test"],
        n_factors=len(case.factors), regressor="linear_jax",
        key=jax.random.PRNGKey(2),
    ))  # (n_members, n_factors, 3 blocks: zx, zc, zy)
    assert np.all(np.isfinite(scores)), "diverged sweep members"

    i_zeta = [f.name for f in case.factors].index("zeta")
    # members are ordered λ-major (member = i_lambda * n_runs + j_run)
    zeta_mod = scores[0 * N_SEEDS:(0 + 1) * N_SEEDS, i_zeta, :].mean(axis=0)
    zeta_ext = scores[1 * N_SEEDS:(1 + 1) * N_SEEDS, i_zeta, :].mean(axis=0)
    zx_mod, zc_mod, zy_mod = zeta_mod
    zy_ext = zeta_ext[2]

    # 1) Readout: at moderate λ the damage factor lives in z_y, strongly
    #    and exclusively (calibrated: zy 0.93 vs zx 0.39 / zc 0.02 at this
    #    reduced scale; committed full-scale 0.92 vs 0.49 / -0.00).
    assert zy_mod > 0.5, f"ζ→z_y readout lost at moderate λ: R²={zy_mod:.3f}"
    assert zy_mod > zx_mod + NEAR_TIE and zy_mod > zc_mod + NEAR_TIE, (
        f"z_y no longer wins ζ at moderate λ: zy={zy_mod:.3f} "
        f"zx={zx_mod:.3f} zc={zc_mod:.3f}"
    )
    # 2) Collapse: extreme λ pushes ζ OUT of z_y (adversarial mechanism;
    #    a GRL sign flip keeps zy_ext ≈ 0.94 — committed λ=-1e4 row —
    #    and fails here). Calibrated: zy_ext 0.06 at this reduced scale.
    assert zy_ext < zy_mod - NEAR_TIE, (
        f"no z_y collapse at extreme λ (GRL sign/strength regression?): "
        f"moderate R²={zy_mod:.3f}, extreme R²={zy_ext:.3f}"
    )


@pytest.mark.slow
def test_transfer_ranking_dpivae_b_beats_mlp():
    """DPIVAE-B beats the sklearn MLP baseline on a held-out quadrant.

    One fold of the bridge transfer study (extrapolation, domain 2 — the
    committed fold where the gap is widest: B 0.73 vs MLP 0.38 at 20k
    iters, benchmarks/results/transfer_extrapolation_metrics.csv)."""
    from sklearn.neural_network import MLPRegressor

    from dpivae_tpu.eval import evaluate_model
    from dpivae_tpu.train import setup_model, train_model
    from dpivae_tpu.utils.data import sample_response
    from dpivae_tpu.utils.metrics import regression_metrics
    from dpivae_tpu.utils.priors import make_square_dist
    from dpivae_tpu.utils.transforms import StandardScaler

    case = get_case("bridge")
    cfg = (
        TrainConfig()
        .with_preset(case.presets["DPIVAE-B"])
        .replace(use_seed=True, n_iter=N_ITER)
    )
    # extrapolation direction: train on one quadrant, test on the
    # 3-quadrant mixture (scripts/2_regression_comparison.py:83-85)
    dists_test, dists_train = make_square_dist(case)
    i_dom = 1
    k = jax.random.fold_in(jax.random.PRNGKey(123), i_dom)
    k_tr, k_va, k_te = jax.random.split(k, 3)
    dtr = sample_response(case, k_tr, cfg.n_train, sample_dist=dists_train[i_dom])
    dva = sample_response(case, k_va, cfg.n_val, sample_dist=dists_train[i_dom])
    dte = sample_response(case, k_te, cfg.n_test, sample_dist=dists_test[i_dom])
    dtr, dva, dte = jax.tree.map(np.asarray, (dtr, dva, dte))

    model = setup_model(cfg, case, dtr)
    params, _ = train_model(cfg, model, case, dtr, dva,
                            key=jax.random.PRNGKey(7))
    metrics, _ = evaluate_model(cfg, case, model, params, dte)
    r2_b = float(np.mean(metrics[cfg.name]["R2"]))

    # The MLP baseline exactly as run_comparison specs it (eval/
    # evaluate.py:run_comparison — standardized [x‖c] features,
    # MLP(64,64), max_iter=10000); fit directly to skip the unrelated
    # LIN/GPR fits in this gate.
    import jax.numpy as jnp

    sc_x = StandardScaler.fit(jnp.asarray(dtr[0]))
    sc_c = StandardScaler.fit(jnp.asarray(dtr[1]))

    def features(x, c):
        return np.concatenate(
            (np.asarray(sc_x.forward(jnp.asarray(x))[0]),
             np.asarray(sc_c.forward(jnp.asarray(c))[0])), axis=-1)

    rgr = MLPRegressor(hidden_layer_sizes=(64, 64), max_iter=10000,
                       random_state=0)
    rgr.fit(features(dtr[0], dtr[1]), np.asarray(dtr[2]))
    pred = np.asarray(rgr.predict(features(dte[0], dte[1])))
    if pred.ndim == 1:
        pred = pred[:, None]
    r2_mlp = float(np.mean(regression_metrics(np.asarray(dte[2]), pred)["R2"]))

    # Calibrated at this reduced scale: B 0.70 vs MLP 0.37 (committed
    # full-scale fold: 0.73 vs 0.38) — the NEAR_TIE margin keeps seed
    # noise from flipping the gate.
    assert r2_b > r2_mlp + NEAR_TIE, (
        f"DPIVAE-B no longer beats the MLP baseline on the transfer fold: "
        f"B R²={r2_b:.3f} vs MLP R²={r2_mlp:.3f}"
    )
