"""Batched device-side disentanglement probes vs sklearn references.

The batched paths must reproduce sklearn's probe scores (exactly for the
closed-form linear probe, closely for the SGD-trained MLP probe) — they
replace 594 serial host fits in the full-scale studies.
"""

import jax
import numpy as np
import pytest

from dpivae_tpu.eval.probes import (
    batched_probe_scores,
    fit_linear_probes_batched,
    fit_mlp_probes_batched,
    pack_probe_batch,
)


def _toy_probes(seed=0, P=6, N=256, D=4, noise=0.3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(P, N, D)).astype(np.float32)
    # Nonlinear targets with per-probe random weights
    w = rng.normal(size=(P, D)).astype(np.float32)
    y = np.tanh(np.einsum("pnd,pd->pn", X, w)) + 0.5 * X[..., 0] ** 2
    y = (y + noise * rng.normal(size=y.shape)).astype(np.float32)
    n_tr = N // 2
    return (X[:, :n_tr], y[:, :n_tr], X[:, n_tr:], y[:, n_tr:])


def test_linear_probes_match_sklearn():
    from sklearn.linear_model import LinearRegression

    Xtr, ytr, Xte, yte = _toy_probes()
    # Zero-pad a trailing feature column: pinv must assign it zero weight
    pad = ((0, 0), (0, 0), (0, 2))
    Xtr_p, Xte_p = np.pad(Xtr, pad), np.pad(Xte, pad)
    r2 = np.asarray(fit_linear_probes_batched(Xtr_p, ytr, Xte_p, yte))
    for p in range(Xtr.shape[0]):
        ref = LinearRegression().fit(Xtr[p], ytr[p]).score(Xte[p], yte[p])
        np.testing.assert_allclose(r2[p], ref, rtol=0, atol=1e-4)


def test_mlp_probes_close_to_sklearn():
    from sklearn.neural_network import MLPRegressor

    Xtr, ytr, Xte, yte = _toy_probes(P=3)
    r2 = np.asarray(
        fit_mlp_probes_batched(
            Xtr, ytr, Xte, yte, hidden=(32, 32), n_epochs=400,
            key=jax.random.PRNGKey(0),
        )
    )
    for p in range(Xtr.shape[0]):
        ref = (
            MLPRegressor(hidden_layer_sizes=(32, 32), max_iter=2000,
                         random_state=0)
            .fit(Xtr[p], ytr[p])
            .score(Xte[p], yte[p])
        )
        # Same probe quality up to SGD noise
        assert abs(r2[p] - ref) < 0.08, (p, r2[p], ref)
        assert r2[p] > 0.5


def test_batched_probe_scores_layout():
    # (M, N, d_block) latents with different block widths; linear_jax
    # scores must match per-member linear sklearn probes in the reference
    # row order (m, factor, block).
    from dpivae_tpu.eval import fit_disentanglement_probes

    rng = np.random.default_rng(1)
    M, N, F = 3, 128, 2
    latents_tr = {
        "zx": rng.normal(size=(M, N, 2)).astype(np.float32),
        "zc": rng.normal(size=(M, N, 3)).astype(np.float32),
        "zy": rng.normal(size=(M, N, 1)).astype(np.float32),
    }
    latents_te = {k: rng.normal(size=v.shape).astype(np.float32)
                  for k, v in latents_tr.items()}
    z_tr = rng.normal(size=(M, N, F)).astype(np.float32)
    z_te = rng.normal(size=(M, N, F)).astype(np.float32)
    # Make factor 0 depend on zx so scores are meaningful
    z_tr[..., 0] = latents_tr["zx"][..., 0] + latents_tr["zx"][..., 1]
    z_te[..., 0] = latents_te["zx"][..., 0] + latents_te["zx"][..., 1]

    scores = batched_probe_scores(
        latents_tr, latents_te, z_tr, z_te, n_factors=F,
        regressor="linear_jax",
    )
    assert scores.shape == (M, F, 3)
    assert np.all(scores[:, 0, 0] > 0.99)  # zx explains factor 0 exactly

    class _Factor:
        def __init__(self, name):
            self.name = name

    for m in range(M):
        rows = fit_disentanglement_probes(
            {b: latents_tr[b][m] for b in latents_tr},
            {b: latents_te[b][m] for b in latents_te},
            z_tr[m], z_te[m],
            [_Factor("f0"), _Factor("f1")], regressor="linear",
        )
        flat = scores[m].reshape(-1)
        for r, s in zip(rows, flat):
            np.testing.assert_allclose(r[2], s, rtol=0, atol=1e-3)


def test_pack_probe_batch_matches_host_reference():
    """The jitted device pack must reproduce the straightforward host
    pack: m-major, then factor, then block (zx, zc, zy), blocks
    zero-padded to the widest latent width (ref row order:
    dpivae.py:678-699)."""
    rng = np.random.default_rng(7)
    M, N, F = 2, 16, 3
    dims = {"zx": 2, "zc": 4, "zy": 1}
    lat_tr = {b: rng.normal(size=(M, N, d)).astype(np.float32)
              for b, d in dims.items()}
    lat_te = {b: rng.normal(size=(M, N, d)).astype(np.float32)
              for b, d in dims.items()}
    z_tr = rng.normal(size=(M, N, F)).astype(np.float32)
    z_te = rng.normal(size=(M, N, F)).astype(np.float32)

    x_tr, y_tr, x_te, y_te = pack_probe_batch(lat_tr, lat_te, z_tr, z_te, F)

    d_max = max(dims.values())

    def ref_pack(latents, z):
        xs, ys = [], []
        for m in range(M):
            for i in range(F):
                for b in ("zx", "zc", "zy"):
                    x = np.zeros((N, d_max), np.float32)
                    x[:, : dims[b]] = latents[b][m]
                    xs.append(x)
                    ys.append(z[m][:, i])
        return np.stack(xs), np.stack(ys)

    for got, (latents, z) in zip(
        ((x_tr, y_tr), (x_te, y_te)), ((lat_tr, z_tr), (lat_te, z_te))
    ):
        x_ref, y_ref = ref_pack(latents, z)
        np.testing.assert_array_equal(np.asarray(got[0]), x_ref)
        np.testing.assert_array_equal(np.asarray(got[1]), y_ref)


def test_batched_probe_scores_device_inputs():
    """Device-resident latents (the study's real input) score identically
    to host arrays — nothing in the path forces a host copy."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    M, N, F = 2, 64, 2
    lat = {b: rng.normal(size=(M, N, d)).astype(np.float32)
           for b, d in (("zx", 2), ("zc", 3), ("zy", 1))}
    z = rng.normal(size=(M, N, F)).astype(np.float32)
    host = batched_probe_scores(lat, lat, z, z, n_factors=F,
                                regressor="linear_jax")
    dev = batched_probe_scores(
        {k: jnp.asarray(v) for k, v in lat.items()},
        {k: jnp.asarray(v) for k, v in lat.items()},
        jnp.asarray(z), jnp.asarray(z), n_factors=F,
        regressor="linear_jax",
    )
    np.testing.assert_array_equal(host, dev)


def test_warm_batched_probes_smoke():
    from dpivae_tpu.eval.probes import warm_batched_probes

    # Must not raise for either backend; mlp is compile-only.
    warm_batched_probes((2, 3, 1), 2, 2, 32, 16, regressor="linear_jax")
    warm_batched_probes((2, 3, 1), 2, 2, 32, 16, regressor="mlp_jax",
                        n_epochs=2)
    with pytest.raises(ValueError, match="Unknown batched regressor"):
        warm_batched_probes((2, 3, 1), 2, 2, 32, 16, regressor="gpr_jax")


def test_unknown_batched_regressor():
    Xtr, ytr, Xte, yte = _toy_probes(P=2, N=32)
    latents = {"zx": Xtr, "zc": Xtr, "zy": Xtr}
    with pytest.raises(ValueError, match="Unknown batched regressor"):
        batched_probe_scores(latents, latents,
                             np.zeros((2, 16, 1)), np.zeros((2, 16, 1)),
                             n_factors=1, regressor="gpr_jax")
