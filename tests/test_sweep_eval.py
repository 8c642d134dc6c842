"""Batched sweep-evaluation paths: latent extraction and ŷ prediction."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.sweep import (
    sweep_disentanglement_latents,
    sweep_predict_y,
    train_sweep,
    train_sweep_data,
)
from dpivae_tpu.utils.data import sample_response


def _cfg(case, **over):
    defaults = dict(
        n_train=64, n_val=32, n_batch=16, n_iter=20, val_freq=10,
        n_mc_train=2, n_mc_val=2, n_mc_test=4, use_seed=True,
    )
    defaults.update(over)
    return TrainConfig().with_preset(case.presets["dpivae"]).replace(**defaults)


def test_sweep_disentanglement_latents_shapes_and_chunking():
    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1)
    lat = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=48, n_test_reg=40, chunk_size=2
    )  # 3 members, chunk 2 -> pads to 4, trims back
    assert lat["zx_train"].shape == (3, 48, case.nz_x)
    assert lat["zc_test"].shape == (3, 40, cfg.nz_c)
    assert lat["z_train"].shape == (3, 48, len(case.factors))
    for v in lat.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # chunked == unchunked
    lat_full = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=48, n_test_reg=40, chunk_size=3
    )
    np.testing.assert_allclose(
        np.asarray(lat["zx_train"]), np.asarray(lat_full["zx_train"]),
        rtol=1e-5, atol=1e-6,
    )


def test_sweep_eval_on_mesh_matches_unsharded():
    """Mesh-sharded sweep-eval must equal the unsharded result."""
    from dpivae_tpu.parallel import make_mesh

    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_sweep(cfg, case, lambdas=[1 / 256, 0.0], n_runs=2)  # 4 members
    lat_a = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=32, n_test_reg=24, chunk_size=4
    )
    mesh = make_mesh(4, axes=("sweep",))
    lat_b = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=32, n_test_reg=24, chunk_size=4, mesh=mesh
    )
    for k in lat_a:
        np.testing.assert_allclose(
            np.asarray(lat_a[k]), np.asarray(lat_b[k]), rtol=2e-4, atol=1e-5
        )


def test_train_sweep_data_on_mesh():
    from dpivae_tpu.parallel import make_mesh

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    n_members = 4
    key = jax.random.PRNGKey(5)
    dtr, dva = [], []
    for m in range(n_members):
        k1, k2 = jax.random.split(jax.random.fold_in(key, m))
        dtr.append(sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva.append(sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist()))
    stack = lambda ds, i: np.stack([np.asarray(d[i]) for d in ds])
    data_train = tuple(stack(dtr, i) for i in range(3))
    data_val = tuple(stack(dva, i) for i in range(3))
    lambdas = np.full(n_members, cfg.lambda_g0, np.float32)

    res_plain = train_sweep_data(cfg, case, lambdas, data_train, data_val, key=key)
    mesh = make_mesh(4, axes=("sweep",))
    res_mesh = train_sweep_data(cfg, case, lambdas, data_train, data_val,
                                key=key, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_plain.logs.train), np.asarray(res_mesh.logs.train),
        rtol=2e-3, atol=1e-4,
    )


def test_sweep_predict_y_matches_member_eval():
    case = get_case("simple_beam")
    cfg = _cfg(case)
    n_members = 2
    key = jax.random.PRNGKey(0)
    dtr, dva, dte = [], [], []
    for m in range(n_members):
        k = jax.random.fold_in(key, m)
        k1, k2, k3 = jax.random.split(k, 3)
        dtr.append(sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva.append(sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist()))
        dte.append(sample_response(case, k3, 16, sample_dist=case.gt_dist()))
    stack = lambda ds, i: np.stack([np.asarray(d[i]) for d in ds])
    data_train = tuple(stack(dtr, i) for i in range(3))
    data_val = tuple(stack(dva, i) for i in range(3))

    res = train_sweep_data(
        cfg, case, lambdas=np.full(n_members, cfg.lambda_g0, np.float32),
        data_train=data_train, data_val=data_val,
    )
    y_pred = sweep_predict_y(
        cfg, case, res, data_train,
        stack(dte, 0), stack(dte, 1), n=cfg.n_mc_test,
    )
    assert y_pred.shape == (n_members, 16, case.nd_y)
    assert np.all(np.isfinite(np.asarray(y_pred)))
    # Predictions should correlate with truth even after 20 iters? Not
    # necessarily — just require members differ (independent params/data)
    assert not np.allclose(np.asarray(y_pred[0]), np.asarray(y_pred[1]))


def test_sweep_sample_mesh_matches_unsharded():
    """sweep_sample(mesh=...) must equal the unsharded batched sample."""
    from dpivae_tpu.parallel import make_mesh
    from dpivae_tpu.sweep import sweep_sample

    case = get_case("simple_beam")
    cfg = _cfg(case)
    n_members = 2
    key = jax.random.PRNGKey(3)
    dtr, dva, dte = [], [], []
    for m in range(n_members):
        k = jax.random.fold_in(key, m)
        k1, k2, k3 = jax.random.split(k, 3)
        dtr.append(sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist()))
        dva.append(sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist()))
        dte.append(sample_response(case, k3, 8, sample_dist=case.gt_dist()))
    stack = lambda ds, i: np.stack([np.asarray(d[i]) for d in ds])
    data_train = tuple(stack(dtr, i) for i in range(3))
    data_val = tuple(stack(dva, i) for i in range(3))
    res = train_sweep_data(
        cfg, case, lambdas=np.full(n_members, cfg.lambda_g0, np.float32),
        data_train=data_train, data_val=data_val,
    )
    skey = jax.random.PRNGKey(9)
    out_a = sweep_sample(cfg, case, res, data_train, stack(dte, 0),
                         stack(dte, 1), n=2, key=skey)
    mesh = make_mesh(2, axes=("sweep",))
    out_b = sweep_sample(cfg, case, res, data_train, stack(dte, 0),
                         stack(dte, 1), n=2, key=skey, mesh=mesh)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )
