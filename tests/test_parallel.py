"""Data-parallel sharded train step on the virtual 8-device mesh."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.parallel import make_mesh, sharded_train_step
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils.data import sample_response


def test_dp_sharded_step_runs_and_matches_single_device():
    case = get_case("simple_beam")
    n = 64
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=n, n_batch=n, n_mc_train=2, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), n,
                           sample_dist=case.gt_dist())
    model = setup_model(cfg, case, data)
    params = model.init(jax.random.PRNGKey(1))
    batch = (data[0], data[1], data[2])

    mesh = make_mesh(8, axes=("dp",))
    step_fn, init_fn, place = sharded_train_step(cfg, model, case, mesh)
    p_sh, batch_sh = place(params, batch)
    opt_sh = init_fn(p_sh)

    key = jax.random.PRNGKey(2)
    lam = float(cfg.lambda_g0)
    new_p, new_opt, loss_sh = step_fn(p_sh, opt_sh, key, batch_sh, lam)
    assert np.isfinite(float(loss_sh))

    # Single-device reference: same params/key/batch, no mesh
    mesh1 = make_mesh(1, axes=("dp",))
    step1, init1, place1 = sharded_train_step(cfg, model, case, mesh1)
    p1, batch1 = place1(params, batch)
    new_p1, _, loss1 = step1(p1, init1(p1), key, batch1, lam)

    np.testing.assert_allclose(float(loss_sh), float(loss1), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_p), jax.tree.leaves(new_p1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_dp_full_training_matches_unsharded():
    """The REAL trainer (build_train_fn/train_model) with a dp mesh must
    produce the same full-program trajectory as the unsharded path — the
    multi-chip story of the actual scripts, not a standalone demo step."""
    from dpivae_tpu.train.train import get_train_fn

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=64, n_val=32, n_batch=16, n_mc_train=2, n_mc_val=4,
        n_iter=30, val_freq=10, use_seed=True,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtr = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    dva = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, dtr)
    params = model.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    lam = jax.numpy.asarray(cfg.lambda_g0, jax.numpy.float32)

    mesh = make_mesh(4, axes=("dp",))
    fn_dp = get_train_fn(cfg, case, mesh)
    fn_1 = get_train_fn(cfg, case)
    state_dp, logs_dp = fn_dp(params, key, dtr[:3], dva[:3], lam)
    state_1, logs_1 = fn_1(params, key, dtr[:3], dva[:3], lam)

    np.testing.assert_allclose(
        np.asarray(logs_dp.train), np.asarray(logs_1.train),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(logs_dp.val), np.asarray(logs_1.val),
        rtol=2e-4, atol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_sweep_dp_product_mesh_matches_unsharded():
    """The combined ("sweep", "dp") 2-D mesh — members sharded over one
    axis, each member's batch dp-sharded over the other — must produce
    member-for-member the same trajectories as the plain unsharded vmap.
    A wrong spmd_axis_name interaction would corrupt results while still
    being finite, so this asserts equality, not just finiteness."""
    from dpivae_tpu.sweep import train_sweep

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=32, n_val=16, n_batch=16, n_mc_train=2, n_mc_val=4,
        n_iter=20, val_freq=10, use_seed=True,
    )
    key = jax.random.PRNGKey(17)
    lambdas = [1 / 256, -1.0]
    mesh = make_mesh(8, axes=("sweep", "dp"), shape=(2, 4))
    res_2d = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, key=key,
                         mesh=mesh)
    res_1 = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, key=key)
    np.testing.assert_allclose(
        np.asarray(res_2d.logs.train), np.asarray(res_1.logs.train),
        rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_2d.logs.val), np.asarray(res_1.logs.val),
        rtol=2e-3, atol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(res_2d.params),
                    jax.tree.leaves(res_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_dp_mesh_requires_divisible_batch():
    from dpivae_tpu.train.train import build_train_fn
    import pytest

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_batch=10, n_val=32
    )
    mesh = make_mesh(4, axes=("dp",))
    with pytest.raises(ValueError, match="divisible"):
        build_train_fn(cfg, case, mesh)


def test_make_mesh_rejects_multihost(monkeypatch):
    """Under multi-controller JAX (a pod slice), make_mesh must fail loudly
    instead of building a per-host mesh that trains disjoint replicas."""
    import pytest

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(NotImplementedError, match="single-host only"):
        make_mesh(1)


def test_make_global_mesh_and_feed_process_local():
    """The pod-slice recipe as code (docs/PERFORMANCE.md 'Multi-host
    boundary'): under one process make_global_mesh covers all devices and
    feed_process_local equals a plain device_put (local shard == global
    array), verified by running a real sharded train step on it."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dpivae_tpu.parallel import feed_process_local, make_global_mesh

    mesh = make_global_mesh(("dp",))
    assert mesh.devices.shape == (len(jax.devices()),)
    mesh2 = make_global_mesh(("sweep", "dp"), shape=(2, 4))
    assert mesh2.shape == {"sweep": 2, "dp": 4}

    case = get_case("simple_beam")
    n = 32
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=n, n_batch=n, n_mc_train=2, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), n,
                           sample_dist=case.gt_dist())
    model = setup_model(cfg, case, data)
    params = model.init(jax.random.PRNGKey(1))
    batch = tuple(np.asarray(a) for a in data[:3])

    step_fn, init_fn, place = sharded_train_step(cfg, model, case, mesh)
    p_sh, batch_ref = place(params, batch)
    sh = NamedSharding(mesh, P("dp"))
    batch_fed = tuple(feed_process_local(sh, a) for a in batch)
    for fed, ref in zip(batch_fed, batch_ref):
        assert fed.shape == ref.shape
        assert fed.sharding.is_equivalent_to(ref.sharding, fed.ndim)
        np.testing.assert_array_equal(np.asarray(fed), np.asarray(ref))

    key = jax.random.PRNGKey(2)
    lam = float(cfg.lambda_g0)
    opt = init_fn(p_sh)
    _, _, loss_fed = step_fn(p_sh, opt, key, batch_fed, lam)
    _, _, loss_ref = step_fn(p_sh, opt, key, batch_ref, lam)
    np.testing.assert_allclose(float(loss_fed), float(loss_ref), rtol=1e-6)


def test_make_global_mesh_allowed_where_make_mesh_refuses(monkeypatch):
    """Guard interplay: under (mocked) multi-controller JAX, make_mesh
    refuses and its message points at the global-mesh recipe, while
    make_global_mesh builds over jax.devices() — the global list once
    jax.distributed.initialize has run."""
    import pytest

    from dpivae_tpu.parallel import make_global_mesh

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(NotImplementedError, match="make_global_mesh"):
        make_mesh(1)
    mesh = make_global_mesh(("dp",))
    assert mesh.devices.shape == (len(jax.devices()),)
