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
