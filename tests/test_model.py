"""Model-level tests: encoder/decoder/VAE shape contracts, loss finiteness,
GRL wiring, and P/S variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models import encoders
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils.data import sample_response


def _beam_data(n=64, seed=0):
    case = get_case("simple_beam")
    return case, sample_response(
        case, jax.random.PRNGKey(seed), n, sample_dist=case.gt_dist()
    )


def _model_and_params(preset="dpivae", n=64, case_name="simple_beam", **over):
    case = get_case(case_name)
    cfg = TrainConfig().with_preset(case.presets[preset]).replace(
        n_train=n, **over
    )
    data = sample_response(
        case, jax.random.PRNGKey(0), n, sample_dist=case.gt_dist()
    )
    model = setup_model(cfg, case, data)
    params = model.init(jax.random.PRNGKey(1))
    return case, cfg, model, params, data


def test_full_cov_head_shapes_and_validity():
    params = encoders.full_cov_nn_init(jax.random.PRNGKey(0), 3, 8, [16])
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    loc, tril = encoders.full_cov_nn_apply(params, x, 3)
    assert loc.shape == (5, 3)
    assert tril.shape == (5, 3, 3)
    tril_np = np.asarray(tril)
    # lower triangular with positive diagonal
    assert np.allclose(np.triu(tril_np, 1), 0.0)
    assert np.all(np.diagonal(tril_np, axis1=-2, axis2=-1) > 0)
    # loc clamped
    assert np.all(np.abs(np.asarray(loc)) <= 50.0)


def test_factorized_head_is_diagonal():
    params = encoders.factorized_nn_init(jax.random.PRNGKey(0), 3, 4, [8])
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    loc, tril = encoders.factorized_nn_apply(params, x, 3)
    tril_np = np.asarray(tril)
    off = tril_np - np.eye(3) * np.diagonal(tril_np, axis1=-2, axis2=-1)[..., None, :] * np.eye(3)
    off = tril_np * (1 - np.eye(3))
    assert np.allclose(off, 0.0)


def test_s_model_param_structure():
    _, _, model, params, _ = _model_and_params("dpivae")
    assert set(params) == {
        "encoder", "prior_net_c", "prior_net_y",
        "decoder_x", "decoder_c", "decoder_y", "log_sigma_x",
    }


def test_p_model_param_structure():
    _, _, model, params, _ = _model_and_params("vae")
    assert {"encoder", "encoder_c", "encoder_y"} <= set(params)


@pytest.mark.parametrize("preset", ["dpivae", "vae"])
def test_forward_shapes(preset):
    case, cfg, model, params, data = _model_and_params(preset)
    x, c, y, _ = data
    n_mc = 7
    out = model.forward(params, jax.random.PRNGKey(2), x, c, n=n_mc)
    xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y, zx, zc, zy, dens_z = out
    B = x.shape[0]
    assert xh_p.shape == (n_mc, B, case.nd_x)
    assert xh_d.shape == (n_mc, B, case.nd_x)
    assert ch.shape == (n_mc, B, case.nd_c)
    assert yh.shape == (n_mc, B, case.nd_y)
    assert zx.shape == (n_mc, B, case.nz_x)
    assert zc.shape == (n_mc, B, cfg.nz_c)
    assert zy.shape == (n_mc, B, cfg.nz_y)
    assert dens_z.shape == (n_mc, B)


def test_zx_respects_prior_bounds():
    """The encoder output squash must confine z_x to the prior box."""
    case, cfg, model, params, data = _model_and_params("dpivae")
    x, c, _, _ = data
    out = model.forward(params, jax.random.PRNGKey(3), x, c, n=4)
    zx = np.asarray(out[6])
    lb = np.array([p.lb for p in case.prior_x])
    ub = np.array([p.ub for p in case.prior_x])
    assert np.all(zx >= lb) and np.all(zx <= ub)


@pytest.mark.parametrize("preset", ["dpivae", "vae"])
def test_loss_finite_and_shapes(preset):
    case, cfg, model, params, data = _model_and_params(preset)
    x, c, y, _ = data
    out = model.loss(params, jax.random.PRNGKey(4), x, c, y, n=8,
                     grl_alpha=cfg.lambda_g0)
    loss, KLx, KLc, KLy, Rx, Rc, Ry, reg = out
    for t in out:
        assert t.shape == (x.shape[0],)
        assert np.all(np.isfinite(np.asarray(t)))
    np.testing.assert_allclose(np.asarray(KLc), 0.0)
    np.testing.assert_allclose(np.asarray(reg), 0.0)  # lambda_x None
    # loss identity: loss = beta*KL - Rx - Rc - Ry - reg at unit weights
    np.testing.assert_allclose(
        np.asarray(loss), np.asarray(KLx - Rx - Rc - Ry), rtol=1e-5
    )


def test_lambda_x_regularizer_active():
    case, cfg, model, params, data = _model_and_params("dpivae", lambda_x=0.5)
    x, c, y, _ = data
    out = model.loss(params, jax.random.PRNGKey(4), x, c, y, n=4)
    reg = np.asarray(out[7])
    assert np.all(reg != 0.0)


def test_grl_reverses_decoder_gradients():
    """Gradient of the data-driven reconstruction w.r.t. encoder params must
    flip sign when the GRL alpha flips sign."""
    case, cfg, model, params, data = _model_and_params("dpivae")
    x, c, y, _ = data

    def recon_loss(p, alpha):
        out = model.forward(params | {"encoder": p}, jax.random.PRNGKey(0),
                            x, c, n=2, grl_alpha=alpha)
        xh_d = out[1]
        return jnp.sum(xh_d**2)

    g_pos = jax.grad(recon_loss)(params["encoder"], 1.0)
    g_neg = jax.grad(recon_loss)(params["encoder"], -1.0)
    leaves_pos = jax.tree.leaves(g_pos)
    leaves_neg = jax.tree.leaves(g_neg)
    for a, b in zip(leaves_pos, leaves_neg):
        np.testing.assert_allclose(np.asarray(a), -np.asarray(b), rtol=1e-4)


def test_cond_forward_uses_prior_net():
    """cond=True swaps z_c for prior-net samples: different z_c stats."""
    case, cfg, model, params, data = _model_and_params("dpivae")
    x, c, _, _ = data
    k = jax.random.PRNGKey(5)
    zc_plain = np.asarray(model.forward(params, k, x, c, cond=False, n=16)[7])
    zc_cond = np.asarray(model.forward(params, k, x, c, cond=True, n=16)[7])
    assert not np.allclose(zc_plain, zc_cond)


def test_bridge_phys_covariate_concat():
    """Bridge has idx_c_phys=(1,): decoder physics input dim nz_x + 1."""
    case, cfg, model, params, data = _model_and_params(
        "dpivae", case_name="bridge"
    )
    x, c, y, _ = data
    out = model.loss(params, jax.random.PRNGKey(0), x, c, y, n=2)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_sample_outputs():
    case, cfg, model, params, data = _model_and_params("dpivae")
    x, c, _, _ = data
    res = model.sample(params, jax.random.PRNGKey(6), x, c, n=3)
    x_s, xh_p, xh_d, c_s, y_s, zx, zc, zy, dens = res
    assert x_s.shape == (3, x.shape[0], case.nd_x)
    assert np.all(np.isfinite(np.asarray(x_s)))
    # noisy sample differs from the mean
    assert not np.allclose(np.asarray(x_s), np.asarray(xh_p + xh_d))


def test_setup_validations():
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(n_train=64)
    data = sample_response(case, jax.random.PRNGKey(0), 32,
                           sample_dist=case.gt_dist())
    with pytest.raises(ValueError):
        setup_model(cfg, case, data)  # n_train mismatch
    cfg_bad = cfg.replace(n_train=32, n_batch=64)
    with pytest.raises(ValueError):
        setup_model(cfg_bad, case, data)  # batch > train
