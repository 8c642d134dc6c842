"""Golden parity vs PyTorch: identical weights + identical noise through the
full S-model ELBO chain must give identical losses AND identical gradients
(the BASELINE.json north star demands ELBO parity; exact-RNG parity is
impossible across frameworks, so noise is injected explicitly on both
sides — SURVEY.md §7 "RNG discipline").

The torch side is assembled from the reference's formulas (models/vae.py:
177-231, models/encoders.py:33-93, utils/transforms.py:97-133,202-219)
directly on the jax-initialized weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models.encoders import full_cov_nn_apply
from dpivae_tpu.models.nn import linear_apply
from dpivae_tpu.ops.gradrev import grad_reverse
from dpivae_tpu.ops.mvn import mvn_log_prob
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils import GAUSSIAN_CONST
from dpivae_tpu.utils.data import sample_response

B, N_MC = 16, 4
LAMBDA = 1 / 256


def _build():
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=B, n_batch=B, use_seed=True
    )
    data = sample_response(
        case, jax.random.PRNGKey(0), B, sample_dist=case.gt_dist()
    )
    model = setup_model(cfg, case, data)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    eps = rng.randn(N_MC, B, 6).astype(np.float32)
    return case, cfg, model, params, data, eps


def _jax_loss(model, params, x, c, y, eps):
    """The S-model ELBO with *explicit* noise eps instead of a PRNG key —
    otherwise identical to DPIVAE.loss."""
    x_t, _ = model.transform_x.forward(x)
    loc, L = full_cov_nn_apply(params["encoder"], x_t, 6)
    z = loc + jnp.squeeze(L @ eps[..., None], -1)
    log_q = (
        jnp.sum(-0.5 * eps * eps, axis=-1)
        + 6 * GAUSSIAN_CONST
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    )
    z, log_det = model.output_transform_zx.forward(z)
    log_q = log_q - log_det
    zx, zc, zy = z[..., :2], z[..., 2:4], z[..., 4:6]

    loc_c, tril_c, loc_y, tril_y = model.prior_net(params, c, y=y)
    log_p = (
        jnp.sum(model.prior_x.log_prob(zx), axis=-1)
        + mvn_log_prob(zc, loc_c, tril_c)
        + mvn_log_prob(zy, loc_y, tril_y)
    )
    KL = jnp.mean(log_q - log_p, axis=0)

    xh_p, xh_d, ch, ls_c, yh, ls_y = model.decode(
        params, zx, zc, zy, grl_alpha=LAMBDA
    )
    xh = xh_p + xh_d
    sx = jnp.exp(params["log_sigma_x"])

    def nlp(v, m, s):
        zn = (v - m) / s
        return -0.5 * zn * zn + GAUSSIAN_CONST - jnp.log(s)

    R_x = jnp.mean(jnp.sum(nlp(x, xh, sx), axis=-1), axis=0)
    R_c = jnp.mean(jnp.sum(nlp(c, ch, jnp.exp(ls_c)), axis=-1), axis=0)
    R_y = jnp.mean(jnp.sum(nlp(y, yh, jnp.exp(ls_y)), axis=-1), axis=0)
    return jnp.sum(KL - R_x - R_c - R_y)


class _GradRevT(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.alpha = alpha
        return x

    @staticmethod
    def backward(ctx, g):
        return -g * ctx.alpha, None


def _torch_loss(model, params, x, c, y, eps):
    """The same ELBO assembled in torch from the same weights."""

    def t(a):
        return torch.tensor(np.asarray(a), requires_grad=False)

    def tp(a):
        v = torch.tensor(np.asarray(a))
        v.requires_grad_(True)
        return v

    # leaf params we also want gradients for
    leaves = {}

    def lin(params_lin, name):
        w, b = tp(params_lin["w"]), tp(params_lin["b"])
        leaves[f"{name}.w"], leaves[f"{name}.b"] = w, b
        return lambda h: h @ w + b

    x, c, y, eps = t(x), t(c), t(y), t(eps)

    # Input scalers (fitted values identical by construction)
    sx_m, sx_s = t(model.transform_x.mean), t(model.transform_x.scale)
    sc_m, sc_s = t(model.transform_c.mean), t(model.transform_c.scale)
    sy_m, sy_s = t(model.transform_y.mean), t(model.transform_y.scale)
    x_t = (x - sx_m) / sx_s
    c_t = (c - sc_m) / sc_s
    y_t = (y - sy_m) / sy_s

    # Encoder: trunk (Linear+ReLU) + clamped heads
    enc = params["encoder"]
    trunk0 = lin(enc["trunk"]["layers"][0], "enc.trunk0")
    f_mean = lin(enc["f_mean"], "enc.f_mean")
    f_sigma = lin(enc["f_sigma"], "enc.f_sigma")
    f_cov = lin(enc["f_cov"], "enc.f_cov")
    h = torch.relu(trunk0(x_t))
    loc = f_mean(h).clamp(-50, 50)
    sigma = f_sigma(h).clamp(-7, 3).exp()
    L = torch.tril(f_cov(h).clamp(-20, 20).reshape(-1, 6, 6), -1)
    L = L + torch.diag_embed(sigma + 1e-8)

    z = loc + (L @ eps.unsqueeze(-1)).squeeze(-1)
    log_q = torch.distributions.MultivariateNormal(loc, scale_tril=L).log_prob(z)

    # Masked squash: Logistic(k=1) -> ShiftScale on the z_x slice
    lb = torch.tensor([2.0, 0.01])
    ub = torch.tensor([6.0, 0.99])
    zx_raw = z[..., :2]
    log_det = (zx_raw - 2 * torch.nn.functional.softplus(zx_raw)).sum(-1)
    zx = torch.sigmoid(zx_raw) * (ub - lb) + lb
    log_det = log_det + torch.log((ub - lb).abs()).sum()
    log_q = log_q - log_det
    zc, zy = z[..., 2:4], z[..., 4:6]

    # Factorized prior nets
    def prior_net(p, inp, nz, name):
        h = torch.relu(lin(p["trunk"]["layers"][0], f"{name}.trunk0")(inp))
        locp = lin(p["f_mean"], f"{name}.f_mean")(h).clamp(-50, 50)
        sig = lin(p["f_sigma"], f"{name}.f_sigma")(h).clamp(-7, 3).exp()
        return locp, torch.diag_embed(sig + 1e-8)

    loc_c, L_c = prior_net(params["prior_net_c"], c_t, 2, "pc")
    loc_y, L_y = prior_net(params["prior_net_y"], y_t, 2, "py")

    px_loc = torch.tensor([4.0, 0.5])
    px_scale = torch.tensor([1.0, 0.2])
    log_p_zx = (
        -0.5 * ((zx - px_loc) / px_scale) ** 2
        - px_scale.log()
        - 0.5 * np.log(2 * np.pi)
    ).sum(-1)
    log_p_zc = torch.distributions.MultivariateNormal(loc_c, scale_tril=L_c).log_prob(zc)
    log_p_zy = torch.distributions.MultivariateNormal(loc_y, scale_tril=L_y).log_prob(zy)
    KL = (log_q - (log_p_zx + log_p_zc + log_p_zy)).mean(0)

    # Additive decoder with GRL; analytic beam physics
    dx = params["decoder_x"]
    fx0 = lin(dx["fx0"], "dx.fx0")
    fx1 = lin(dx["fx1"], "dx.fx1")
    z_rev = _GradRevT.apply(torch.cat((zc, zy), -1), LAMBDA)
    xh_d = fx1(torch.relu(fx0(z_rev)))

    tt = torch.linspace(0.0, 1.0, 32)
    E = zx[..., 0:1] * 1e6
    a = zx[..., 1:2]
    b = 1.0 - a
    I = 2e-6
    w = b * tt * (1.0 - b**2 - tt**2) / (6 * E * I)
    wb = (tt - a) ** 3 / (6 * E * I)
    xh_p = -1000.0 * torch.where(tt > a, w + wb, w)
    xh = xh_p + xh_d

    # Aux decoders (2-layer ReLU, 2*nd output split)
    def aux_dec(p, inp, nd, name):
        h = torch.relu(lin(p["layers"][0], f"{name}.l0")(inp))
        out = lin(p["layers"][1], f"{name}.l1")(h)
        return out[..., :nd], out[..., nd:]

    ch, ls_c = aux_dec(params["decoder_c"], zc, 1, "dc")
    yh, ls_y = aux_dec(params["decoder_y"], zy, 1, "dy")

    log_sigma_x = tp(params["log_sigma_x"])
    leaves["log_sigma_x"] = log_sigma_x
    R_x = torch.distributions.Normal(xh, log_sigma_x.exp()).log_prob(x).sum(-1).mean(0)
    R_c = torch.distributions.Normal(ch, ls_c.exp()).log_prob(c).sum(-1).mean(0)
    R_y = torch.distributions.Normal(yh, ls_y.exp()).log_prob(y).sum(-1).mean(0)

    return (KL - R_x - R_c - R_y).sum(), leaves


def test_loss_parity():
    case, cfg, model, params, data, eps = _build()
    x, c, y = np.asarray(data[0]), np.asarray(data[1]), np.asarray(data[2])
    jax_val = float(_jax_loss(model, params, jnp.asarray(x), jnp.asarray(c),
                              jnp.asarray(y), jnp.asarray(eps)))
    torch_val, _ = _torch_loss(model, params, x, c, y, eps)
    np.testing.assert_allclose(jax_val, float(torch_val), rtol=2e-5)


def test_gradient_parity_including_grl():
    case, cfg, model, params, data, eps = _build()
    x, c, y = np.asarray(data[0]), np.asarray(data[1]), np.asarray(data[2])

    jax_grads = jax.grad(
        lambda p: _jax_loss(model, p, jnp.asarray(x), jnp.asarray(c),
                            jnp.asarray(y), jnp.asarray(eps))
    )(params)

    torch_val, leaves = _torch_loss(model, params, x, c, y, eps)
    torch_val.backward()

    checks = {
        # encoder head (gradient flows through sampling + squash + physics)
        "enc.f_mean.w": jax_grads["encoder"]["f_mean"]["w"],
        "enc.f_cov.b": jax_grads["encoder"]["f_cov"]["b"],
        # data-driven decoder behind the GRL — sign-sensitive
        "dx.fx0.w": jax_grads["decoder_x"]["fx0"]["w"],
        "dx.fx1.b": jax_grads["decoder_x"]["fx1"]["b"],
        # prior nets and aux decoders
        "pc.f_mean.w": jax_grads["prior_net_c"]["f_mean"]["w"],
        "dy.l1.b": jax_grads["decoder_y"]["layers"][1]["b"],
        # the learned noise scalar
        "log_sigma_x": jax_grads["log_sigma_x"],
    }
    for name, jg in checks.items():
        tg = leaves[name].grad
        assert tg is not None, f"no torch grad for {name}"
        np.testing.assert_allclose(
            np.asarray(jg), tg.detach().numpy(), rtol=5e-4, atol=1e-6,
            err_msg=f"gradient mismatch at {name}",
        )
