"""Golden parity for the P (three-encoder) variant: same weights + noise
through this stack and a torch replica must agree in loss and gradients.

Complements test_torch_parity.py (S variant); the P model differs in the
encode path — three full-covariance encoders over the same x, squash on the
z_x encoder only, summed densities (ref: models/vae.py:141-149) — and the
"vae" preset's lambda_g0=-1 GRL (plain gradient scaled by +1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models.encoders import full_cov_nn_apply
from dpivae_tpu.ops.mvn import mvn_log_prob
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils import GAUSSIAN_CONST
from dpivae_tpu.utils.data import sample_response

B, N_MC = 8, 3
LAMBDA = -1.0  # the "vae" preset value


def _build():
    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["vae"]).replace(
        n_train=B, n_batch=B, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), B,
                           sample_dist=case.gt_dist())
    model = setup_model(cfg, case, data)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    eps = {
        "x": rng.randn(N_MC, B, 2).astype(np.float32),
        "c": rng.randn(N_MC, B, 2).astype(np.float32),
        "y": rng.randn(N_MC, B, 2).astype(np.float32),
    }
    return case, cfg, model, params, data, eps


def _sample_block(params_enc, x_t, eps, nz):
    loc, L = full_cov_nn_apply(params_enc, x_t, nz)
    z = loc + jnp.sum(L * eps[..., None, :], axis=-1)
    log_q = (
        jnp.sum(-0.5 * eps * eps, axis=-1)
        + nz * GAUSSIAN_CONST
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    )
    return z, log_q


def _jax_loss(model, params, x, c, y, eps):
    x_t, _ = model.transform_x.forward(x)
    zx_raw, q_x = _sample_block(params["encoder"], x_t, eps["x"], 2)
    zc, q_c = _sample_block(params["encoder_c"], x_t, eps["c"], 2)
    zy, q_y = _sample_block(params["encoder_y"], x_t, eps["y"], 2)
    zx, log_det = model.output_transform_zx.forward(zx_raw)
    log_q = q_x - log_det + q_c + q_y

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
    t = lambda a: torch.tensor(np.asarray(a))
    leaves = {}

    def lin(p, name):
        w, b = t(p["w"]), t(p["b"])
        w.requires_grad_(True)
        b.requires_grad_(True)
        leaves[f"{name}.w"], leaves[f"{name}.b"] = w, b
        return lambda h: h @ w + b

    x, c, y = t(x), t(c), t(y)
    eps = {k: t(v) for k, v in eps.items()}

    x_t = (x - t(model.transform_x.mean)) / t(model.transform_x.scale)
    c_t = (c - t(model.transform_c.mean)) / t(model.transform_c.scale)
    y_t = (y - t(model.transform_y.mean)) / t(model.transform_y.scale)

    def enc_block(p, inp, e, nz, name):
        h = torch.relu(lin(p["trunk"]["layers"][0], f"{name}.t0")(inp))
        loc = lin(p["f_mean"], f"{name}.mean")(h).clamp(-50, 50)
        sigma = lin(p["f_sigma"], f"{name}.sigma")(h).clamp(-7, 3).exp()
        L = torch.tril(
            lin(p["f_cov"], f"{name}.cov")(h).clamp(-20, 20).reshape(-1, nz, nz),
            -1,
        ) + torch.diag_embed(sigma + 1e-8)
        z = loc + (L @ e.unsqueeze(-1)).squeeze(-1)
        log_q = torch.distributions.MultivariateNormal(
            loc, scale_tril=L
        ).log_prob(z)
        return z, log_q

    zx_raw, q_x = enc_block(params["encoder"], x_t, eps["x"], 2, "ex")
    zc, q_c = enc_block(params["encoder_c"], x_t, eps["c"], 2, "ec")
    zy, q_y = enc_block(params["encoder_y"], x_t, eps["y"], 2, "ey")

    lb = torch.tensor([2.0, 0.01])
    ub = torch.tensor([6.0, 0.99])
    log_det = (zx_raw - 2 * torch.nn.functional.softplus(zx_raw)).sum(-1)
    zx = torch.sigmoid(zx_raw) * (ub - lb) + lb
    log_det = log_det + torch.log((ub - lb).abs()).sum()
    log_q = q_x - log_det + q_c + q_y

    def prior_net(p, inp, name):
        h = torch.relu(lin(p["trunk"]["layers"][0], f"{name}.t0")(inp))
        locp = lin(p["f_mean"], f"{name}.mean")(h).clamp(-50, 50)
        sig = lin(p["f_sigma"], f"{name}.sigma")(h).clamp(-7, 3).exp()
        return locp, torch.diag_embed(sig + 1e-8)

    loc_c, L_c = prior_net(params["prior_net_c"], c_t, "pc")
    loc_y, L_y = prior_net(params["prior_net_y"], y_t, "py")
    px_loc = torch.tensor([4.0, 0.5])
    px_scale = torch.tensor([1.0, 0.2])
    log_p = (
        (-0.5 * ((zx - px_loc) / px_scale) ** 2 - px_scale.log()
         - 0.5 * np.log(2 * np.pi)).sum(-1)
        + torch.distributions.MultivariateNormal(loc_c, scale_tril=L_c).log_prob(zc)
        + torch.distributions.MultivariateNormal(loc_y, scale_tril=L_y).log_prob(zy)
    )
    KL = (log_q - log_p).mean(0)

    fx0 = lin(params["decoder_x"]["fx0"], "dx.fx0")
    fx1 = lin(params["decoder_x"]["fx1"], "dx.fx1")
    z_rev = _GradRevT.apply(torch.cat((zc, zy), -1), LAMBDA)
    xh_d = fx1(torch.relu(fx0(z_rev)))

    tt = torch.linspace(0.0, 1.0, 32)
    E = zx[..., 0:1] * 1e6
    a = zx[..., 1:2]
    b = 1.0 - a
    I = 2e-6
    w = b * tt * (1.0 - b**2 - tt**2) / (6 * E * I)
    wb = (tt - a) ** 3 / (6 * E * I)
    xh = -1000.0 * torch.where(tt > a, w + wb, w) + xh_d

    def aux(p, inp, nd, name):
        h = torch.relu(lin(p["layers"][0], f"{name}.l0")(inp))
        out = lin(p["layers"][1], f"{name}.l1")(h)
        return out[..., :nd], out[..., nd:]

    ch, ls_c = aux(params["decoder_c"], zc, 1, "dc")
    yh, ls_y = aux(params["decoder_y"], zy, 1, "dy")

    log_sigma_x = t(params["log_sigma_x"])
    log_sigma_x.requires_grad_(True)
    leaves["log_sigma_x"] = log_sigma_x
    R_x = torch.distributions.Normal(xh, log_sigma_x.exp()).log_prob(x).sum(-1).mean(0)
    R_c = torch.distributions.Normal(ch, ls_c.exp()).log_prob(c).sum(-1).mean(0)
    R_y = torch.distributions.Normal(yh, ls_y.exp()).log_prob(y).sum(-1).mean(0)
    return (KL - R_x - R_c - R_y).sum(), leaves


def test_p_model_loss_and_grad_parity():
    case, cfg, model, params, data, eps = _build()
    x, c, y = np.asarray(data[0]), np.asarray(data[1]), np.asarray(data[2])
    eps_j = {k: jnp.asarray(v) for k, v in eps.items()}

    jax_val = float(_jax_loss(model, params, jnp.asarray(x), jnp.asarray(c),
                              jnp.asarray(y), eps_j))
    torch_val, leaves = _torch_loss(model, params, x, c, y, eps)
    np.testing.assert_allclose(jax_val, float(torch_val.detach()), rtol=2e-5)

    jax_grads = jax.grad(
        lambda p: _jax_loss(model, p, jnp.asarray(x), jnp.asarray(c),
                            jnp.asarray(y), eps_j)
    )(params)
    torch_val.backward()

    checks = {
        "ex.cov.w": jax_grads["encoder"]["f_cov"]["w"],
        "ec.mean.w": jax_grads["encoder_c"]["f_mean"]["w"],
        "ey.t0.w": jax_grads["encoder_y"]["trunk"]["layers"][0]["w"],
        "dx.fx0.w": jax_grads["decoder_x"]["fx0"]["w"],
        "pc.sigma.b": jax_grads["prior_net_c"]["f_sigma"]["b"],
        "log_sigma_x": jax_grads["log_sigma_x"],
    }
    for name, jg in checks.items():
        tg = leaves[name].grad
        assert tg is not None, f"no torch grad for {name}"
        np.testing.assert_allclose(
            np.asarray(jg), tg.detach().numpy(), rtol=5e-4, atol=1e-6,
            err_msg=f"gradient mismatch at {name}",
        )
