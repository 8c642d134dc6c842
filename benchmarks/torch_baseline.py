"""Measure the PyTorch-reference training throughput on CPU.

The reference itself cannot run in this image (its requirements pin
pytorch_lightning/torchrl and its snapshot is missing the y.pt data files),
so this script re-creates its hot loop *at identical shapes and semantics*
(reference dpivae.py:390-436 with the beam "dpivae" S-preset: batch 64,
16 MC samples, full-covariance joint encoder 32->[128]->(6, 6, 36),
Logistic+ShiftScale squash on z_x, additive physics+NN decoder, learned
conditional priors, Adam) and times steps/sec. This is the vs_baseline
anchor recorded in BASELINE.md and used by bench.py.

Run: python benchmarks/torch_baseline.py [--n_iter 300] [--val]
"""

import argparse
import json
import math
import time

import torch
from torch import nn


def beam_physics(z, npts=32):
    """Closed-form Euler-Bernoulli deflection (matches the reference's
    analytic part model at cases/simple_beam/simple_beam_model.py:4-31)."""
    x = torch.linspace(0.0, 1.0, npts)
    E = z[..., 0:1] * 1e6
    a = z[..., 1:2]
    b = 1.0 - a
    I = 2e-6
    w = b * x * (1.0 - b**2 - x**2) / (6 * E * I)
    wb = (x - a) ** 3 / (6 * E * I)
    w = torch.where(x > a, w + wb, w)
    return -1000.0 * w


class FullCovHead(nn.Module):
    def __init__(self, nz, nd, width):
        super().__init__()
        self.nz = nz
        self.trunk = nn.Sequential(nn.Linear(nd, width), nn.ReLU())
        self.f_mean = nn.Linear(width, nz)
        self.f_sigma = nn.Linear(width, nz)
        self.f_cov = nn.Linear(width, nz * nz)

    def forward(self, x):
        h = self.trunk(x)
        loc = self.f_mean(h).clamp(-50, 50)
        sigma = self.f_sigma(h).clamp(-7, 3).exp()
        L = torch.tril(
            self.f_cov(h).clamp(-20, 20).reshape(-1, self.nz, self.nz), -1
        )
        return loc, L + torch.diag_embed(sigma + 1e-8)


class FactorizedHead(nn.Module):
    def __init__(self, nz, nd, width):
        super().__init__()
        self.trunk = nn.Sequential(nn.Linear(nd, width), nn.ReLU())
        self.f_mean = nn.Linear(width, nz)
        self.f_sigma = nn.Linear(width, nz)

    def forward(self, x):
        h = self.trunk(x)
        loc = self.f_mean(h).clamp(-50, 50)
        sigma = self.f_sigma(h).clamp(-7, 3).exp()
        return loc, torch.diag_embed(sigma + 1e-8)


class BeamSVAE(nn.Module):
    """S-model DPIVAE at beam shapes: nz = 2+2+2 joint latent over nd_x=32."""

    def __init__(self, nz_x=2, nz_c=2, nz_y=2, nd_x=32, nd_c=1, nd_y=1):
        super().__init__()
        self.nz_x, self.nz_c, self.nz_y = nz_x, nz_c, nz_y
        self.nd_x, self.nd_c, self.nd_y = nd_x, nd_c, nd_y
        nz = nz_x + nz_c + nz_y
        self.encoder = FullCovHead(nz, nd_x, 128)
        self.prior_net_c = FactorizedHead(nz_c, nd_c, 64)
        self.prior_net_y = FactorizedHead(nz_y, nd_y, 64)
        self.fx0 = nn.Linear(nz_c + nz_y, 128)
        self.fx1 = nn.Linear(128, nd_x)
        self.dec_c = nn.Sequential(nn.Linear(nz_c, 64), nn.ReLU(), nn.Linear(64, 2 * nd_c))
        self.dec_y = nn.Sequential(nn.Linear(nz_y, 64), nn.ReLU(), nn.Linear(64, 2 * nd_y))
        self.log_sigma_x = nn.Parameter(torch.tensor(0.0))
        # z_x squash bounds from the beam prior (lb=[2, .01], ub=[6, .99])
        self.register_buffer("lb", torch.tensor([2.0, 0.01]))
        self.register_buffer("ub", torch.tensor([6.0, 0.99]))
        # fixed N(loc, scale) prior on z_x
        self.register_buffer("px_loc", torch.tensor([4.0, 0.5]))
        self.register_buffer("px_scale", torch.tensor([1.0, 0.2]))

    def loss(self, x, c, y, n_mc, grl_alpha):
        B = x.shape[0]
        loc, L = self.encoder(x)
        mvn = torch.distributions.MultivariateNormal(loc, scale_tril=L)
        z = mvn.rsample((n_mc,))
        log_q = mvn.log_prob(z)

        # Squash z_x slice: sigmoid then affine into [lb, ub]
        zx_raw = z[..., : self.nz_x]
        kz = zx_raw
        log_det = (kz - 2 * nn.functional.softplus(kz)).sum(-1)
        zx01 = torch.sigmoid(kz)
        a = self.ub - self.lb
        zx = zx01 * a + self.lb
        log_det = log_det + torch.log(a.abs()).sum()
        log_q = log_q - log_det

        zc = z[..., self.nz_x : self.nz_x + self.nz_c]
        zy = z[..., self.nz_x + self.nz_c :]

        # GRL
        z_rev = GradRev.apply(torch.cat((zc, zy), -1), grl_alpha)
        xh_d = self.fx1(torch.relu(self.fx0(z_rev)))
        xh_p = beam_physics(zx)
        xh = xh_p + xh_d

        # Priors
        loc_c, L_c = self.prior_net_c(c)
        loc_y, L_y = self.prior_net_y(y)
        log_p_zx = (
            -0.5 * ((zx - self.px_loc) / self.px_scale) ** 2
            - self.px_scale.log()
            - 0.5 * math.log(2 * math.pi)
        ).sum(-1)
        log_p_zc = torch.distributions.MultivariateNormal(loc_c, scale_tril=L_c).log_prob(zc)
        log_p_zy = torch.distributions.MultivariateNormal(loc_y, scale_tril=L_y).log_prob(zy)
        KL = (log_q - (log_p_zx + log_p_zc + log_p_zy)).mean(0)

        out_c = self.dec_c(zc)
        out_y = self.dec_y(zy)
        ch, ls_c = out_c[..., : self.nd_c], out_c[..., self.nd_c :]
        yh, ls_y = out_y[..., : self.nd_y], out_y[..., self.nd_y :]

        R_x = torch.distributions.Normal(xh, self.log_sigma_x.exp()).log_prob(x).sum(-1).mean(0)
        R_c = torch.distributions.Normal(ch, ls_c.exp()).log_prob(c).sum(-1).mean(0)
        R_y = torch.distributions.Normal(yh, ls_y.exp()).log_prob(y).sum(-1).mean(0)
        return KL - R_x - R_c - R_y


class GradRev(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.alpha = alpha
        return x

    @staticmethod
    def backward(ctx, g):
        return -g * ctx.alpha, None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_iter", type=int, default=300)
    parser.add_argument("--n_warmup", type=int, default=30)
    parser.add_argument("--val", action="store_true",
                        help="include a validation pass every 10 iters "
                        "(512 points x 64 MC) as the reference does")
    args = parser.parse_args()

    torch.manual_seed(0)
    n_train, n_val, n_batch, n_mc = 1024, 512, 64, 16
    model = BeamSVAE()
    x = torch.randn(n_train, 32)
    c = torch.randn(n_train, 1)
    y = torch.randn(n_train, 1)
    xv = torch.randn(n_val, 32)
    cv = torch.randn(n_val, 1)
    yv = torch.randn(n_val, 1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def step(i):
        opt.zero_grad()
        idx = torch.multinomial(torch.ones(n_train), n_batch, replacement=False)
        loss = model.loss(x[idx], c[idx], y[idx], n_mc, 1 / 256).sum() / (
            n_batch * (32 + 1 + 1)
        )
        loss.backward()
        opt.step()
        if args.val and i % 10 == 0:
            with torch.no_grad():
                model.loss(xv, cv, yv, 64, 1 / 256)
        return loss

    for i in range(args.n_warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(args.n_iter):
        step(i)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "torch_cpu_steps_per_sec",
        "value": args.n_iter / dt,
        "unit": "steps/s",
        "with_validation": bool(args.val),
        "n_iter": args.n_iter,
    }))


if __name__ == "__main__":
    main()
