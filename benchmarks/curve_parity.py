"""ELBO training-curve parity: this framework vs the torch reference loop.

Trains the beam "dpivae" (S) model on the SAME dataset with the same
hyperparameters in both stacks — this framework's fused scan and a faithful
torch replica of the reference training loop (reference dpivae.py:390-436
semantics; architecture per models/encoders.py + models/decoders.py with
input scalers as in models/vae.py:72-97) — and compares the ELBO
trajectories. RNG streams necessarily differ, so parity is statistical:
smoothed curves and final losses must agree within tolerance
(BASELINE.json north star; SURVEY.md §7 "RNG discipline").

Run: python benchmarks/curve_parity.py [--n_iter 2000] [--plot out.png]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Strict-parity benchmark: pin full-f32 MXU passes so the JAX curve is
# compared against the f32 torch replica at matched numerics (the package
# default is TPU-native bf16 passes, which converge identically but drift
# per-step).
os.environ.setdefault("DPIVAE_MATMUL_PRECISION", "highest")

import numpy as np


def train_torch(x, c, y, n_iter, seed=0, lambda_g0=1 / 256):
    import torch

    torch.manual_seed(seed)
    x = torch.from_numpy(x)
    c = torch.from_numpy(c)
    y = torch.from_numpy(y)
    n_train, nd_x = x.shape
    nd_c, nd_y = c.shape[1], y.shape[1]
    nz_x, nz_c, nz_y = 2, 2, 2
    nz = nz_x + nz_c + nz_y
    n_batch, n_mc = 64, 16

    # Input scalers fitted on train data (ref: dpivae.py:141-146)
    xm, xs = x.mean(0, keepdim=True), x.std(0, unbiased=False, keepdim=True)
    cm, cs = c.mean(0, keepdim=True), c.std(0, unbiased=False, keepdim=True)
    ym, ys = y.mean(0, keepdim=True), y.std(0, unbiased=False, keepdim=True)

    class FullCov(torch.nn.Module):
        def __init__(self, nzz, nd, width):
            super().__init__()
            self.nz = nzz
            self.trunk = torch.nn.Sequential(
                torch.nn.Linear(nd, width), torch.nn.ReLU()
            )
            self.f_mean = torch.nn.Linear(width, nzz)
            self.f_sigma = torch.nn.Linear(width, nzz)
            self.f_cov = torch.nn.Linear(width, nzz * nzz)

        def forward(self, inp):
            h = self.trunk(inp)
            loc = self.f_mean(h).clamp(-50, 50)
            sigma = self.f_sigma(h).clamp(-7, 3).exp()
            L = torch.tril(
                self.f_cov(h).clamp(-20, 20).reshape(-1, self.nz, self.nz), -1
            )
            return loc, L + torch.diag_embed(sigma + 1e-8)

    class Fact(torch.nn.Module):
        def __init__(self, nzz, nd, width):
            super().__init__()
            self.trunk = torch.nn.Sequential(
                torch.nn.Linear(nd, width), torch.nn.ReLU()
            )
            self.f_mean = torch.nn.Linear(width, nzz)
            self.f_sigma = torch.nn.Linear(width, nzz)

        def forward(self, inp):
            h = self.trunk(inp)
            return (
                self.f_mean(h).clamp(-50, 50),
                torch.diag_embed(self.f_sigma(h).clamp(-7, 3).exp() + 1e-8),
            )

    class GradRev(torch.autograd.Function):
        @staticmethod
        def forward(ctx, v, alpha):
            ctx.alpha = alpha
            return v

        @staticmethod
        def backward(ctx, g):
            return -g * ctx.alpha, None

    def physics(z):
        tt = torch.linspace(0.0, 1.0, nd_x)
        E = z[..., 0:1] * 1e6
        a = z[..., 1:2]
        b = 1.0 - a
        I = 2e-6
        w = b * tt * (1.0 - b**2 - tt**2) / (6 * E * I)
        wb = (tt - a) ** 3 / (6 * E * I)
        return -1000.0 * torch.where(tt > a, w + wb, w)

    enc = FullCov(nz, nd_x, 128)
    pn_c = Fact(nz_c, nd_c, 64)
    pn_y = Fact(nz_y, nd_y, 64)
    fx0 = torch.nn.Linear(nz_c + nz_y, 128)
    fx1 = torch.nn.Linear(128, nd_x)
    dec_c = torch.nn.Sequential(torch.nn.Linear(nz_c, 64), torch.nn.ReLU(),
                                torch.nn.Linear(64, 2 * nd_c))
    dec_y = torch.nn.Sequential(torch.nn.Linear(nz_y, 64), torch.nn.ReLU(),
                                torch.nn.Linear(64, 2 * nd_y))
    log_sigma_x = torch.nn.Parameter(torch.tensor(0.0))

    lb = torch.tensor([2.0, 0.01])
    ub = torch.tensor([6.0, 0.99])
    px_loc = torch.tensor([4.0, 0.5])
    px_scale = torch.tensor([1.0, 0.2])

    groups = [
        {"params": enc.parameters(), "lr": 1e-3},
        {"params": pn_c.parameters(), "lr": 1e-3},
        {"params": pn_y.parameters(), "lr": 1e-3},
        {"params": list(fx0.parameters()) + list(fx1.parameters()), "lr": 1e-3},
        {"params": dec_c.parameters(), "lr": 1e-3},
        {"params": dec_y.parameters(), "lr": 1e-3},
        {"params": [log_sigma_x], "lr": 5e-3},
    ]
    opt = torch.optim.Adam(groups, lr=1e-3)

    def loss_fn(x_i, c_i, y_i, n):
        x_t = (x_i - xm) / xs
        c_t = (c_i - cm) / cs
        y_t = (y_i - ym) / ys
        loc, L = enc(x_t)
        mvn = torch.distributions.MultivariateNormal(loc, scale_tril=L)
        z = mvn.rsample((n,))
        log_q = mvn.log_prob(z)
        zx_raw = z[..., :nz_x]
        # squash log-det: Logistic(k=1) + ShiftScale constant
        log_det = (zx_raw - 2 * torch.nn.functional.softplus(zx_raw)).sum(-1)
        log_det = log_det + torch.log((ub - lb).abs()).sum()
        zx = torch.sigmoid(zx_raw) * (ub - lb) + lb
        log_q = log_q - log_det
        zc = z[..., nz_x:nz_x + nz_c]
        zy = z[..., nz_x + nz_c:]

        z_rev = GradRev.apply(torch.cat((zc, zy), -1), lambda_g0)
        xh = physics(zx) + fx1(torch.relu(fx0(z_rev)))

        loc_c, L_c = pn_c(c_t)
        loc_y, L_y = pn_y(y_t)
        log_p = (
            (-0.5 * ((zx - px_loc) / px_scale) ** 2 - px_scale.log()
             - 0.5 * math.log(2 * math.pi)).sum(-1)
            + torch.distributions.MultivariateNormal(loc_c, scale_tril=L_c).log_prob(zc)
            + torch.distributions.MultivariateNormal(loc_y, scale_tril=L_y).log_prob(zy)
        )
        KL = (log_q - log_p).mean(0)

        out_c = dec_c(zc)
        out_y = dec_y(zy)
        R_x = torch.distributions.Normal(xh, log_sigma_x.exp()).log_prob(x_i).sum(-1).mean(0)
        R_c = torch.distributions.Normal(
            out_c[..., :nd_c], out_c[..., nd_c:].exp()
        ).log_prob(c_i).sum(-1).mean(0)
        R_y = torch.distributions.Normal(
            out_y[..., :nd_y], out_y[..., nd_y:].exp()
        ).log_prob(y_i).sum(-1).mean(0)
        return (KL - R_x - R_c - R_y).sum() / (n_batch * (nd_x + nd_c + nd_y))

    curve = []
    for _ in range(n_iter):
        opt.zero_grad()
        idx = torch.multinomial(torch.ones(n_train), n_batch, replacement=False)
        loss = loss_fn(x[idx], c[idx], y[idx], n_mc)
        loss.backward()
        opt.step()
        curve.append(float(loss.detach()))
    return np.asarray(curve)


def train_jax(x, c, y, xv, cv, yv, n_iter, seed=0):
    import jax
    import jax.numpy as jnp

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.train import setup_model
    from dpivae_tpu.train.train import get_train_fn

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=n_iter, patience=10**9
    )
    model = setup_model(cfg, case, (x, c, y))
    from dpivae_tpu.utils import on_host_cpu

    with on_host_cpu():
        params = jax.tree.map(
            np.asarray, model.init(jax.random.PRNGKey(seed))
        )
    fn = get_train_fn(cfg, case)
    state, logs = fn(
        params, jax.random.PRNGKey(seed + 1), (x, c, y), (xv, cv, yv),
        jnp.asarray(cfg.lambda_g0),
    )
    return np.asarray(logs.train[:, 0])


def smooth(v, w=101):
    k = np.ones(w) / w
    return np.convolve(v, k, mode="valid")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_iter", type=int, default=2000)
    parser.add_argument("--plot", default=None)
    args = parser.parse_args()

    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.utils import on_host_cpu
    from dpivae_tpu.utils.data import sample_response

    case = get_case("simple_beam")
    with on_host_cpu():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dtr = jax.tree.map(
            lambda a: np.asarray(a),
            sample_response(case, k1, 1024, sample_dist=case.gt_dist())[:3],
        )
        dva = jax.tree.map(
            lambda a: np.asarray(a),
            sample_response(case, k2, 512, sample_dist=case.gt_dist())[:3],
        )

    jax_curve = train_jax(*dtr, *dva, args.n_iter)
    torch_curve = train_torch(*dtr, args.n_iter)

    s_j, s_t = smooth(jax_curve), smooth(torch_curve)
    tail_j = float(np.mean(jax_curve[-200:]))
    tail_t = float(np.mean(torch_curve[-200:]))
    max_gap = float(np.max(np.abs(s_j - s_t)))
    print(json.dumps({
        "metric": "elbo_curve_parity_beam_s",
        "n_iter": args.n_iter,
        "final_elbo_jax": round(tail_j, 4),
        "final_elbo_torch": round(tail_t, 4),
        "final_gap": round(abs(tail_j - tail_t), 4),
        "max_smoothed_gap": round(max_gap, 4),
    }))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(jax_curve, alpha=0.25, color="tab:blue")
        ax.plot(torch_curve, alpha=0.25, color="tab:red")
        ax.plot(np.arange(len(s_j)) + 50, s_j, color="tab:blue",
                label="dpivae_tpu (JAX)")
        ax.plot(np.arange(len(s_t)) + 50, s_t, color="tab:red",
                label="torch reference loop")
        ax.set_xlabel("iteration")
        ax.set_ylabel("normalized train ELBO")
        ax.legend()
        ax.grid()
        fig.tight_layout()
        fig.savefig(args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
