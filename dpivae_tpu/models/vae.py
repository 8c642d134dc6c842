"""DPIVAE: the physics-informed adversarially-disentangled VAE.

Functional rebuild of reference models/vae.py. ``DPIVAE`` is a static
configuration object; all state lives in a params pytree with one top-level
entry per trainable module::

    params = {
      "encoder", ["encoder_c", "encoder_y"],      # S: one; P: three
      "prior_net_c", "prior_net_y",
      "decoder_x", "decoder_c", "decoder_y",
      "log_sigma_x",                               # learned global noise
    }

Every method is pure: RNG keys and the (annealed) GRL strength are explicit
arguments, so the whole loss jits into one fused XLA program and vmaps
across sweep members.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dpivae_tpu.models import decoders, encoders
from dpivae_tpu.ops.mvn import mvn_log_prob
from dpivae_tpu.utils import GAUSSIAN_CONST
from dpivae_tpu.utils.distributions import MarginalDistribution


def _normal_log_prob(x, loc, scale):
    zn = (x - loc) / scale
    return -0.5 * zn * zn + GAUSSIAN_CONST - jnp.log(scale)


@dataclasses.dataclass
class DPIVAE:
    """Static model configuration (ref: models/vae.py:9-70).

    Attributes mirror the reference constructor; ``prior_x`` is the fixed
    marginal prior on z_x, ``physics_model`` the frozen partial physics
    (analytic fn or frozen surrogate closure), and the transforms are fitted
    input scalers / encoder output squashes built by ``train.setup``.
    """

    prior_x: MarginalDistribution
    physics_model: Callable[[jnp.ndarray], jnp.ndarray]
    nz_x: int
    nz_c: int
    nz_y: int
    nd_x: int
    nd_c: int
    nd_y: int
    idx_c_phys: Tuple[int, ...]
    model_type: str  # "P" | "S"
    full_cov_prior: bool = False
    lambda_x: Optional[float] = None
    encoder_layers: Tuple[int, ...] = (64,)  # P-mode per-block encoders
    encoder_layers_s: Tuple[int, ...] = (128,)  # S-mode joint encoder
    # Encoder architectures: "NN" (MLP trunk) or "CNN" (Conv1d trunk; the
    # reference stubs this — ref dpivae.py:198-199, commented out)
    encoder_x_arch: str = "NN"
    encoder_c_arch: str = "NN"
    encoder_y_arch: str = "NN"
    ch_in: int = 1
    ch_out: int = 16
    ch_latent: int = 64
    prior_net_layers: Tuple[int, ...] = (64,)
    decoder_aux_layers: Tuple[int, ...] = (64,)
    decoder_x_hidden: int = 128
    transform_x: Optional[object] = None
    transform_c: Optional[object] = None
    transform_y: Optional[object] = None
    output_transform_zx: Optional[object] = None  # squash for z_x
    # Stored-but-unused, replicating the reference exactly: the reference
    # keeps self.jitter=1e-6 (ref: models/vae.py:32,56) but every encoder
    # forward uses its own jitter=1e-8 default (ref: models/encoders.py:
    # 33,60,121), and so do ours (encoders.py). Changing the effective
    # value would break the golden loss/gradient parity tests.
    jitter: float = 1e-6
    # Opt-in pallas fused kernel for the data-driven decoder branch
    use_pallas: bool = False
    # Mixed precision for the decode path: None (f32, the parity default)
    # or "bfloat16" — decoder/physics MLPs run in bf16 over the
    # n_mc*n_batch rows, outputs return to f32 for the loss. Encoder,
    # MVN sampling/log-probs, reductions and params stay f32 (gradients
    # accumulate in f32 through the casts). See config.TrainConfig.
    compute_dtype: Optional[str] = None
    # Rematerialize decode in the backward pass (jax.checkpoint around
    # the decoder/physics MLPs): trades recompute FLOPs for the HBM
    # round-trip of the (n_mc*n_batch, width) saved activations.
    remat_decode: bool = False
    # Chunk the MC axis of the LOSS's decode: lax.scan over n/mc_chunk
    # chunks so the per-chunk (mc_chunk*n_batch, width) working set stays
    # VMEM-resident past the mc64 residency cliff (docs/PERFORMANCE.md
    # "The MC-axis collapse"). Exact (equal chunks, mean-of-sums); the
    # encoder/KL run on the full MC axis (tiny latents), only the decode
    # and reconstruction terms scan. forward/sample are untouched.
    mc_chunk: Optional[int] = None

    def __post_init__(self):
        if self.model_type not in ("P", "S"):
            raise ValueError(f"Invalid model_type {self.model_type}")

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        """Build the params pytree (module wiring per ref dpivae.py:89-283)."""
        (
            k_enc,
            k_enc_c,
            k_enc_y,
            k_pc,
            k_py,
            k_dx,
            k_dc,
            k_dy,
        ) = jax.random.split(key, 8)

        prior_init = (
            encoders.full_cov_nn_init
            if self.full_cov_prior
            else encoders.factorized_nn_init
        )

        params = {
            "prior_net_c": prior_init(
                k_pc, self.nz_c, self.nd_c, list(self.prior_net_layers)
            ),
            "prior_net_y": prior_init(
                k_py, self.nz_y, self.nd_y, list(self.prior_net_layers)
            ),
            "decoder_x": decoders.grad_rev_additive_init(
                k_dx, self.nz_c + self.nz_y, self.nd_x, self.decoder_x_hidden
            ),
            "decoder_c": decoders.decoder_init(
                k_dc, self.nz_c, self.nd_c, list(self.decoder_aux_layers)
            ),
            "decoder_y": decoders.decoder_init(
                k_dy, self.nz_y, self.nd_y, list(self.decoder_aux_layers)
            ),
            # Learned global observation-noise scalar (ref: models/vae.py:70)
            "log_sigma_x": jnp.asarray(0.0, jnp.float32),
        }

        def enc_init(k, arch, n_latent, layers):
            if arch == "CNN":
                return encoders.cnn_encoder_init(
                    k, n_latent, self.nd_x,
                    ch_in=self.ch_in, ch_out=self.ch_out,
                    ch_latent=self.ch_latent,
                )
            return encoders.full_cov_nn_init(k, n_latent, self.nd_x, layers)

        if self.model_type == "S":
            nz = self.nz_x + self.nz_c + self.nz_y
            params["encoder"] = enc_init(
                k_enc, self.encoder_x_arch, nz, list(self.encoder_layers_s)
            )
        else:  # "P": three per-block encoders over the same x
            params["encoder"] = enc_init(
                k_enc, self.encoder_x_arch, self.nz_x, list(self.encoder_layers)
            )
            params["encoder_c"] = enc_init(
                k_enc_c, self.encoder_c_arch, self.nz_c, list(self.encoder_layers)
            )
            params["encoder_y"] = enc_init(
                k_enc_y, self.encoder_y_arch, self.nz_y, list(self.encoder_layers)
            )
        return params

    # ------------------------------------------------------------------
    # Forward components
    # ------------------------------------------------------------------
    def transform_inputs(self, x=None, c=None, y=None):
        """Standardize provided modalities (ref: models/vae.py:72-97)."""
        x_t = c_t = y_t = None
        if x is not None:
            x_t = self.transform_x.forward(x)[0] if self.transform_x else x
        if c is not None:
            c_t = self.transform_c.forward(c)[0] if self.transform_c else c
        if y is not None:
            y_t = self.transform_y.forward(y)[0] if self.transform_y else y
        return x_t, c_t, y_t

    def prior_net(self, params, c, y=None):
        """Learned conditional priors p(z_c|c), p(z_y|y) on transformed
        inputs (ref: models/vae.py:99-110)."""
        _, c_t, y_t = self.transform_inputs(c=c, y=y)
        loc_c, tril_c = encoders.gaussian_head_apply(
            params["prior_net_c"], c_t, self.nz_c
        )
        if y is not None:
            loc_y, tril_y = encoders.gaussian_head_apply(
                params["prior_net_y"], y_t, self.nz_y
            )
        else:
            loc_y, tril_y = None, None
        return loc_c, tril_c, loc_y, tril_y

    def sample_prior(self, params, key, c, y, n: int = 1):
        """Sample z_c ~ p(z_c|c), z_y ~ p(z_y|y) with densities
        (ref: models/vae.py:112-123)."""
        k_c, k_y = jax.random.split(key)
        loc_c, tril_c, loc_y, tril_y = self.prior_net(params, c, y=y)
        zc, dens_zc = encoders.gaussian_encoder_sample(k_c, loc_c, tril_c, n)
        zy, dens_zy = encoders.gaussian_encoder_sample(k_y, loc_y, tril_y, n)
        return zc, dens_zc, zy, dens_zy

    def encode(self, params, key, x, n: int = 1):
        """Sample latents from q(z|x) (ref: models/vae.py:125-151).

        S: one joint encoder, squash on the z_x slice, split by dims.
        P: three encoders over the same x; total density is the sum.
        """
        if self.model_type == "S":
            nz = self.nz_x + self.nz_c + self.nz_y
            loc, tril = encoders.gaussian_head_apply(params["encoder"], x, nz)
            z, dens_z = encoders.gaussian_encoder_sample(
                key, loc, tril, n, output_transform=self.output_transform_zx
            )
            zx = z[..., : self.nz_x]
            zc = z[..., self.nz_x : self.nz_x + self.nz_c]
            zy = z[..., self.nz_x + self.nz_c :]
        else:
            k_x, k_c, k_y = jax.random.split(key, 3)
            loc_x, tril_x = encoders.gaussian_head_apply(
                params["encoder"], x, self.nz_x
            )
            loc_c, tril_c = encoders.gaussian_head_apply(
                params["encoder_c"], x, self.nz_c
            )
            loc_y, tril_y = encoders.gaussian_head_apply(
                params["encoder_y"], x, self.nz_y
            )
            zx, dens_zx = encoders.gaussian_encoder_sample(
                k_x, loc_x, tril_x, n, output_transform=self.output_transform_zx
            )
            zc, dens_zc = encoders.gaussian_encoder_sample(k_c, loc_c, tril_c, n)
            zy, dens_zy = encoders.gaussian_encoder_sample(k_y, loc_y, tril_y, n)
            dens_z = dens_zx + dens_zc + dens_zy
        return zx, zc, zy, dens_z

    def decode(self, params, zx_in, zc, zy, grl_alpha=None):
        """(ref: models/vae.py:153-158)

        With ``remat_decode`` the whole decode is a ``jax.checkpoint``
        region: the backward pass recomputes the (rows, width) decoder/
        physics activations from the (tiny) latents instead of reading
        them back from HBM. With ``compute_dtype`` the decoder params and
        latents are cast for the MLP math and the outputs return to f32
        (see the field docs above; both are exact no-ops at defaults).
        """
        fn = self._decode_impl
        if self.remat_decode:
            fn = jax.checkpoint(fn)
        return fn(params, zx_in, zc, zy, grl_alpha)

    def _decode_impl(self, params, zx_in, zc, zy, grl_alpha):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        dec_x = params["decoder_x"]
        dec_c = params["decoder_c"]
        dec_y = params["decoder_y"]
        if dt is not None:
            cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, dt), t)
            dec_x, dec_c, dec_y = cast(dec_x), cast(dec_c), cast(dec_y)
            zx_in = jnp.asarray(zx_in, dt)
            zc = jnp.asarray(zc, dt)
            zy = jnp.asarray(zy, dt)
        xh_p, xh_d = decoders.grad_rev_additive_apply(
            dec_x,
            zx_in,
            jnp.concatenate((zc, zy), axis=-1),
            self.physics_model,
            grl_alpha=grl_alpha,
            use_pallas=self.use_pallas,
        )
        yh, log_sigma_y = decoders.decoder_apply(dec_y, zy, self.nd_y)
        ch, log_sigma_c = decoders.decoder_apply(dec_c, zc, self.nd_c)
        out = (xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y)
        if dt is not None:
            out = tuple(jnp.asarray(a, jnp.float32) for a in out)
        return out

    def _encode_latents(self, params, key, x, c, cond: bool, n: int):
        """Shared encode half of ``forward``: latents, their density, and
        the decoder_x input with physical covariates concatenated
        (ref: models/vae.py:160-172)."""
        k_enc, k_prior = jax.random.split(key)
        x_t, c_t, _ = self.transform_inputs(x=x, c=c)
        zx, zc, zy, dens_z = self.encode(params, k_enc, x_t, n=n)

        if cond:
            loc_c, tril_c = encoders.gaussian_head_apply(
                params["prior_net_c"], c_t, self.nz_c
            )
            zc, _ = encoders.gaussian_encoder_sample(k_prior, loc_c, tril_c, n)

        # Concatenate raw physical covariates to z_x, tiled over the MC axis
        # (ref: models/vae.py:169-172). idx_c_phys == () means no-op.
        if self.idx_c_phys:
            c_phys = c[..., jnp.asarray(self.idx_c_phys)]
            c_phys = jnp.broadcast_to(c_phys, (n, *c_phys.shape))
            zx_in = jnp.concatenate((zx, c_phys), axis=-1)
        else:
            zx_in = zx
        return zx, zc, zy, dens_z, zx_in

    def forward(self, params, key, x, c, cond: bool = False, n: int = 1, grl_alpha=None):
        """Full forward pass (ref: models/vae.py:160-175)."""
        zx, zc, zy, dens_z, zx_in = self._encode_latents(params, key, x, c, cond, n)
        xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y = self.decode(
            params, zx_in, zc, zy, grl_alpha=grl_alpha
        )
        return xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y, zx, zc, zy, dens_z

    # ------------------------------------------------------------------
    # Loss and sampling
    # ------------------------------------------------------------------
    def loss(
        self,
        params,
        key,
        x,
        c,
        y,
        n: int = 1,
        beta_x=1.0,
        beta_c=1.0,
        beta_y=1.0,
        alpha_x=1.0,
        alpha_c=1.0,
        alpha_y=1.0,
        grl_alpha=None,
    ):
        """Per-datapoint Monte-Carlo ELBO (ref: models/vae.py:177-231).

        Returns the same 8-tuple as the reference:
        (loss, KL_x, KL_c, KL_y, R_x, R_c, R_y, reg), each of shape (batch,).

        With ``mc_chunk`` set (and < n) the decode + reconstruction terms
        scan over equal MC chunks instead of one (n*batch)-row shot — an
        exact reassociation of the MC means (sum-of-chunk-sums / n) that
        keeps the decode working set VMEM-resident past the mc64
        residency cliff. n must be a multiple of mc_chunk.
        """
        if self.mc_chunk is not None and self.mc_chunk < n:
            if n % self.mc_chunk:
                raise ValueError(
                    f"mc_chunk={self.mc_chunk} must divide the MC sample "
                    f"count n={n} (equal chunks keep the MC mean exact)"
                )
            return self._loss_mc_chunked(
                params, key, x, c, y, n, beta_x, beta_c, beta_y,
                alpha_x, alpha_c, alpha_y, grl_alpha,
            )
        xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y, zx, zc, zy, dens_z = (
            self.forward(params, key, x, c=c, cond=False, n=n, grl_alpha=grl_alpha)
        )
        xh = xh_p + xh_d

        # Priors: fixed marginal on z_x, learned full-cov Gaussians on z_c, z_y
        loc_c, tril_c, loc_y, tril_y = self.prior_net(params, c, y=y)
        log_prior_zx = jnp.sum(self.prior_x.log_prob(zx), axis=-1)
        log_prior_zc = mvn_log_prob(zc, loc_c, tril_c)
        log_prior_zy = mvn_log_prob(zy, loc_y, tril_y)
        log_prior_z = log_prior_zx + log_prior_zc + log_prior_zy

        # Joint-latent MC KL estimate (ref: models/vae.py:207-209)
        KL_x = jnp.mean(dens_z - log_prior_z, axis=0)
        KL_c = jnp.zeros_like(KL_x)
        KL_y = jnp.zeros_like(KL_x)

        # Gaussian reconstruction log-likelihoods (ref: models/vae.py:212-214)
        sigma_x = jnp.exp(params["log_sigma_x"])
        R_x = jnp.mean(jnp.sum(_normal_log_prob(x, xh, sigma_x), axis=-1), axis=0)
        R_c = jnp.mean(
            jnp.sum(_normal_log_prob(c, ch, jnp.exp(log_sigma_c)), axis=-1), axis=0
        )
        R_y = jnp.mean(
            jnp.sum(_normal_log_prob(y, yh, jnp.exp(log_sigma_y)), axis=-1), axis=0
        )

        # Optional magnitude penalty on the data-driven branch
        # (ref: models/vae.py:217-219)
        if self.lambda_x is not None:
            reg = jnp.mean(
                jnp.sum(_normal_log_prob(xh_d, 0.0, self.lambda_x), axis=-1),
                axis=0,
            )
        else:
            reg = jnp.zeros(x.shape[0])

        loss = beta_x * KL_x - alpha_x * R_x - alpha_c * R_c - alpha_y * R_y - reg
        return loss, KL_x, KL_c, KL_y, R_x, R_c, R_y, reg

    def _loss_mc_chunked(
        self, params, key, x, c, y, n, beta_x, beta_c, beta_y,
        alpha_x, alpha_c, alpha_y, grl_alpha,
    ):
        """MC-chunked ELBO: same math as ``loss``, decode scanned.

        The encoder, its MC sampling, and the KL run once on the full MC
        axis — latents are (n, batch, nz<=16), trivially small. Only the
        decode (the (rows, width) MLPs holding all the bytes) and the
        reconstruction sums scan over n/mc_chunk chunks; per-chunk sums
        accumulate in the carry and divide by n at the end, which is the
        same sum/n as ``jnp.mean`` up to summation order.
        """
        mc = self.mc_chunk
        zx, zc, zy, dens_z, zx_in = self._encode_latents(
            params, key, x, c, False, n
        )

        loc_c, tril_c, loc_y, tril_y = self.prior_net(params, c, y=y)
        log_prior_zx = jnp.sum(self.prior_x.log_prob(zx), axis=-1)
        log_prior_zc = mvn_log_prob(zc, loc_c, tril_c)
        log_prior_zy = mvn_log_prob(zy, loc_y, tril_y)
        log_prior_z = log_prior_zx + log_prior_zc + log_prior_zy
        KL_x = jnp.mean(dens_z - log_prior_z, axis=0)
        KL_c = jnp.zeros_like(KL_x)
        KL_y = jnp.zeros_like(KL_x)

        sigma_x = jnp.exp(params["log_sigma_x"])
        n_batch = x.shape[0]
        split = lambda t: t.reshape(n // mc, mc, *t.shape[1:])

        def body(carry, latents):
            zx_ch, zc_ch, zy_ch = latents
            xh_p, xh_d, c_hat, log_sigma_c, yh, log_sigma_y = self.decode(
                params, zx_ch, zc_ch, zy_ch, grl_alpha=grl_alpha
            )
            xh = xh_p + xh_d
            s_Rx = jnp.sum(
                jnp.sum(_normal_log_prob(x, xh, sigma_x), axis=-1), axis=0
            )
            s_Rc = jnp.sum(
                jnp.sum(_normal_log_prob(c, c_hat, jnp.exp(log_sigma_c)), axis=-1),
                axis=0,
            )
            s_Ry = jnp.sum(
                jnp.sum(_normal_log_prob(y, yh, jnp.exp(log_sigma_y)), axis=-1),
                axis=0,
            )
            if self.lambda_x is not None:
                s_reg = jnp.sum(
                    jnp.sum(_normal_log_prob(xh_d, 0.0, self.lambda_x), axis=-1),
                    axis=0,
                )
            else:
                s_reg = jnp.zeros(n_batch)
            return tuple(
                a + b for a, b in zip(carry, (s_Rx, s_Rc, s_Ry, s_reg))
            ), None

        init = tuple(jnp.zeros(n_batch) for _ in range(4))
        (s_Rx, s_Rc, s_Ry, s_reg), _ = jax.lax.scan(
            body, init, (split(zx_in), split(zc), split(zy))
        )
        R_x, R_c, R_y, reg = s_Rx / n, s_Rc / n, s_Ry / n, s_reg / n

        loss = beta_x * KL_x - alpha_x * R_x - alpha_c * R_c - alpha_y * R_y - reg
        return loss, KL_x, KL_c, KL_y, R_x, R_c, R_y, reg

    def sample(self, params, key, x, c, cond: bool = False, n: int = 1, grl_alpha=None):
        """Sample noisy VAE predictions (ref: models/vae.py:233-255)."""
        k_fwd, k_x, k_c, k_y = jax.random.split(key, 4)
        xh_p, xh_d, ch, log_sigma_c, yh, log_sigma_y, zx, zc, zy, dens_z = (
            self.forward(params, k_fwd, x, c, cond=cond, n=n, grl_alpha=grl_alpha)
        )
        sigma_x = jnp.exp(params["log_sigma_x"])
        x_sample = xh_p + xh_d + sigma_x * jax.random.normal(k_x, xh_p.shape)
        c_sample = ch + jnp.exp(log_sigma_c) * jax.random.normal(k_c, ch.shape)
        y_sample = yh + jnp.exp(log_sigma_y) * jax.random.normal(k_y, yh.shape)
        return x_sample, xh_p, xh_d, c_sample, y_sample, zx, zc, zy, dens_z
