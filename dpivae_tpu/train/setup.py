"""Model assembly (ref: dpivae.py:89-283).

``setup_model`` wires the DPIVAE from a config + case definition + training
data: fits input StandardScalers, builds the fixed z_x prior and the encoder
output squash (Logistic -> ShiftScale into the prior bounds), and selects the
P (three per-block encoders) or S (single joint encoder with masked squash)
architecture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.cases import Case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models.vae import DPIVAE
from dpivae_tpu.utils.transforms import (
    Chain,
    Logistic,
    MaskedChain,
    ShiftScale,
    StandardScaler,
)


def setup_model(config: TrainConfig, case: Case, data_train) -> DPIVAE:
    """Assemble the DPIVAE model configuration.

    Args:
        config: run hyperparameters (possibly preset-overlaid).
        case: the case study definition.
        data_train: (x, c, y[, z]) training arrays; scalers are fitted on
            these (ref: dpivae.py:141-146).

    Returns:
        A ``DPIVAE`` config object; call ``.init(key)`` for params.
    """
    x_train, c_train, y_train = data_train[0], data_train[1], data_train[2]

    if x_train.shape[0] != config.n_train:
        raise ValueError(
            f"n_train={config.n_train} but x_train has {x_train.shape[0]} rows"
        )
    if config.n_batch > config.n_train:
        raise ValueError("n_batch must be <= n_train")
    # Prior-dimension consistency (ref: dpivae.py:129-130)
    if case.nz_x != len(case.prior_x):
        raise ValueError("Prior distribution dimension mismatch with ground truth")
    # Encoder architecture selection. The reference only ships "NN" (its
    # CNN branch is commented out, ref dpivae.py:198-199); here "CNN" is a
    # working Conv1d option (models/encoders.py cnn_encoder_init).
    for field in ("encoder_x", "encoder_c", "encoder_y"):
        choice = getattr(config, field)
        if choice not in ("NN", "CNN"):
            raise ValueError(f"Unknown {field} choice: {choice}")

    # Input scalers fitted on the training set
    transform_x = StandardScaler.fit(jnp.asarray(x_train))
    transform_c = StandardScaler.fit(jnp.asarray(c_train))
    transform_y = StandardScaler.fit(jnp.asarray(y_train))

    # Encoder output squash: z in R -> Logistic (0,1) -> ShiftScale [lb, ub]
    # from the z_x prior bounds (ref: dpivae.py:180-187)
    lb = jnp.asarray([p.lb for p in case.prior_x], jnp.float32)
    ub = jnp.asarray([p.ub for p in case.prior_x], jnp.float32)
    squash = Chain(Logistic(k=1.0), ShiftScale(lb, ub))

    if config.model_type == "P":
        output_transform_zx = squash
    elif config.model_type == "S":
        # Squash only the z_x slice of the joint latent
        # (ref: dpivae.py:236-238). The x-type factors occupy the leading
        # indices by case convention; assert rather than assume.
        z_idx_x = case.z_idx_x
        if tuple(z_idx_x) != tuple(range(case.nz_x)):
            raise ValueError(
                "S model expects x-type factors first in the factor table"
            )
        output_transform_zx = MaskedChain(z_idx_x, Logistic(k=1.0), ShiftScale(lb, ub))
    else:
        raise ValueError(f"Unknown model type {config.model_type}")

    # Width override (framework extension): hidden_width=w sets every MLP
    # trunk in the model to width w (scaling studies / wider workloads);
    # None keeps the reference architecture defaults.
    widths = {}
    if config.hidden_width is not None:
        w = int(config.hidden_width)
        widths = dict(
            encoder_layers=(w,),
            encoder_layers_s=(w,),
            prior_net_layers=(w,),
            decoder_aux_layers=(w,),
            decoder_x_hidden=w,
        )

    use_pallas = config.use_pallas
    if use_pallas == "auto" and config.compute_dtype is not None:
        # The kernel's win band and parity contract were measured in f32;
        # a bf16 decode path is a different program. XLA path it is.
        # (Explicit use_pallas=True + compute_dtype already raised in
        # TrainConfig.__post_init__.)
        use_pallas = False
    if use_pallas == "auto":
        from dpivae_tpu.ops.pallas_mlp import auto_select

        # Resolve on the TRAINING shape of the one op the kernel covers —
        # the data-driven decoder branch runs on n_mc_train*n_batch rows
        # inside the loss (models/vae.py decode path). Caveats (perf-only;
        # numerics are guarded by the kernel parity contract): the
        # resolved bool gates EVERY call site, so eval/sample paths at
        # other row counts ride the same choice; and the band was
        # measured on one case family on the device generation pinned in
        # ops/pallas_mlp.py:_AUTO_DEVICE_KIND (auto_select falls back to
        # XLA, with a one-time warning, on a different TPU kind).
        # mc_chunk shrinks the decode op the kernel would replace to
        # (mc_chunk*n_batch) rows per scan step — resolve on that shape.
        mc_rows = config.n_mc_train
        if config.mc_chunk is not None:
            mc_rows = min(mc_rows, config.mc_chunk)
        use_pallas = auto_select(
            rows=mc_rows * config.n_batch,
            d_in=config.nz_c + config.nz_y,
            d_hidden=widths.get("decoder_x_hidden", 128),
            d_out=case.nd_x,
        )

    return DPIVAE(
        prior_x=case.prior_x_dist(),
        physics_model=case.part_model,
        nz_x=case.nz_x,
        nz_c=config.nz_c,
        nz_y=config.nz_y,
        nd_x=case.nd_x,
        nd_c=case.nd_c,
        nd_y=case.nd_y,
        idx_c_phys=case.idx_c_phys,
        model_type=config.model_type,
        full_cov_prior=config.full_cov_prior,
        lambda_x=config.lambda_x,
        encoder_x_arch=config.encoder_x,
        encoder_c_arch=config.encoder_c,
        encoder_y_arch=config.encoder_y,
        ch_in=config.ch_in,
        ch_out=config.ch_out,
        ch_latent=config.ch_latent,
        transform_x=transform_x,
        transform_c=transform_c,
        transform_y=transform_y,
        output_transform_zx=output_transform_zx,
        use_pallas=bool(use_pallas),
        compute_dtype=config.compute_dtype,
        remat_decode=config.remat_decode,
        mc_chunk=config.mc_chunk,
        **widths,
    )


class _UnfittedTransform:
    """Fail-loud sentinel for template-model input transforms.

    ``transform_inputs`` treats None as identity (a legitimate unscaled
    configuration), so a template model with None transforms would
    silently skip standardization instead of erroring. Any use of this
    sentinel raises at trace time."""

    def _raise(self, *a, **k):
        raise RuntimeError(
            "this is a template model (make_template_model): its input "
            "transforms were never fitted to data. Re-derive the fitted "
            "model from the member's dataset (the train/sweep loss path "
            "does this) before calling loss/sample/forward."
        )

    forward = _raise
    inverse = _raise


def make_template_model(config: TrainConfig, case: Case) -> DPIVAE:
    """A DPIVAE with unfitted input transforms — sufficient for ``init``
    (parameter shapes depend only on dims) and optimizer labeling. Sweeps
    use this to initialize members; the loss path re-derives the fitted
    model from each member's traced data."""
    dummy = (
        np.zeros((config.n_train, case.nd_x), np.float32),
        np.zeros((config.n_train, case.nd_c), np.float32) ,
        np.zeros((config.n_train, case.nd_y), np.float32),
    )
    model = setup_model(config, case, dummy)
    # Fitted-on-zeros scalers are degenerate; replace them with a sentinel
    # that raises on use (None would silently mean "identity")
    sentinel = _UnfittedTransform()
    return model.__class__(
        **{
            **model.__dict__,
            "transform_x": sentinel,
            "transform_c": sentinel,
            "transform_y": sentinel,
        }
    )


def init_params(config: TrainConfig, model: DPIVAE, key=None) -> dict:
    """Initialize params, honoring the reference's opt-in seeding
    (ref: dpivae.py:94-95)."""
    if key is None:
        seed = config.seed if config.use_seed else np.random.randint(0, 2**31 - 1)
        key = jax.random.PRNGKey(seed)
    return model.init(key)
