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


# Measured decision boundary for ``mc_chunk="auto"``
# (benchmarks/experiments/scaled_arms.py; committed data in
# benchmarks/results/scaled_arms.json, TPU v5e 2026-08-20). The mc64
# collapse is a VMEM residency cliff: once the loss's single-shot decode
# working set (n_mc_train*n_batch rows x width) outgrows VMEM, every
# matmul->matmul edge becomes an HBM round-trip (docs/PERFORMANCE.md
# "The MC-axis collapse"). Chunk-scanning the decode (exact mean-of-sums
# reassociation, loss+grad equality pinned by tests/test_mc_chunk.py)
# wins exactly past the cliff and LOSES below it, where the scan only
# adds serialization:
#   w512_b1024_mc64 (rows*width = 32M, exactly this threshold): mc8 1.31x
#   w1024_b1024_mc64 (67M): mc8 1.55x
#   w256_b1024_mc64 (16.8M): mc8 0.75x  -> below threshold, stay single-shot
# mc8 ~= mc16 everywhere measured (within 2%); auto picks 8 (more VMEM
# headroom as widths grow), falling back to the largest divisor <= 8 of
# both MC counts. The cliff is a property of THIS generation's VMEM size
# and compiler, so on a different TPU device_kind auto warns once and
# keeps the single-shot decode (non-TPU backends pass through: chunking
# is exact and the tiny CPU test shapes never reach the threshold).
_MC_AUTO_MIN_ROWS_X_WIDTH = 32 * 1024 * 1024
_MC_AUTO_CHUNK = 8
_MC_AUTO_DEVICE_KIND = "TPU v5 lite"
_mc_warned_device_kind: set = set()


def _mc_device_kind_matches() -> bool:
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return True
    kind = _jax.devices()[0].device_kind
    if kind == _MC_AUTO_DEVICE_KIND:
        return True
    if kind not in _mc_warned_device_kind:
        _mc_warned_device_kind.add(kind)
        import warnings

        warnings.warn(
            f"mc_chunk='auto': the residency-cliff threshold was measured "
            f"on {_MC_AUTO_DEVICE_KIND!r} but this device is {kind!r}; "
            f"keeping the single-shot decode. Re-run "
            f"benchmarks/experiments/scaled_arms.py on this device and "
            f"update train/setup.py's _MC_AUTO_* constants (or set an "
            f"explicit integer mc_chunk) if chunking wins here."
        )
    return False


def resolve_mc_chunk(config: TrainConfig, d_hidden: int,
                     member_factor: int = 1):
    """Resolve ``mc_chunk="auto"`` to a concrete chunk size or None.

    Chunks only when the TRAINING loss's decode working set
    (``n_mc_train * n_batch`` rows x ``d_hidden``) is at or past the
    measured VMEM residency cliff (module constants above; the chunked
    arm is measured SLOWER below it). The chunk must divide both MC
    counts — the model's one ``mc_chunk`` also scans the validation
    loss (exact there too; the threshold is anchored to the measured
    train-step arms). Returns ``config.mc_chunk`` unchanged when it is
    already None or an explicit int.

    ``member_factor`` counts an extra leading vmapped batch dim that
    multiplies the decode working set — the member count of a sweep
    chunk program (``sweep._resolve_sweep_config`` passes it). MEASURED
    (benchmarks/experiments/sweep_mc_chunk.py, v5e 2026-08-20): the
    same 32M-element boundary transfers to the vmapped regime once
    members are counted in — members*rows*width of 22M runs chunk8 at
    0.73x (overhead), 44M at 1.48x, 128M at 1.81x.
    """
    if config.mc_chunk != "auto":
        return config.mc_chunk
    rows_x_width = (member_factor * config.n_mc_train * config.n_batch
                    * d_hidden)
    if rows_x_width < _MC_AUTO_MIN_ROWS_X_WIDTH:
        return None
    if not _mc_device_kind_matches():
        return None
    for c in range(_MC_AUTO_CHUNK, 1, -1):
        if c >= config.n_mc_train:
            continue  # would not chunk the train loss at all
        if config.n_mc_train % c:
            continue
        if config.n_mc_val > c and config.n_mc_val % c:
            continue  # must also scan the val loss in equal chunks
        return c
    return None


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

    # Resolve mc_chunk BEFORE use_pallas: chunking shrinks the decode op
    # the kernel would replace, so the pallas band is consulted on the
    # per-chunk row count below.
    mc_chunk = resolve_mc_chunk(config, widths.get("decoder_x_hidden", 128))

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
        # (mc_chunk*n_batch) rows per scan step — resolve on that shape
        # (the RESOLVED chunk, so "auto" chunking and the band compose).
        mc_rows = config.n_mc_train
        if mc_chunk is not None:
            mc_rows = min(mc_rows, mc_chunk)
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
        mc_chunk=mc_chunk,
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
