"""Typed run configuration.

The reference abuses argparse as a de-facto dataclass (reference
utils/__init__.py:17-116) and overlays per-case preset dicts onto
``vars(args)`` (reference 0_single_run.py:39-44). Here the same field names
and defaults live in a frozen dataclass with an explicit ``with_preset``
overlay and JSON snapshotting, so every reference preset applies unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional


@dataclass(frozen=True)
class AnnealingConfig:
    """One annealing schedule spec (ref: utils/__init__.py:76-103)."""

    type: Optional[str] = None  # None | "cyclical" | "sigmoid"
    n_cycles: int = 5
    R: float = 0.5
    mu: float = 0.15
    cov: float = 0.15


@dataclass(frozen=True)
class TrainConfig:
    """All run hyperparameters; names/defaults mirror the reference parser
    (reference utils/__init__.py:19-116)."""

    name: str = "default"
    use_seed: bool = False
    seed: int = 123

    # Models
    encoder_x: str = "NN"
    encoder_c: str = "NN"
    encoder_y: str = "NN"
    full_cov_prior: bool = False
    model_type: str = "S"  # "P" | "S" (set by presets)
    nz_c: int = 2
    nz_y: int = 2

    # Data, training and validation
    n_iter: int = 20_000
    n_train: int = 1024
    n_val: int = 512
    n_test: int = 512
    n_batch: int = 64
    n_mc_train: int = 16
    n_mc_val: int = 64
    n_mc_test: int = 512
    val_freq: int = 10

    # Disentanglement
    lambda_g0: float = 1 / 256
    beta_x0: float = 1.0
    beta_c0: float = 1.0
    beta_y0: float = 1.0
    lambda_x: Optional[float] = None
    alpha_x: float = 1.0
    alpha_c: float = 1.0
    alpha_y: float = 1.0

    # Optimization
    lr: float = 1e-3
    lr_e: float = 1e-3
    lr_ex: float = 1e-3
    lr_ec: float = 1e-3
    lr_ey: float = 1e-3
    lr_p: float = 1e-3
    lr_dx: float = 1e-3
    lr_dc: float = 1e-3
    lr_dy: float = 1e-3
    lr_sigma: float = 5e-3
    wd_e: float = 0.0
    wd_p: float = 0.0
    wd_dx: float = 0.0
    wd_dc: float = 0.0
    wd_dy: float = 0.0
    wd_sigma: float = 0.0
    clip_gradients: bool = False
    max_grad_norm: float = 1.0
    patience: int = 200
    min_delta: float = 0.001

    # Annealing (four independent schedules: λ, β_x, β_c, β_y)
    lambda_annealing: Optional[str] = None
    lambda_n_cycles: int = 5
    lambda_R: float = 0.5
    lambda_mu: float = 0.15
    lambda_cov: float = 0.15
    beta_x_annealing: Optional[str] = None
    beta_x_n_cycles: int = 5
    beta_x_R: float = 0.5
    beta_x_mu: float = 0.15
    beta_x_cov: float = 0.15
    beta_c_annealing: Optional[str] = None
    beta_c_n_cycles: int = 5
    beta_c_R: float = 0.5
    beta_c_mu: float = 0.15
    beta_c_cov: float = 0.15
    beta_y_annealing: Optional[str] = None
    beta_y_n_cycles: int = 4
    beta_y_R: float = 0.5
    beta_y_mu: float = 0.2
    beta_y_cov: float = 0.2

    # Plotting
    n_skip_plot_train: int = 0
    n_skip_plot_val: int = 0
    n_plot: int = 2000
    n_interp: int = 5

    # Unused CNN channel params kept for preset compatibility
    ch_in: int = 1
    ch_out: int = 16
    ch_latent: int = 64

    # Framework extensions (no reference equivalent)
    # Fused pallas kernel for the data-driven decoder branch:
    # False | True | "auto". The default "auto" selects the kernel only
    # inside the measured-and-repeat-confirmed win band from the scaling
    # study (65k decoder rows x hidden 256, full program 1.14x faster;
    # everywhere else — including every reference shape — it resolves to
    # the XLA path; see ops/pallas_mlp.py:auto_select and
    # benchmarks/results/scaling.json).
    use_pallas: Any = "auto"
    # Override EVERY MLP trunk width in the model (encoder trunk(s),
    # decoder_x hidden, prior nets, aux decoders). None keeps the
    # reference architecture (64/128 — ref cases/*/__init__.py presets);
    # the scaling study (benchmarks/experiments/scaling.py) sweeps this.
    hidden_width: Optional[int] = None
    # Mixed precision for the DECODE path (the decoder/physics MLPs over
    # n_mc*n_batch rows — where all the bytes are at scaled shapes, see
    # benchmarks/results/scaling.json): None keeps f32 everywhere (the
    # reference-parity default); "bfloat16" casts the decode-path params
    # and latents to bf16 for the forward/backward and returns f32
    # outputs to the loss (params/optimizer/encoder/MVN stay f32).
    compute_dtype: Optional[str] = None
    # Rematerialize the decode path (jax.checkpoint): the backward pass
    # recomputes the (n_mc*n_batch, width) decoder/physics activations
    # instead of reading them back from HBM — a bytes-for-FLOPs trade
    # that pays exactly where the scaling grid is HBM-bound.
    remat_decode: bool = False
    # Chunk the MC axis of the LOSS's decode (lax.scan over chunks of
    # mc_chunk samples, exact mean-of-sums): the diagnosed mc64 collapse
    # (docs/PERFORMANCE.md "The MC-axis collapse") is a VMEM residency
    # cliff — the (n_mc*n_batch, width) decode activations outgrow VMEM
    # and every matmul->matmul edge becomes an HBM round-trip. Chunking
    # keeps the per-chunk working set resident. None keeps the
    # single-shot decode; an int must divide n_mc_train and
    # n_mc_val (it chunks both the train and validation loss; forward/
    # sample/eval paths are untouched). Composes with compute_dtype and
    # remat_decode. "auto" (default) chunks EXACTLY past the measured
    # residency cliff — n_mc_train*n_batch*width >= 32M, where the
    # chunked arm wins 1.31-1.55x and below which it loses 0.75x
    # (benchmarks/results/scaled_arms.json) — and resolves to None at
    # every reference shape and on TPU generations other than the one
    # the cliff was measured on (train.setup resolve_mc_chunk). Sweep
    # trainers apply the same boundary with the vmapped member count
    # folded in (measured 1.48-1.81x past it, 0.73-0.82x below;
    # benchmarks/results/sweep_mc_chunk.json).
    mc_chunk: Any = "auto"

    def __post_init__(self):
        # use_pallas is tri-state; anything else (e.g. the string "false"
        # or "Auto" from a hand-edited config JSON) would silently pass
        # bool(use_pallas) at model build and enable the kernel.
        if self.use_pallas not in (False, True, "auto"):
            raise ValueError(
                f"use_pallas must be False, True or 'auto', got "
                f"{self.use_pallas!r}"
            )
        if self.compute_dtype not in (None, "bfloat16"):
            raise ValueError(
                f"compute_dtype must be None or 'bfloat16', got "
                f"{self.compute_dtype!r}"
            )
        if self.mc_chunk is not None and self.mc_chunk != "auto":
            # bool is an int subclass; True would silently mean chunk=1
            # (a per-sample scan), which is never what a config meant.
            if (not isinstance(self.mc_chunk, int)
                    or isinstance(self.mc_chunk, bool)
                    or self.mc_chunk <= 0):
                raise ValueError(
                    f"mc_chunk must be None, a positive int or 'auto', got "
                    f"{self.mc_chunk!r}"
                )
            for fname in ("n_mc_train", "n_mc_val"):
                v = getattr(self, fname)
                if self.mc_chunk < v and v % self.mc_chunk:
                    raise ValueError(
                        f"mc_chunk={self.mc_chunk} must divide "
                        f"{fname}={v} (the loss scans over equal MC "
                        f"chunks; unequal tails would bias the MC mean)"
                    )
        if self.compute_dtype is not None and self.use_pallas is True:
            # The pallas kernel's parity contract and win band were
            # measured in f32; mixing it with a bf16 decode path would
            # silently change both. Resolve one or the other explicitly.
            raise ValueError(
                "compute_dtype='bfloat16' is not supported together with "
                "use_pallas=True (the kernel band was measured in f32); "
                "set use_pallas=False or 'auto' (auto resolves to the XLA "
                "path when compute_dtype is set)"
            )

    def with_preset(self, preset: Mapping[str, Any]) -> "TrainConfig":
        """Overlay a case preset dict, mirroring the reference's
        ``vars(args).update(preset)`` semantics (ref 0_single_run.py:39-44)."""
        unknown = set(preset) - {f.name for f in dataclasses.fields(self)}
        if unknown:
            raise ValueError(f"Unknown preset keys: {sorted(unknown)}")
        return dataclasses.replace(self, **dict(preset))

    def replace(self, **kwargs: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)

    def annealing(self, which: str) -> AnnealingConfig:
        """Bundle the four flat annealing fields for ``which`` in
        {"lambda", "beta_x", "beta_c", "beta_y"}."""
        prefix = which
        return AnnealingConfig(
            type=getattr(self, f"{prefix}_annealing"),
            n_cycles=getattr(self, f"{prefix}_n_cycles"),
            R=getattr(self, f"{prefix}_R"),
            mu=getattr(self, f"{prefix}_mu"),
            cov=getattr(self, f"{prefix}_cov"),
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls(**json.load(f))
