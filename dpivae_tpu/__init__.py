"""DPI-VAE TPU: a TPU-native JAX framework for physics-informed adversarially
disentangled variational autoencoders.

Re-implements the capabilities of the DPI-VAE reference (arXiv:2506.13658,
reference code layout described in SURVEY.md) as an idiomatic JAX/XLA stack:

- ``dpivae_tpu.utils``    — pure-functional bijectors, distributions, schedules,
  metrics, data generation (ref: utils/ of the reference).
- ``dpivae_tpu.ops``      — core differentiable ops: gradient-reversal
  (jax.custom_vjp), full-covariance MVN sampling/log-density kernels.
- ``dpivae_tpu.models``   — functional params-pytree modules: encoders,
  decoders, surrogate MLPs, and the DPIVAE model itself (ref: models/).
- ``dpivae_tpu.physics``  — analytic physics models as pure jnp functions
  (ref: cases/*/simple_beam_model.py, mass_spring.py).
- ``dpivae_tpu.cases``    — declarative case studies (simple_beam,
  damped_oscillator, bridge) with imported frozen surrogates (ref: cases/).
- ``dpivae_tpu.train``    — fused on-device training: the full optimization
  loop (batching, annealing, validation, early stopping) compiles to a single
  XLA program via lax.scan (ref: dpivae.py:train_model).
- ``dpivae_tpu.eval``     — evaluation, sklearn comparison baselines, the
  disentanglement metric (ref: dpivae.py:evaluate_model/run_comparison/
  disentanglement_metric).
- ``dpivae_tpu.sweep``    — vmap-batched + mesh-sharded multi-seed/multi-λ
  sweeps replacing the reference's serial loops (ref: 1_disentanglement_
  metric.py, 2_regression_comparison.py).
- ``dpivae_tpu.viz``      — the plotting suite (ref: utils/visualization.py).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Matmul precision: TPU-native bf16 MXU passes ("default") are the package
# default. Measured (round 2, 12-member oscillator sweep, full 20k iters):
# converged val ELBOs are statistically identical to full-f32 "highest"
# passes, while training runs 1.3x faster single-run (15.2k vs 11.6k
# steps/s) and 1.9x faster in vmapped sweeps (39.7k vs 20.8k member-steps/s
# — sweeps are arithmetic-bound, so the 6x-pass f32 emulation is pure
# cost). Per-step numerics drift ~1e-2 vs the f32 torch reference; code
# that needs matched numerics (benchmarks/curve_parity.py; CPU tests are
# unaffected — XLA:CPU is always f32) pins DPIVAE_MATMUL_PRECISION=highest.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("DPIVAE_MATMUL_PRECISION", "default"),
)

# Optional fast PRNG: DPIVAE_PRNG=rbg is TPU-hardware-friendly and measured
# +12% end-to-end training throughput with identical convergence — but rbg
# streams are NOT batch-shape-independent under vmap (member results then
# depend on sweep chunk size), so the deterministic threefry stays the
# default.
_prng = _os.environ.get("DPIVAE_PRNG", "threefry2x32")
if _prng != "threefry2x32":
    _jax.config.update("jax_default_prng_impl", _prng)

# Persistent XLA compilation cache: the fused training scans compile in
# tens of seconds (remote-compiled on the TPU tunnel); caching makes every
# rerun of a script/benchmark start instantly. Opt out with
# DPIVAE_COMPILATION_CACHE=0 or redirect with DPIVAE_COMPILATION_CACHE=<dir>.
_cache = _os.environ.get("DPIVAE_COMPILATION_CACHE", "~/.cache/dpivae_tpu_xla")
if (
    _os.environ.get("JAX_PLATFORMS", "") == "cpu"
    or getattr(_jax.config, "jax_platforms", None) == "cpu"
):
    # CPU runs (tests, driver dry-runs — forced via env var OR
    # jax.config.update before this import) skip the cache: XLA:CPU AOT
    # artifacts written for another machine carry mismatched machine
    # features and risk SIGILL on load.
    _cache = "0"
_compilation_cache_dir = None  # resolved dir; utils.cache_guard clears it
if _cache not in ("0", "", "off"):
    _cache = _os.path.expanduser(_cache)
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _compilation_cache_dir = _cache

from dpivae_tpu.config import TrainConfig  # noqa: F401
