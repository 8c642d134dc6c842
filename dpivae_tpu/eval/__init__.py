"""Evaluation: VAE test metrics, sklearn comparison baselines, and the
disentanglement metric (ref: dpivae.py:527-703)."""

from dpivae_tpu.eval.evaluate import (  # noqa: F401
    disentanglement_metric,
    evaluate_model,
    fit_disentanglement_probes,
    make_probe_regressor,
    run_comparison,
    sample_latents,
)
from dpivae_tpu.eval.baselines import (  # noqa: F401
    fit_gpr_batched,
    fit_lin_batched,
    fit_mlp_baseline_batched,
    run_comparison_batched,
)
from dpivae_tpu.eval.probes import (  # noqa: F401
    batched_probe_scores,
    fit_linear_probes_batched,
    fit_mlp_probes_batched,
    warm_batched_probes,
)
