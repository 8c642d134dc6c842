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
