"""Batched multi-member training: vmap over sweep members, sharded over chips.

The reference's metric scripts train 66 (11 λ × 6 seeds) and 48 (6 seeds ×
4 domains × 2 models) models *serially* (SURVEY.md §3.4-3.5) — the real
throughput bottleneck. Here a sweep member is (PRNG key, λ, dataset); the
whole member grid trains as ONE vmapped XLA program, and an optional 1-D
device mesh shards the member axis across chips (members are embarrassingly
parallel; ICI carries nothing but the final gathered results).
"""

from dpivae_tpu.sweep.sweep import (  # noqa: F401
    LATENTS_CHUNK_DEFAULT,
    HyperSweepResult,
    SweepResult,
    auto_chunk_size,
    clean_checkpoint_dir,
    member_step_cost,
    train_hyper_sweep,
    member_datasets,
    export_member,
    export_member_predictor,
    sweep_disentanglement_latents,
    sweep_predict_y,
    sweep_sample,
    train_sweep,
    train_sweep_data,
    warm_disentanglement_latents,
)
