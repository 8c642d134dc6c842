"""Device-mesh parallelism.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed,
no DDP — the Lightning Trainer is never used). The TPU-native scaling story
is therefore at the levels where the reference is serial and slow
(SURVEY.md §5):

- **dp**: shard the batch across chips inside one training step; params stay
  replicated and XLA inserts the gradient all-reduce from the sharding
  annotations alone (no hand-written collectives).
- **sweep**: shard vmapped sweep members (multi-seed / multi-λ trainings,
  the 66- and 48-run grids of scripts 1-2) across chips — embarrassingly
  parallel, ICI only ever carries scalar metrics.
"""

from dpivae_tpu.parallel.mesh import (  # noqa: F401
    feed_process_local,
    make_global_mesh,
    make_mesh,
    replicated,
    shard_batch,
    sharded_train_step,
)
