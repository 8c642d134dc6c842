"""vmap/mesh-batched sweep training.

``train_sweep`` turns N independent trainings (the serial loops of reference
1_disentanglement_metric.py:72-126 and 2_regression_comparison.py:117-186)
into one batched device program:

- each member gets its own PRNG key → fresh dataset (sampled on device, as
  the reference resamples per run), fresh init, own training trajectory;
- λ (GRL strength) is a per-member traced scalar — the λ-sweep axis;
- members stack on a leading axis via ``jax.vmap``; with a mesh, that axis
  is sharded over devices with ``NamedSharding`` and XLA partitions the
  whole program (no hand-written collectives).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpivae_tpu.cases import Case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train.setup import make_template_model
from dpivae_tpu.train.train import TrainLogs, build_train_fn
from dpivae_tpu.utils.data import sample_response


class SweepResult(NamedTuple):
    """Stacked results; leading axis = sweep member."""

    params: dict  # each leaf (n_members, ...)
    logs: TrainLogs  # each field (n_members, ...)
    lambdas: jnp.ndarray  # (n_members,)
    keys: jnp.ndarray  # (n_members, 2) member base keys

    @property
    def n_members(self) -> int:
        return int(self.lambdas.shape[0])

    def member_params(self, i: int) -> dict:
        return jax.tree.map(lambda a: a[i], self.params)

    def member_logs(self, i: int) -> TrainLogs:
        return TrainLogs(*jax.tree.map(lambda a: a[i], tuple(self.logs)))


def build_member_fn(config: TrainConfig, case: Case):
    """One sweep member as a pure function ``(key, lambda) -> (params, logs,
    data_keys)``: sample data, init, train. vmap-ready."""
    template = make_template_model(config, case)
    train_fn = build_train_fn(config, case)
    gt_dist = case.gt_dist()

    def member(key, lam):
        k_dtr, k_dva, k_init, k_train = jax.random.split(key, 4)
        data_train = sample_response(
            case, k_dtr, config.n_train, sample_dist=gt_dist
        )
        data_val = sample_response(case, k_dva, config.n_val, sample_dist=gt_dist)
        params = template.init(k_init)
        state, logs = train_fn(
            params, k_train, data_train[:3], data_val[:3], lam
        )
        return state.params, logs

    return member


def train_sweep(
    config: TrainConfig,
    case: Case,
    lambdas: Sequence[float],
    n_runs: int = 1,
    key=None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
) -> SweepResult:
    """Train the full (λ × run) grid as one batched program.

    Args:
        lambdas: GRL strengths; the grid is their cross product with
            ``n_runs`` seeds (ref sweep: 11 λ × 6 runs, 1_disentanglement_
            metric.py:54-56).
        mesh: optional device mesh; the member axis is sharded over
            ``member_axis``. Pad members to a multiple of the axis size for
            even sharding (done automatically; pads are trained and dropped).

    Returns:
        SweepResult with leading member axis ordered λ-major
        (member = i_lambda * n_runs + i_run).
    """
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    lambdas = jnp.asarray(np.repeat(np.asarray(lambdas, np.float32), n_runs))
    n_members = lambdas.shape[0]
    keys = jax.random.split(key, n_members)

    n_pad = 0
    if mesh is not None:
        axis_size = mesh.shape[member_axis]
        n_pad = (-n_members) % axis_size
        if n_pad:
            lambdas = jnp.concatenate([lambdas, lambdas[-1:].repeat(n_pad)])
            keys = jnp.concatenate([keys, keys[-n_pad:]])

    member = build_member_fn(config, case)
    batched = jax.vmap(member)

    if mesh is not None:
        sharding = NamedSharding(mesh, P(member_axis))
        keys = jax.device_put(keys, sharding)
        lambdas = jax.device_put(lambdas, sharding)
        batched = jax.jit(batched, in_shardings=(sharding, sharding))
    else:
        batched = jax.jit(batched)

    params, logs = batched(keys, lambdas)
    if n_pad:
        trim = lambda a: a[:n_members]
        params = jax.tree.map(trim, params)
        logs = TrainLogs(*jax.tree.map(trim, tuple(logs)))
        lambdas = lambdas[:n_members]
        keys = keys[:n_members]
    return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)
