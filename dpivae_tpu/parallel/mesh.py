"""Mesh construction and sharded training-step builders.

Pure jax.sharding recipe: pick a mesh, annotate in/out shardings, let XLA
insert the collectives (scaling-book style). No NCCL/MPI translation — the
reference has no distributed layer to translate (SURVEY.md §2).

The FULL trainer is data-parallel through ``train.build_train_fn(...,
mesh=...)`` / ``train_model(..., mesh=...)`` (scripts expose
``--n_devices``): every scan-step minibatch and the validation pass carry a
``dp``-axis sharding constraint and XLA derives the gradient all-reduces.
``sharded_train_step`` below is the minimal single-step form of the same
recipe (used for isolated benchmarking and as the building block reference).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpivae_tpu.cases import Case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models.vae import DPIVAE
from dpivae_tpu.train.optim import make_optimizer


def make_mesh(
    n_devices: Optional[int] = None, axes: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With one axis the mesh is 1-D over all requested devices; pass ``shape``
    to factorize (e.g. axes=("sweep", "dp"), shape=(2, 4)).

    Single-host (single-process) only, by explicit guard: the trainer and
    sweep engine feed *whole* host arrays into jitted programs, which is
    only correct when one process owns every addressable device. On a
    multi-host pod slice (``jax.process_count() > 1`` after
    ``jax.distributed.initialize``) each process sees only its local chips
    via ``jax.devices()``-slicing, so silently proceeding would build a
    per-host mesh and train disjoint replicas that never synchronize.
    Scaling beyond one host needs ``jax.make_array_from_process_local_data``
    feeding — see docs/PERFORMANCE.md "Multi-host boundary".
    """
    if jax.process_count() > 1:
        raise NotImplementedError(
            f"make_mesh is single-host only (this is process "
            f"{jax.process_index()} of {jax.process_count()}): dpivae_tpu "
            "feeds whole host arrays into its jitted programs, which is "
            "incorrect under multi-controller JAX. A single v5e host "
            "(8 chips) covers every shipped workload; for pod slices, use "
            "parallel.make_global_mesh() and feed per-process shards with "
            "parallel.feed_process_local() (docs/PERFORMANCE.md "
            "'Multi-host boundary')."
        )
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return _mesh_from_devices(devices, axes, shape)


def _mesh_from_devices(devices, axes, shape) -> Mesh:
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"shape {shape} does not cover {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def make_global_mesh(
    axes: Sequence[str] = ("dp",), shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over ALL devices of the (possibly multi-process) job.

    The pod-slice counterpart of ``make_mesh``: call
    ``jax.distributed.initialize()`` on every process first, then this on
    every process — ``jax.devices()`` returns the *global* device list
    once initialized, so all processes build the identical mesh. Unlike
    ``make_mesh`` there is no ``n_devices`` slice (a subset of a global
    mesh would strand other processes' chips) and no single-host guard:
    under one process this degenerates to ``make_mesh()`` over all local
    devices.

    Feed data with ``feed_process_local`` — under multi-controller JAX a
    whole host array passed into a jitted program is no longer correct
    (each process would contribute its own full copy).

    The jitted programs themselves (``train.build_train_fn(mesh=...)``,
    ``sweep.train_sweep(mesh=...)``) are already SPMD: sharding
    annotations and XLA collectives do not change between the single- and
    multi-host cases; only mesh construction and array feeding do.
    """
    return _mesh_from_devices(jax.devices(), axes, shape)


def feed_process_local(sharding, host_array):
    """Build a global device array from each process's LOCAL shard.

    ``sharding`` is a ``NamedSharding`` (e.g. ``NamedSharding(mesh,
    P("dp"))``) over a ``make_global_mesh()`` mesh; ``host_array`` is
    this process's contiguous slice of the global batch/member axis —
    global_shape[0] / process_count rows per process, in process order.
    Returns a committed ``jax.Array`` with the GLOBAL shape that jitted
    programs accept under multi-controller JAX.

    Thin, tested wrapper over ``jax.make_array_from_process_local_data``
    (single-process it equals a plain ``device_put``, pinned by
    tests/test_parallel.py); exists so the docs/PERFORMANCE.md pod-slice
    recipe is two library calls instead of hand-written array plumbing::

        mesh = parallel.make_global_mesh(("sweep", "dp"), shape=(4, 4))
        sh = NamedSharding(mesh, P("dp"))
        batch = parallel.feed_process_local(sh, local_rows)
    """
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(host_array)
    )


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place arrays with their leading (batch) dim sharded over ``axis``."""
    return jax.tree.map(
        lambda a: jax.device_put(
            jnp.asarray(a),
            NamedSharding(mesh, P(axis, *([None] * (jnp.ndim(a) - 1)))),
        ),
        batch,
    )


def replicated(mesh: Mesh, tree):
    """Place a pytree fully replicated over the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P())),
        tree,
    )


def sharded_train_step(
    config: TrainConfig,
    model: DPIVAE,
    case: Case,
    mesh: Mesh,
    dp_axis: str = "dp",
):
    """Build a data-parallel jitted train step over ``mesh``.

    Batch arrives sharded over ``dp_axis``; params/optimizer state are
    replicated. The loss sums over the (global) batch, so XLA derives the
    cross-chip grad all-reduce from the sharding annotations.

    Returns (step_fn, init_fn, place):
        step_fn(params, opt_state, key, batch, grl_alpha, betas=(1,1,1))
            -> (params, opt_state, loss); ``betas`` are the (possibly
            annealed) beta_x/beta_c/beta_y multipliers — callers running a
            schedule evaluate it per step and pass the values in.
        init_fn(params) -> opt_state
        place(params, batch) -> sharded (params, batch)
    """
    tx = make_optimizer(config, model.init(jax.random.PRNGKey(0)))
    denom = config.n_batch * (case.nd_x + case.nd_y + case.nd_c)

    def loss_fn(params, key, batch, grl_alpha, betas):
        x, c, y = batch
        bx, bc, by = betas
        loss, *_ = model.loss(
            params,
            key,
            x,
            c,
            y,
            n=config.n_mc_train,
            grl_alpha=grl_alpha,
            beta_x=bx,
            beta_c=bc,
            beta_y=by,
            alpha_x=config.alpha_x,
            alpha_c=config.alpha_c,
            alpha_y=config.alpha_y,
        )
        return jnp.sum(loss) / denom

    grad_fn = jax.value_and_grad(loss_fn)

    data_sh = NamedSharding(mesh, P(dp_axis))

    @jax.jit
    def step_fn(params, opt_state, key, batch, grl_alpha, betas=(1.0, 1.0, 1.0)):
        value, grads = grad_fn(params, key, batch, grl_alpha, betas)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, value

    def init_fn(params):
        return replicated(mesh, tx.init(params))

    def place(params, batch):
        return (
            replicated(mesh, params),
            jax.tree.map(
                lambda a: jax.device_put(jnp.asarray(a), data_sh), batch
            ),
        )

    return step_fn, init_fn, place
