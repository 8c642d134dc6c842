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

import functools
import hashlib
import json
import os
import re
import sys
import time
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpivae_tpu.cases import Case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train.setup import make_template_model
from dpivae_tpu.train.train import TrainLogs, build_train_fn
from dpivae_tpu.utils.data import sample_response
from dpivae_tpu.utils.jit_cache import JitLRU

# Compiled sweep programs keyed by (kind, config, case, ...): repeat sweeps
# (chunk loops, multi-study scripts) must not retrace/re-load per call.
_SWEEP_JIT_CACHE = JitLRU(maxsize=32)


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

    def host(self) -> "SweepResult":
        """Copy every field to host numpy in ONE bulk transfer per array.

        Call this before per-member host processing (CSV writes, row
        loops): on the tunneled TPU backend each eager device slice like
        ``logs.train[i]`` costs a ~1s remote round trip, so looping
        ``member_logs`` over 66 device-resident members costs minutes,
        while the same loop over a host copy is milliseconds (measured
        98s → ~2s for the 66-member study's per-member CSVs).
        """

        def to_np(a):
            if hasattr(a, "dtype") and jnp.issubdtype(
                a.dtype, jax.dtypes.prng_key
            ):
                a = jax.random.key_data(a)
            return np.asarray(a)

        return type(self)(*jax.tree.map(to_np, tuple(self)))


class HyperSweepResult(NamedTuple):
    """Stacked hyperparameter-sweep results; leading axis = member.

    ``grid`` maps each swept config field to its (n_members,) values."""

    params: dict
    logs: TrainLogs
    grid: dict
    lambdas: jnp.ndarray
    keys: jnp.ndarray

    n_members = SweepResult.n_members
    member_params = SweepResult.member_params
    member_logs = SweepResult.member_logs
    host = SweepResult.host

    def member_overrides(self, i: int) -> dict:
        return {k: float(v[i]) for k, v in self.grid.items()}


def train_hyper_sweep(
    config: TrainConfig,
    case: Case,
    grid: dict,
    n_runs: int = 1,
    lambdas=None,
    key=None,
    chunk_size: Union[int, str, None] = "auto",
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
    checkpoint_dir: Optional[str] = None,
    chunk_callback=None,
    gc_stale_chunks: bool = False,
) -> HyperSweepResult:
    """Train a hyperparameter grid as one batched vmapped program.

    The reference has no hyperparameter search at all (its only sweep is
    the λ-grid, trained serially); here any subset of
    ``train.TRACEABLE_HYPER_FIELDS`` (per-group learning rates, weight
    decays, grad-clip norm, β/α loss weights) sweeps as *traced* member
    inputs — one compile for the whole grid, same mechanics as
    ``train_sweep``.

    Args:
        grid: field name -> sequence of per-member values; all sequences
            share one length M. The cross product is the caller's job
            (pass pre-crossed columns) — members are rows, not axes.
        n_runs: seeds per grid row (member = i_row * n_runs + i_run). The
            SAME n_runs run-keys repeat across grid rows, so each seed's
            dataset/init draw is paired across hyperparameter settings —
            grid rankings measure the hyperparameter effect, not
            per-member sampling noise.
        lambdas: optional per-row GRL strengths (default config.lambda_g0).
        mesh: optional device mesh; members shard over ``member_axis``
            (padded to the axis size, pads trained and dropped), with the
            same optional 2-D "dp" batch sharding as ``train_sweep``.
        checkpoint_dir / chunk_callback / gc_stale_chunks: chunk
            persistence/resume, host-side chunk streaming, and opt-in
            orphan GC, exactly as in ``train_sweep`` (chunked non-mesh
            path; the manifest digest covers the hyper grid columns too).

    Returns:
        HyperSweepResult ordered row-major over (grid row, run).
    """
    if gc_stale_chunks and checkpoint_dir is None:
        raise ValueError("gc_stale_chunks requires checkpoint_dir")
    fields = tuple(sorted(grid))
    if not fields:
        raise ValueError("grid must contain at least one field")
    cols = [np.asarray(grid[f], np.float32).reshape(-1) for f in fields]
    n_rows = cols[0].shape[0]
    for f, c in zip(fields, cols):
        if c.shape[0] != n_rows:
            raise ValueError(
                f"grid column {f!r} has {c.shape[0]} values, expected {n_rows}"
            )
    if lambdas is None:
        lam_rows = np.full(n_rows, config.lambda_g0, np.float32)
    else:
        lam_rows = np.asarray(lambdas, np.float32).reshape(-1)
        if lam_rows.shape[0] != n_rows:
            raise ValueError("lambdas must match the grid length")
    # Expand rows by runs (row-major, like train_sweep's λ-major order)
    rep = lambda a: np.repeat(a, n_runs, axis=0)
    cols = [rep(c) for c in cols]
    lam_m = jnp.asarray(rep(lam_rows))
    hyper_m = tuple(jnp.asarray(c) for c in cols)
    n_members = n_rows * n_runs

    if key is None:
        key = jax.random.PRNGKey(config.seed)
    # Paired seeds: tile the same run-keys across rows (see docstring).
    run_keys = jax.random.split(key, n_runs)
    keys = jnp.concatenate([run_keys] * n_rows, axis=0)

    grid_out = dict(zip(fields, cols))
    if mesh is not None:
        if chunk_callback is not None or checkpoint_dir is not None:
            raise ValueError(
                "checkpoint_dir/chunk_callback require the chunked "
                "(non-mesh) path — the mesh path runs as one sharded "
                "program with no chunks"
            )
        # members=None: the per-device decode working set under member/dp
        # sharding is an unmeasured regime — mc_chunk stays single-shot.
        config = _resolve_sweep_config(config)
        use_dp = "dp" in mesh.axis_names and mesh.shape["dp"] > 1
        sharding = NamedSharding(mesh, P(member_axis))
        # Cache the JITTED wrapper (not just the vmap): a per-call
        # jax.jit(...) would rebuild the dispatch wrapper every invocation
        # and lose the C++ fastpath for repeat sweeps.
        batched = _SWEEP_JIT_CACHE.get(
            ("train_hyper_sweep_mesh", config, case.fingerprint(), fields, mesh,
             member_axis),
            lambda: jax.jit(
                jax.vmap(
                    build_member_fn(
                        config, case, hyper_fields=fields,
                        mesh=mesh if use_dp else None,
                    ),
                    spmd_axis_name=member_axis,
                ),
                in_shardings=sharding,
            ),
        )
        axis_size = mesh.shape[member_axis]
        n_pad = (-n_members) % axis_size
        pad_j = lambda a: (
            jnp.concatenate([a, a[-1:].repeat(n_pad, 0)]) if n_pad else a
        )
        put = lambda a: jax.device_put(pad_j(jnp.asarray(a)), sharding)
        params, logs = batched(
            put(keys), put(lam_m), tuple(put(c) for c in hyper_m)
        )
        if n_pad:
            trim = lambda a: a[:n_members]
            params = jax.tree.map(trim, params)
            logs = TrainLogs(*jax.tree.map(trim, tuple(logs)))
        return HyperSweepResult(params, logs, grid_out, lam_m, keys)

    if chunk_size == "auto":
        chunk_size = auto_chunk_size(n_members, config.n_iter, config)
    elif chunk_size is not None:
        _warn_if_over_budget(chunk_size, config.n_iter, config)
    # Resolve on the per-program vmapped member count (the chunk size) —
    # BEFORE anything keyed on config (jit cache, AOT keys, manifest
    # digest, treedef) so every consumer sees the same concrete mc_chunk.
    config = _resolve_sweep_config(
        config, members=min(chunk_size or n_members, n_members))

    def build():
        member = build_member_fn(config, case, hyper_fields=fields)
        return jax.jit(jax.vmap(member))

    batched = _SWEEP_JIT_CACHE.get(
        ("train_hyper_sweep", config, case.fingerprint(), fields), build
    )

    if (
        (chunk_size is None or chunk_size >= n_members)
        and checkpoint_dir is None
        and chunk_callback is None
    ):
        batched = _aot(
            ("train_hyper_sweep", config, case.fingerprint(), fields), batched,
            (keys, lam_m, hyper_m),
        )
        params, logs = batched(keys, lam_m, hyper_m)
        return HyperSweepResult(params, logs, grid_out, lam_m, keys)

    chunk_size = min(chunk_size or n_members, n_members)
    n_pad = (-n_members) % chunk_size
    pad = lambda a: (
        np.concatenate([np.asarray(a), np.asarray(a)[-1:].repeat(n_pad, 0)])
        if n_pad else np.asarray(a)
    )
    keys_h, wrap_keys = _host_keys(keys)
    keys_p = np.concatenate([keys_h, keys_h[-1:].repeat(n_pad, 0)]) \
        if n_pad else keys_h
    lam_p = pad(lam_m)
    hyper_p = tuple(pad(c) for c in hyper_m)
    params, logs = _chunked_execute(
        make_batched=lambda: _aot(
            ("train_hyper_sweep", config, case.fingerprint(), fields), batched,
            lambda: (wrap_keys(keys_p[:chunk_size]), lam_p[:chunk_size],
                     tuple(c[:chunk_size] for c in hyper_p)),
        ),
        slice_args=lambda sl: (
            wrap_keys(keys_p[sl]), lam_p[sl], tuple(c[sl] for c in hyper_p)
        ),
        n_members=n_members,
        chunk_size=chunk_size,
        treedef_thunk=_treedef_thunk(config, case),
        checkpoint_dir=checkpoint_dir,
        chunk_callback=chunk_callback,
        manifest=(
            _sweep_manifest(
                config, case, (keys_p, lam_p, *hyper_p), n_members,
                flavor=("hyper-sweep", fields),
            )
            if checkpoint_dir is not None else None
        ),
        label="hyper-sweep",
        gc_stale_chunks=gc_stale_chunks,
    )
    return HyperSweepResult(params, logs, grid_out, lam_m, keys)


def member_datasets(config: TrainConfig, case: Case, member_key):
    """Replay a sweep member's (train, val) datasets from its base key.

    ``build_member_fn`` derives data keys by splitting the member key; this
    reproduces the identical arrays on demand (e.g. to refit the member's
    input scalers for post-training evaluation) without the sweep having to
    return its datasets.
    """
    k_dtr, k_dva, _, _ = jax.random.split(member_key, 4)
    gt_dist = case.gt_dist()
    data_train = sample_response(case, k_dtr, config.n_train, sample_dist=gt_dist)
    data_val = sample_response(case, k_dva, config.n_val, sample_dist=gt_dist)
    return data_train, data_val


def export_member(
    config: TrainConfig, case: Case, result: SweepResult, i: int, path: str
):
    """Export sweep member ``i`` as a servable checkpoint.

    The study workflow ends with picking a member (best λ, best seed) and
    deploying it; this replays the member's training data from its base
    key (scaler parity with how the member actually trained — the sweep
    loss path refits scalers from that same data in-trace), rebuilds the
    fitted model via ``setup_model``, and writes a
    ``train.checkpoint.save_model`` checkpoint with the member's λ and
    index recorded in the meta sidecar. Restore anywhere with
    ``load_model(path, case)`` — no sweep state needed.

    Returns the (model, params) pair that was saved.
    """
    config = _resolve_sweep_config(config)
    from dpivae_tpu.train.checkpoint import save_model
    from dpivae_tpu.train.setup import setup_model

    member_key = result.keys[i]
    if not jnp.issubdtype(jnp.asarray(member_key).dtype, jax.dtypes.prng_key):
        # host() copies degrade typed keys to raw uint32 key data
        member_key = jax.random.wrap_key_data(jnp.asarray(member_key))
    data_train, _ = member_datasets(config, case, member_key)
    model = setup_model(config, case, jax.tree.map(np.asarray, data_train))
    params = jax.tree.map(np.asarray, result.member_params(i))
    save_model(
        path, model, params, config, case=case,
        extra_meta={"sweep_member": int(i),
                    "lambda": float(np.asarray(result.lambdas[i]))},
    )
    return model, params


def export_member_predictor(
    config: TrainConfig, case: Case, result: SweepResult, i: int, path: str,
    **export_kwargs,
):
    """Export sweep member ``i`` as a portable SERVING artifact
    (``dpivae_tpu.serving.save_predictor``): the member's predict path as
    a self-contained StableHLO program — weights and fitted scalers baked
    in, shape-polymorphic batch, loadable with no sweep/model/case code.
    The member's λ replaces ``lambda_g0`` in the embedded config snapshot
    (GRL is identity in the forward pass, so predictions don't depend on
    it — this is provenance). Extra kwargs pass through to
    ``save_predictor`` (``outputs=``, ``cond=``, ``n=``, ``platforms=``).

    Returns the artifact path.
    """
    config = _resolve_sweep_config(config)
    from dpivae_tpu.serving import save_predictor
    from dpivae_tpu.train.setup import setup_model

    member_key = result.keys[i]
    if not jnp.issubdtype(jnp.asarray(member_key).dtype, jax.dtypes.prng_key):
        member_key = jax.random.wrap_key_data(jnp.asarray(member_key))
    data_train, _ = member_datasets(config, case, member_key)
    model = setup_model(config, case, jax.tree.map(np.asarray, data_train))
    params = jax.tree.map(np.asarray, result.member_params(i))
    cfg_i = config.replace(lambda_g0=float(np.asarray(result.lambdas[i])))
    return save_predictor(path, model, params, cfg_i, case, **export_kwargs)


def _resolve_sweep_config(
    config: TrainConfig, members: Optional[int] = None
) -> TrainConfig:
    """Resolve ``use_pallas="auto"`` to the XLA path for sweep programs.

    MEASURED (benchmarks/experiments/sweep_pallas.py; committed data in
    benchmarks/results/sweep_pallas.json, TPU v5e 2026-08-20): the actual
    vmapped chunk program (``jax.vmap(build_member_fn)``) runs the kernel
    arm 0.53-0.77x AT EVERY CELL of member-chunk {11, 22, 64} x
    hidden_width {reference, 256, 512} — including 64 members x 1024
    rows x hidden 256, the exact effective-row shape of the single-run
    win band. Under vmap the member axis is a batch dimension over the
    custom call, not a fold into one large matmul, so the band's
    fusion/layout win never materializes. "auto" therefore stays on the
    XLA path everywhere in this module — member builds, jit-cache keys,
    treedefs, exports, and the checkpoint manifest digest all see the
    same resolved config. Explicit ``use_pallas=True`` is honored as
    everywhere else (that is the arm the experiment times).

    ``mc_chunk="auto"`` resolves via the measured VMEM-cliff boundary
    with the vmapped member count folded in (MEASURED:
    benchmarks/experiments/sweep_mc_chunk.py timing the actual
    ``jax.vmap(build_member_fn)`` chunk program, committed in
    benchmarks/results/sweep_mc_chunk.json, v5e 2026-08-20 — the
    member axis multiplies the decode working set, so the single-run
    32M-element threshold transfers once ``members`` is counted in:
    members*rows*width of 1.4M/22M total runs chunk8 at 0.80-0.82x/0.73x
    [pure scan overhead below the cliff], 44M at 1.48x, 128M at 1.81x).
    The trainer entry points pass ``members`` = the per-program vmapped
    member count (the resolved chunk size) AFTER resolving it, then hand
    the concrete config to every downstream consumer — member builds,
    jit-cache keys, treedefs, exports, and the checkpoint manifest
    digest all see the same resolved value, and the digest identifies
    the float program that actually trained (chunked and single-shot
    decodes are an exact reassociation but not bitwise-identical
    floats). With ``members=None`` (the default: standalone
    build_member_fn, the mesh paths — per-device working sets under
    member/dp sharding are unmeasured — exports, eval/sample helpers,
    digest recomputation of an already-concrete config) "auto" resolves
    to None, exactly the pre-measurement behavior. Reference-shape
    sweeps sit ~20x below the boundary either way, so their manifest
    digests are unchanged and no existing chunk dir is orphaned.
    Explicit integer ``mc_chunk`` is honored (it is exact; see
    tests/test_mc_chunk.py)."""
    if config.use_pallas == "auto":
        config = config.replace(use_pallas=False)
    if config.mc_chunk == "auto":
        if members is None:
            config = config.replace(mc_chunk=None)
        else:
            from dpivae_tpu.train.setup import resolve_mc_chunk

            d_hidden = (int(config.hidden_width)
                        if config.hidden_width is not None else 128)
            config = config.replace(mc_chunk=resolve_mc_chunk(
                config, d_hidden, member_factor=int(members)))
    return config


def build_member_fn(
    config: TrainConfig,
    case: Case,
    hyper_fields: tuple = (),
    mesh: Optional[Mesh] = None,
    dp_axis: str = "dp",
    unroll: bool | str | tuple = False,
):
    """One sweep member as a pure function ``(key, lambda[, hyper]) ->
    (params, logs)``: sample data, init, train. vmap-ready. With
    ``hyper_fields``, the extra ``hyper`` tuple carries per-member traced
    config overrides (see train.TRACEABLE_HYPER_FIELDS). With ``mesh``,
    each member's minibatches/validation pass carry ``dp_axis`` sharding
    constraints (combine with ``vmap(..., spmd_axis_name=member_axis)``
    for a 2-D members × data-parallel program)."""
    config = _resolve_sweep_config(config)
    template = make_template_model(config, case)
    # unroll=False default: vmapped members are arithmetic-bound (not
    # scan-overhead-bound) and unrolling only multiplies compile time.
    train_fn = build_train_fn(
        config, case, mesh=mesh, dp_axis=dp_axis, unroll=unroll,
        hyper_fields=hyper_fields,
    )
    gt_dist = case.gt_dist()

    def member(key, lam, *hyper):
        k_dtr, k_dva, k_init, k_train = jax.random.split(key, 4)
        data_train = sample_response(
            case, k_dtr, config.n_train, sample_dist=gt_dist
        )
        data_val = sample_response(case, k_dva, config.n_val, sample_dist=gt_dist)
        params = template.init(k_init)
        state, logs = train_fn(
            params, k_train, data_train[:3], data_val[:3], lam, *hyper
        )
        return state.params, logs

    return member


def _aot(key_parts, jitted, example_args):
    """Swap a jitted sweep program for its disk-cached compiled executable.

    Single-device paths only. On a warm disk cache this replaces the
    first chunk's trace+lower+compile (~8-34 s on the 1-core host, see
    BASELINE.md) with a ~1-2 s executable load. Default-enabled only on
    locally-attached accelerators — through the tunneled axon backend the
    executable's first-call upload costs more than the compile it saves
    (utils/aot.py:enabled). On any failure, on CPU, or when disabled it
    returns ``jitted`` unchanged.

    ``example_args`` may be a thunk: it is only evaluated when the cache
    is actually enabled, so disabled-path callers (the default on this
    tunnel and on CPU) never pay the device ops of materializing example
    slices."""
    from dpivae_tpu.utils import aot

    if not aot.enabled():
        return jitted
    if callable(example_args):
        example_args = example_args()
    return aot.aot_get(key_parts, lambda: jitted, example_args)


def _run_chunks(batched, arg_slices):
    """Run each chunk program through a single-worker dispatcher thread.

    Dispatch latency is backend-dependent: the jit fastpath returns
    immediately, but an AOT-loaded executable's call can block until the
    program completes (see train_sweep's dispatch loop). Routing calls
    through a worker thread keeps the main thread free to prepare/upload
    the next chunk's input slices while the device computes, whichever
    dispatch semantics the backend has."""
    dispatcher = ThreadPoolExecutor(max_workers=1)
    try:
        futs = [dispatcher.submit(batched, *args) for args in arg_slices]
        return [f.result() for f in futs]
    finally:
        dispatcher.shutdown(wait=False, cancel_futures=True)


def _force(tree) -> None:
    """Force execution with a host transfer of one scalar —
    jax.block_until_ready is unreliable on the tunneled TPU backend."""
    leaf = jax.tree.leaves(tree)[0]
    float(np.asarray(leaf).ravel()[0])


def _progress(msg: str) -> None:
    """One narrator line on stderr (multi-minute studies must not run
    silent; stdout stays clean for driver-parsed output)."""
    print(msg, file=sys.stderr, flush=True)


# Members per batched latent-extraction program. One shared default for
# sweep_disentanglement_latents and scripts/1_disentanglement_metric.py
# (they used to disagree, 22 vs 11). Measured on v5e (66-member study):
# steady-state extraction is ~0.1s at ANY chunk size — the cost is the
# one-time compile/load of each DISTINCT chunk size's program (9-24s), so
# what matters is that every caller shares one size, not which size.
LATENTS_CHUNK_DEFAULT = 22

# Calibration workload for the auto-chunk cost model: the oscillator
# "dpivae" preset (n_batch=64, n_mc_train=16, n_val=512, n_mc_val=64,
# val_freq=10, MLP encoders) on v5e sustains >= ~20k member-steps/s; its
# per-step work in elementwise-sample units is the denominator below.
_CALIB_STEP_SAMPLES = 64 * 16 + 512 * 64 / 10
# Pessimistic calibration throughput used for the transport-deadline cap.
_CALIB_MEMBER_STEPS_PER_S = 20_000.0
# Keep one program's predicted runtime under this (the TPU transport
# deadline is ~2 min; leave headroom for compile/queue jitter).
_PROGRAM_BUDGET_S = 100.0


def member_step_cost(config: Optional[TrainConfig]) -> float:
    """Relative per-member-step cost vs the calibration workload.

    An *estimate*, used only to scale the auto-chunk runtime cap: the
    dominant per-step work is MC-sampled batch passes
    (n_batch * n_mc_train) plus the amortized validation pass
    (n_val * n_mc_val / val_freq). CNN encoder trunks cost a conservative
    4x over the calibration MLPs (conv over the signal length vs one
    dense layer). Never below 1: the fixed per-step overhead
    (scan/dispatch) floors real throughput, so cheap configs must not
    inflate the cap.
    """
    if config is None:
        return 1.0
    samples = (
        config.n_batch * config.n_mc_train
        + config.n_val * config.n_mc_val / max(config.val_freq, 1)
    )
    cost = samples / _CALIB_STEP_SAMPLES
    if "CNN" in (config.encoder_x, config.encoder_c, config.encoder_y):
        cost *= 4.0
    return max(cost, 1.0)


def auto_chunk_size(
    n_members: int, n_iter: int, config: Optional[TrainConfig] = None
) -> int:
    """Members per program for a chunked training sweep.

    Two measured facts drive the choice (oscillator dpivae preset, 66
    members × 2000 iters, v5e): (a) per-member throughput is flat for
    small chunks and degrades for large ones (chunk 11 → 41.6k, 22 →
    40.8k, 33 → 37.1k, 66 → 35.9k member-steps/s), and (b) ceil-padding
    waste dominates everything else (the old fixed chunk of 12 padded 66
    → 72, costing 8%). So: prefer the smallest chunk ≥ 8 with zero
    padding; otherwise trade padding waste against the large-chunk rate
    penalty. A runtime cap keeps one program well under the ~2-minute
    TPU transport deadline even at a pessimistic 20k member-steps/s;
    with ``config`` the cap additionally scales down for workloads
    heavier than the calibration one (bigger batches/MC counts, CNN
    encoders — see ``member_step_cost``).
    """
    if n_members <= 0:
        return 1
    cost = member_step_cost(config)
    budget_member_steps = _PROGRAM_BUDGET_S * _CALIB_MEMBER_STEPS_PER_S / cost
    cap = max(1, min(n_members, int(budget_member_steps // max(n_iter, 1))))
    if n_members <= 16:
        if cap >= n_members:
            return n_members  # one program, no padding
        # cap binds: fall through to the padding-aware choice below
    best, best_score = 1, -1.0
    for c in range(1, cap + 1):
        waste = -(-n_members // c) * c - n_members
        if c >= 8:
            rate = 1.0 if c <= 22 else (0.90 if c <= 33 else 0.87)
        else:
            # Below the measured flat region: mild per-program dispatch
            # overhead, increasing with chunk count — prefer larger c.
            rate = 0.90 + 0.0125 * c
        score = rate * n_members / (n_members + waste)
        if score > best_score + 1e-9:
            best, best_score = c, score
    return best


def _warn_if_over_budget(
    chunk_size: int, n_iter: int, config: Optional[TrainConfig]
) -> None:
    """Warn when an explicit chunk's predicted single-program runtime
    approaches the ~2-minute TPU transport deadline (auto chunks are
    capped; hand-picked ones are not)."""
    cost = member_step_cost(config)
    predicted = chunk_size * max(n_iter, 1) * cost / _CALIB_MEMBER_STEPS_PER_S
    if predicted > _PROGRAM_BUDGET_S:
        warnings.warn(
            f"sweep chunk of {chunk_size} members x {n_iter} iters predicts "
            f"~{predicted:.0f}s per device program (cost factor "
            f"{cost:.2f}) — near or past the ~120s TPU transport deadline; "
            "pass a smaller chunk_size (or chunk_size='auto')",
            stacklevel=3,
        )


@functools.lru_cache(maxsize=32)
def _concat_fn(n_members: int):
    return jax.jit(
        lambda cs: jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0)[:n_members], *cs
        )
    )


def _concat_chunks(chunks, n_members: int):
    """Concatenate per-chunk result pytrees along the member axis as ONE
    jitted program. Eager per-leaf concatenation would issue ~n_leaves
    remote ops — each a synchronous round trip on the tunneled backend —
    which measurably dominates chunked-sweep wall time. The jit wrapper is
    cached so repeat sweeps reuse the compiled program."""
    return _concat_fn(n_members)(chunks)


def _save_chunk(path: str, out) -> None:
    """Persist one (params, logs) chunk as npz (leaves positionally)."""
    params, logs = out
    leaves = jax.tree.leaves(params)
    payload = {f"p{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload.update(
        {f"log_{name}": np.asarray(getattr(logs, name))
         for name in TrainLogs._fields}
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, n_leaves=len(leaves), **payload)
    os.replace(tmp, path)


def _load_chunk(path: str, params_treedef, expect_members: int):
    """Load a saved chunk as host numpy (the checkpointed-sweep concat is
    host-side; uploading resumed chunks to the device would be wasted
    transfers); None if stale (written under a different chunk size, e.g.
    before a chunk_size default change — loading it would misalign the
    concatenated member axis silently)."""
    with np.load(path) as data:
        leaves = [data[f"p{i}"] for i in range(int(data["n_leaves"]))]
        logs = TrainLogs(
            *[data[f"log_{name}"] for name in TrainLogs._fields]
        )
    if leaves and leaves[0].shape[0] != expect_members:
        return None
    return jax.tree.unflatten(params_treedef, leaves), logs


def _sweep_manifest(
    config: TrainConfig, case: Case, arrays, n_members: int,
    flavor="",
) -> dict:
    """Identity of a checkpointed sweep: everything that determines its
    member results. The digest prefixes every chunk FILENAME, so a rerun
    into the same dir with a different grid/config whose member count
    happens to match can never resume foreign chunks — they simply have
    different names.

    ``arrays`` are the member-identity columns (keys, λs, hyper columns,
    per-member datasets — whatever the sweep flavor trains on), digested
    over their unpadded [:n_members] slices. ``flavor`` carries any
    member identity that is NOT an array — the sweep kind and, for hyper
    sweeps, the swept FIELD NAMES (two grids over different fields can
    hold byte-identical value columns yet train different members)."""
    h = hashlib.sha256()
    h.update(repr(flavor).encode())
    # Digest the RESOLVED use_pallas (_resolve_sweep_config): hashing the
    # "auto" sentinel would only break resume compatibility — flipping
    # the config default from False to "auto" must not orphan every
    # pre-existing checkpoint dir.
    config = _resolve_sweep_config(config)
    h.update(config.to_json().encode())
    h.update(case.fingerprint().encode())
    for a in arrays:
        a = np.ascontiguousarray(np.asarray(a)[:n_members])
        h.update(str((a.shape, a.dtype.str)).encode())
        h.update(a.tobytes())
    return {"digest": h.hexdigest(), "n_members": int(n_members)}


# Sweep chunk filenames: digest-keyed (current) and legacy (pre-digest
# naming — unresumable since the naming change, see docs/MIGRATION.md).
_DIGEST_CHUNK_RE = re.compile(r"^chunk_([0-9a-f]{12})_\d{6}\.npz$")
_LEGACY_CHUNK_RE = re.compile(r"^chunk_\d{6}\.npz$")

# Warn when a checkpoint dir's chunk files exceed this many MB
# (override with DPIVAE_CHECKPOINT_WARN_MB; <=0 disables).
_CHECKPOINT_WARN_MB_DEFAULT = 512.0


def _read_manifest(checkpoint_dir: str) -> dict:
    try:
        with open(os.path.join(checkpoint_dir, "manifest.json")) as f:
            data = json.load(f)
        if isinstance(data, dict):
            return data
    except (OSError, ValueError):
        pass
    return {}


def _manifest_history(prev: dict) -> dict:
    """Digest registry {digest12: {"ts", "n_members"}} from a manifest,
    folding in a pre-history manifest's single digest as one entry."""
    history = prev.get("history")
    history = dict(history) if isinstance(history, dict) else {}
    old = prev.get("digest")
    if isinstance(old, str) and len(old) >= 12 and old[:12] not in history:
        history[old[:12]] = {"ts": None, "n_members": prev.get("n_members")}
    return history


def _warn_if_dir_large(checkpoint_dir: str) -> None:
    raw = os.environ.get("DPIVAE_CHECKPOINT_WARN_MB",
                         _CHECKPOINT_WARN_MB_DEFAULT)
    try:
        limit_mb = float(raw)
    except (TypeError, ValueError):
        warnings.warn(
            f"ignoring non-numeric DPIVAE_CHECKPOINT_WARN_MB={raw!r}",
            stacklevel=4,
        )
        limit_mb = _CHECKPOINT_WARN_MB_DEFAULT
    if limit_mb <= 0:
        return
    total = 0
    for f in os.listdir(checkpoint_dir):
        if _DIGEST_CHUNK_RE.match(f) or _LEGACY_CHUNK_RE.match(f):
            try:
                total += os.path.getsize(os.path.join(checkpoint_dir, f))
            except OSError:
                pass
    if total > limit_mb * 1e6:
        warnings.warn(
            f"sweep checkpoint dir {checkpoint_dir} holds "
            f"{total / 1e6:.0f} MB of chunk checkpoints (warn threshold "
            f"{limit_mb:.0f} MB, DPIVAE_CHECKPOINT_WARN_MB) — stale sweep "
            "identities accumulate; prune with sweep.clean_checkpoint_dir "
            "or pass gc_stale_chunks=True to the sweep trainers",
            stacklevel=4,
        )


def clean_checkpoint_dir(
    checkpoint_dir: str,
    keep=None,
    max_age_days: Optional[float] = None,
):
    """Garbage-collect stale sweep chunk checkpoints from a shared dir.

    Deletes chunk files whose identity digest is NOT in ``keep`` plus any
    legacy digest-less ``chunk_NNNNNN.npz`` files (unresumable since chunk
    names embed the sweep identity digest — docs/MIGRATION.md). By default
    ``keep`` is every digest recorded in the dir's manifest registry (each
    sweep run registers its digest there), so the default pass removes only
    orphans: chunks no registered sweep can ever resume. Pass
    ``max_age_days`` to additionally expire registered digests whose last
    run is older; pass an explicit ``keep`` iterable of digests (full or
    12-char prefixes) to override the registry entirely. The registry is
    pruned to match. Returns the deleted filenames.
    """
    if not os.path.isdir(checkpoint_dir):
        return []
    prev = _read_manifest(checkpoint_dir)
    history = _manifest_history(prev)
    if keep is None:
        kept = set(history)
        if max_age_days is not None:
            cutoff = time.time() - max_age_days * 86400.0
            kept = {
                d for d in kept
                if (history.get(d) or {}).get("ts") is None
                or history[d]["ts"] >= cutoff
            }
    else:
        kept = {str(k)[:12] for k in keep}
    deleted = []
    for f in sorted(os.listdir(checkpoint_dir)):
        m = _DIGEST_CHUNK_RE.match(f)
        if m is not None:
            if m.group(1) in kept:
                continue
        elif not _LEGACY_CHUNK_RE.match(f):
            continue  # not a chunk checkpoint — never touch it
        os.remove(os.path.join(checkpoint_dir, f))
        deleted.append(f)
    pruned = {d: meta for d, meta in history.items() if d in kept}
    if prev or pruned:
        prev["history"] = pruned
        # If this pass expired the manifest's own (latest-sweep) digest,
        # drop the top-level identity too — _manifest_history would
        # otherwise fold it back into the registry as {"ts": None} on the
        # next write, permanently resurrecting an expired digest.
        top = prev.get("digest")
        if isinstance(top, str) and top[:12] not in kept:
            prev.pop("digest", None)
        with open(os.path.join(checkpoint_dir, "manifest.json"), "w") as f:
            json.dump(prev, f)
    if deleted:
        _progress(
            f"[sweep] checkpoint GC removed {len(deleted)} stale chunk "
            f"file(s) from {checkpoint_dir}"
        )
    return deleted


def _write_sweep_manifest(checkpoint_dir: str, manifest: dict) -> str:
    """Record the latest sweep's manifest and return the digest prefix that
    keys this sweep's chunk FILENAMES (``chunk_<digest12>_<start>.npz``).

    Because the identity digest is in every chunk's name, a sweep can only
    ever resume chunks it (or an identical sweep) wrote — no matter what
    else shares the directory, whether manifest.json survived, or where a
    previous recompute was interrupted. Chunks of other sweeps are left
    untouched (alternating two sweeps over one dir keeps BOTH resumable);
    a one-line note flags them the first time so a user who expected a
    resume understands the recompute. manifest.json records the latest
    sweep's identity plus a ``history`` registry of every digest that has
    run in the dir — the default keep-set of ``clean_checkpoint_dir``."""
    digest12 = manifest["digest"][:12]
    foreign = [
        f for f in os.listdir(checkpoint_dir)
        if f.startswith("chunk_") and f.endswith(".npz")
        and not f.startswith(f"chunk_{digest12}_")
    ]
    if foreign:
        _progress(
            f"[sweep] checkpoint dir holds {len(foreign)} chunk file(s) "
            "from other sweep identities (different config/case/grid/keys "
            "or a pre-digest-naming version) — ignored, not resumed"
        )
    history = _manifest_history(_read_manifest(checkpoint_dir))
    history[digest12] = {
        "ts": time.time(), "n_members": manifest["n_members"],
    }
    path = os.path.join(checkpoint_dir, "manifest.json")
    with open(path, "w") as f:
        json.dump({**manifest, "history": history}, f)
    _warn_if_dir_large(checkpoint_dir)
    return digest12


def _treedef_thunk(config: TrainConfig, case: Case):
    """Lazy params-treedef: only resumed chunk files need it to unflatten,
    so a fresh run never pays the template init. Host CPU: the treedef is
    backend-independent structure, and an eager init on the tunneled TPU
    pays ~1s/op remote compile across the template's many init ops."""
    config = _resolve_sweep_config(config)
    from dpivae_tpu.utils import on_host_cpu

    holder = []

    def thunk():
        if not holder:
            with on_host_cpu():
                holder.append(jax.tree.structure(
                    make_template_model(config, case).init(
                        jax.random.PRNGKey(0)
                    )
                ))
        return holder[0]

    return thunk


def _chunked_execute(
    make_batched,
    slice_args,
    n_members: int,
    chunk_size: int,
    treedef_thunk,
    checkpoint_dir: Optional[str] = None,
    chunk_callback=None,
    manifest: Optional[dict] = None,
    label: str = "sweep",
    gc_stale_chunks: bool = False,
):
    """Chunked sweep executor shared by every sweep entry point.

    Runs ``(n_members padded to a chunk multiple) / chunk_size`` invocations
    of one compiled program and concatenates their (params, logs) results:

    - ``make_batched()`` builds the program LAZILY, on the first fresh
      (non-resumed) chunk only — a fully checkpoint-resumed run never pays
      the AOT/compile wrap.
    - ``slice_args(sl)`` materializes one padded chunk's argument tuple;
      slicing must be host-side (eager device slices serialize the chunk
      pipeline on the tunneled backend).
    - With ``checkpoint_dir``: every completed chunk persists as npz named
      by the ``manifest`` identity digest + start index, and a rerun
      resumes from completed chunks; foreign chunks (a different sweep
      sharing the dir) can never be resumed because their names embed a
      different digest (see ``_write_sweep_manifest``).
    - With ``chunk_callback(start, params_chunk, logs_chunk)``: completed
      chunks stream to the caller as HOST numpy (padding trimmed) while
      later chunks still compute — per-member host IO overlaps device
      compute.

    Dispatch goes through a single-worker thread: the jit fastpath returns
    immediately, but an AOT-loaded executable's call can block until the
    program completes on the tunneled TPU — measured at study scale,
    blocking dispatch here serialized all device work ahead of every host
    copy and cost the entire overlap (~11 s on the 66-member study). The
    ~2-minute transport deadline is per *program*; a queue of short
    programs is safe.
    """
    n_pad = (-n_members) % chunk_size
    hosted = checkpoint_dir is not None or chunk_callback is not None

    def _emit(start: int, out_host) -> None:
        if chunk_callback is None:
            return
        n_keep = min(chunk_size, n_members - start)
        chunk_callback(
            start,
            jax.tree.map(lambda a: a[:n_keep], out_host[0]),
            TrainLogs(*jax.tree.map(lambda a: a[:n_keep], tuple(out_host[1]))),
        )

    digest12 = None
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        digest12 = _write_sweep_manifest(checkpoint_dir, manifest)
        if gc_stale_chunks:
            # Opt-in orphan GC: drops chunks of UNREGISTERED digests (and
            # legacy digest-less files); every registered sweep — this one
            # was just registered — keeps its chunks and stays resumable.
            clean_checkpoint_dir(checkpoint_dir)
    elif gc_stale_chunks:
        raise ValueError("gc_stale_chunks requires checkpoint_dir")

    chunks = []
    n_chunks = (n_members + n_pad) // chunk_size
    fresh = []  # (chunk index, future) for post-dispatch forcing/saving
    save_paths = {}
    batched = None  # built lazily by make_batched on the first fresh chunk

    t0 = time.perf_counter()
    dispatcher = ThreadPoolExecutor(max_workers=1)
    # The try covers BOTH passes: an exception anywhere (a failing
    # chunk_callback in _emit, checkpoint IO, a device fault) must still
    # shut the dispatcher down, or queued chunk programs keep running —
    # and keep holding the serialized device — behind the raised error.
    try:
        for i, start in enumerate(range(0, n_members + n_pad, chunk_size)):
            sl = slice(start, start + chunk_size)
            ckpt_path = (
                None if checkpoint_dir is None
                else f"{checkpoint_dir}/chunk_{digest12}_{start:06d}.npz"
            )
            if ckpt_path is not None and os.path.exists(ckpt_path):
                loaded = _load_chunk(ckpt_path, treedef_thunk(), chunk_size)
                if loaded is not None:
                    chunks.append(loaded)
                    _emit(start, loaded)
                    if n_chunks > 1:
                        _progress(
                            f"[{label}] chunk {i + 1}/{n_chunks} resumed "
                            "from checkpoint"
                        )
                    continue
                _progress(
                    f"{label} checkpoint {ckpt_path} has a different chunk "
                    "size (stale chunking); recomputing this chunk"
                )
            if batched is None:
                batched = make_batched()
            fut = dispatcher.submit(batched, *slice_args(sl))
            if ckpt_path is not None:
                save_paths[i] = ckpt_path
            fresh.append((i, fut))
            chunks.append(fut)  # placeholder, replaced in the force pass
        for i, fut in fresh:
            out = fut.result()
            chunks[i] = out  # chunk i is chunks[i]: one append per chunk
            _force(out)  # waits for this chunk; later chunks keep computing
            if hosted:
                # One device->host copy per chunk, reused for the npz save,
                # the chunk callback, AND the host-side concat below.
                host = jax.tree.map(np.asarray, out)
                if i in save_paths:
                    _save_chunk(save_paths[i], host)
                chunks[i] = host
                _emit(i * chunk_size, host)
            if n_chunks > 1:
                _progress(
                    f"[{label}] chunk {i + 1}/{n_chunks} done "
                    f"({min((i + 1) * chunk_size, n_members)}/{n_members} "
                    f"members, {time.perf_counter() - t0:.1f}s)"
                )
    finally:
        dispatcher.shutdown(wait=False, cancel_futures=True)
    t_asm = time.perf_counter()
    if hosted:
        # Every chunk is already host numpy (saved, loaded, or emitted):
        # concatenate on host. A device concat program here would pay a
        # fresh XLA compile (~270 args for the 6-chunk study) plus
        # re-uploads for zero benefit.
        params, logs = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs])
            [:n_members],
            *chunks,
        )
    else:
        params, logs = _concat_chunks(chunks, n_members)
    if n_chunks > 1:
        _progress(
            f"[{label}] assembled {n_members} members in "
            f"{time.perf_counter() - t_asm:.1f}s"
        )
    return params, logs


def _host_keys(keys):
    """(host_array, wrap) for member keys: typed jax.random.key arrays
    cannot pass through np.asarray, so slice their raw key data on the
    host and re-wrap each chunk with the original impl."""
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(keys)
        data = np.asarray(jax.random.key_data(keys))
        return data, lambda a: jax.random.wrap_key_data(
            jnp.asarray(a), impl=impl
        )
    return np.asarray(keys), jnp.asarray


def train_sweep(
    config: TrainConfig,
    case: Case,
    lambdas: Sequence[float],
    n_runs: int = 1,
    key=None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
    chunk_size: Union[int, str, None] = "auto",
    checkpoint_dir: Optional[str] = None,
    chunk_callback=None,
    gc_stale_chunks: bool = False,
) -> SweepResult:
    """Train the full (λ × run) grid as batched vmapped programs.

    Args:
        lambdas: GRL strengths; the grid is their cross product with
            ``n_runs`` seeds (ref sweep: 11 λ × 6 runs, 1_disentanglement_
            metric.py:54-56).
        mesh: optional device mesh; the member axis is sharded over
            ``member_axis``. Pad members to a multiple of the axis size for
            even sharding (done automatically; pads are trained and
            dropped). A 2-D ``(member_axis, "dp")`` mesh additionally
            shards each member's minibatch/validation pass over "dp"
            (requires n_batch and n_val divisible by the dp size).
        chunk_size: members per program invocation. One compiled program is
            reused across chunks; chunking bounds single-program device
            runtime (very long executions can trip the TPU transport) and
            memory. "auto" (default) picks a padding-free size from the
            measured throughput curve (see ``auto_chunk_size``). None or
            >= n_members disables chunking.
        checkpoint_dir: if set (chunked, non-mesh path), every completed
            chunk is saved as an npz and a rerun of the identical sweep
            resumes from the completed chunks. A manifest digest of
            (config, case, λ grid, member keys) guards the dir: chunks
            written by a different sweep are ignored and recomputed, not
            silently resumed.
        chunk_callback: if set (non-mesh path), called as
            ``callback(member_start, params_chunk, logs_chunk)`` with HOST
            numpy arrays for every completed chunk (fresh or resumed,
            padding trimmed), while later chunks are still computing on
            the device. Callers stream per-member host work (CSV writes,
            probe dispatch) into the training wall time instead of after
            it; the callback runs on the sweep thread, so hand long work
            to an executor and return.
        gc_stale_chunks: with ``checkpoint_dir``, run
            ``clean_checkpoint_dir`` after registering this sweep: chunk
            files whose digest no registered sweep owns (orphans, legacy
            digest-less names) are deleted; every registered sweep —
            including other sweeps sharing the dir — stays resumable.

    Returns:
        SweepResult with leading member axis ordered λ-major
        (member = i_lambda * n_runs + i_run).
    """
    if gc_stale_chunks and checkpoint_dir is None:
        raise ValueError("gc_stale_chunks requires checkpoint_dir")
    # Member grid bookkeeping is host work (the chunk loop slices keys and
    # lambdas as numpy); building it eagerly on the tunneled TPU backend
    # would pay a remote-compile round trip per op.
    from dpivae_tpu.utils import on_host_cpu

    with on_host_cpu():
        if key is None:
            key = jax.random.PRNGKey(config.seed)
        lambdas = jnp.asarray(
            np.repeat(np.asarray(lambdas, np.float32), n_runs)
        )
        n_members = lambdas.shape[0]
        keys = jax.random.split(key, n_members)

    if mesh is not None:
        if chunk_callback is not None:
            raise ValueError(
                "chunk_callback requires the chunked (non-mesh) path — the "
                "mesh path runs as one sharded program with no chunks"
            )
        if checkpoint_dir is not None:
            raise ValueError(
                "checkpoint_dir (and gc_stale_chunks) require the chunked "
                "(non-mesh) path — the mesh path runs as one sharded "
                "program with no chunk files to save, resume, or GC"
            )
        # Mesh mode: a single sharded program (chunking would fight the
        # member-axis sharding); pad members to the axis size. If the mesh
        # also carries a sized "dp" axis (a 2-D members × data-parallel
        # mesh), each member's minibatch/validation pass additionally
        # shards over it via build_train_fn's dp constraints — the vmapped
        # member axis is named via spmd_axis_name so the two shardings
        # compose instead of conflicting.
        # members=None: the per-device decode working set under member/dp
        # sharding is an unmeasured regime — mc_chunk stays single-shot.
        config = _resolve_sweep_config(config)
        use_dp = "dp" in mesh.axis_names and mesh.shape["dp"] > 1
        sharding = NamedSharding(mesh, P(member_axis))
        # Cache the JITTED wrapper (not just the vmap): a per-call
        # jax.jit(...) would rebuild the dispatch wrapper every invocation
        # and lose the C++ fastpath for repeat sweeps.
        batched = _SWEEP_JIT_CACHE.get(
            ("train_sweep_mesh", config, case.fingerprint(), mesh, member_axis),
            lambda: jax.jit(
                jax.vmap(
                    build_member_fn(config, case, mesh=mesh if use_dp else None),
                    spmd_axis_name=member_axis,
                ),
                in_shardings=(sharding, sharding),
            ),
        )
        axis_size = mesh.shape[member_axis]
        n_pad = (-n_members) % axis_size
        if n_pad:
            lambdas_p = jnp.concatenate([lambdas, lambdas[-1:].repeat(n_pad)])
            keys_p = jnp.concatenate([keys, keys[-1:].repeat(n_pad, 0)])
        else:
            lambdas_p, keys_p = lambdas, keys
        keys_p = jax.device_put(keys_p, sharding)
        lambdas_p = jax.device_put(lambdas_p, sharding)
        params, logs = batched(keys_p, lambdas_p)
        if n_pad:
            trim = lambda a: a[:n_members]
            params = jax.tree.map(trim, params)
            logs = TrainLogs(*jax.tree.map(trim, tuple(logs)))
        return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)

    if chunk_size == "auto":
        chunk_size = auto_chunk_size(n_members, config.n_iter, config)
    elif chunk_size is not None:
        _warn_if_over_budget(chunk_size, config.n_iter, config)
    # Resolve on the per-program vmapped member count (the chunk size) —
    # BEFORE anything keyed on config (jit cache, AOT keys, manifest
    # digest, treedef) so every consumer sees the same concrete mc_chunk.
    config = _resolve_sweep_config(
        config, members=min(chunk_size or n_members, n_members))
    batched = _SWEEP_JIT_CACHE.get(
        ("train_sweep", config, case.fingerprint()),
        lambda: jax.jit(jax.vmap(build_member_fn(config, case))),
    )
    if (
        (chunk_size is None or chunk_size >= n_members)
        and checkpoint_dir is None
        and chunk_callback is None
    ):
        batched = _aot(
            ("train_sweep", config, case.fingerprint()), batched, (keys, lambdas)
        )
        params, logs = batched(keys, lambdas)
        return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)

    # Chunked: pad to a chunk multiple so one compile serves every chunk.
    # Chunk arguments are sliced on the HOST (numpy) — on the tunneled
    # backend every eager device op (a keys[sl] slice, say) costs a remote
    # round trip that serializes the chunk pipeline.
    chunk_size = min(chunk_size or n_members, n_members)
    n_pad = (-n_members) % chunk_size
    keys_h, wrap_keys = _host_keys(keys)
    lambdas_h = np.asarray(lambdas)
    if n_pad:
        keys_h = np.concatenate([keys_h, keys_h[-1:].repeat(n_pad, 0)])
        lambdas_h = np.concatenate([lambdas_h, lambdas_h[-1:].repeat(n_pad)])

    params, logs = _chunked_execute(
        # Lazy AOT wrap: a fully checkpoint-resumed run dispatches no fresh
        # chunk and must not pay the eager lower+compile+serialize.
        make_batched=lambda: _aot(
            ("train_sweep", config, case.fingerprint()), batched,
            lambda: (wrap_keys(keys_h[:chunk_size]), lambdas_h[:chunk_size]),
        ),
        slice_args=lambda sl: (wrap_keys(keys_h[sl]), lambdas_h[sl]),
        n_members=n_members,
        chunk_size=chunk_size,
        treedef_thunk=_treedef_thunk(config, case),
        checkpoint_dir=checkpoint_dir,
        chunk_callback=chunk_callback,
        manifest=(
            _sweep_manifest(
                config, case, (keys_h, lambdas_h), n_members,
                flavor="lambda-sweep",
            )
            if checkpoint_dir is not None else None
        ),
        label="sweep",
        gc_stale_chunks=gc_stale_chunks,
    )
    return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)


def sweep_sample(
    config: TrainConfig,
    case: Case,
    result: SweepResult,
    data_train,
    x,
    c,
    cond: bool = False,
    n: int = 1,
    key=None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
):
    """Batched ``model.sample`` across all sweep members — one compiled
    program, scalers re-fitted per member from the stacked ``data_train``
    (leading member axis on every array, including x/c).

    With ``mesh``, the member axis is sharded over ``member_axis``
    (n_members must divide the axis size evenly, as in sweep_predict_y).

    Returns the stacked 9-tuple of model.sample outputs.
    """
    config = _resolve_sweep_config(config)
    if key is None:
        key = jax.random.PRNGKey(0)
    from dpivae_tpu.eval.evaluate import build_eval_sample_fn

    batched = _SWEEP_JIT_CACHE.get(
        ("sweep_sample", config, case.fingerprint(), cond, n),
        lambda: jax.jit(jax.vmap(build_eval_sample_fn(config, case, cond, n))),
    )
    n_members = result.n_members
    keys = jax.random.split(key, n_members)
    data_train = tuple(jnp.asarray(a) for a in data_train[:3])
    params = result.params
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    place = _member_sharding(mesh, member_axis)
    if place is not None:
        if n_members % mesh.shape[member_axis]:
            raise ValueError("n_members must be a multiple of the mesh axis")
        params = jax.tree.map(place, params)
        keys = place(keys)
        data_train = jax.tree.map(place, data_train)
        x, c = place(x), place(c)
    return batched(params, keys, data_train, x, c)


def _member_sharding(mesh: Optional[Mesh], member_axis: str):
    if mesh is None:
        return None
    return lambda a: jax.device_put(
        jnp.asarray(a),
        NamedSharding(mesh, P(member_axis, *([None] * (jnp.ndim(a) - 1)))),
    )


def sweep_predict_y(
    config: TrainConfig,
    case: Case,
    result: SweepResult,
    data_train,
    x,
    c,
    cond: bool = False,
    n: int = 1,
    key=None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
):
    """Batched posterior-mean ŷ across members (ref evaluate_model,
    dpivae.py:538-553). Returns (n_members, n_test, nd_y).

    Only the MC-mean of y_sample is returned, so at n_mc_test=512 the
    (members x MC x test x nd_x) reconstruction tensors are dead code and
    XLA never materializes them. With ``mesh``, the member axis is sharded
    over ``member_axis`` (n_members must divide the axis size evenly).
    """
    config = _resolve_sweep_config(config)
    if key is None:
        key = jax.random.PRNGKey(0)
    from dpivae_tpu.eval.evaluate import build_eval_sample_fn

    def build():
        sample_fn = build_eval_sample_fn(config, case, cond, n)

        def member(params, k, dtr, xm, cm):
            out = sample_fn(params, k, dtr, xm, cm)
            return jnp.mean(out[4], axis=0)

        return jax.jit(jax.vmap(member))

    keys = jax.random.split(key, result.n_members)
    data_train = tuple(jnp.asarray(a) for a in data_train[:3])
    params = result.params
    x = jnp.asarray(x)
    c = jnp.asarray(c)
    place = _member_sharding(mesh, member_axis)
    if place is not None:
        if result.n_members % mesh.shape[member_axis]:
            raise ValueError("n_members must be a multiple of the mesh axis")
        params = jax.tree.map(place, params)
        keys = place(keys)
        data_train = jax.tree.map(place, data_train)
        x, c = place(x), place(c)
    batched = _SWEEP_JIT_CACHE.get(
        ("sweep_predict_y", config, case.fingerprint(), cond, n), build
    )
    return batched(params, keys, data_train, x, c)


def sweep_disentanglement_latents(
    config: TrainConfig,
    case: Case,
    result: SweepResult,
    n_train_reg: int,
    n_test_reg: int,
    cond: bool = False,
    use_mean: bool = False,
    key=None,
    chunk_size: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
):
    """Device-batched latent extraction for the disentanglement sweep.

    Per member (inside one vmapped program): replay the member's
    training data from its base key (for scaler parity with training),
    sample fresh regressor train/test datasets, and compute MC-averaged
    posterior latents on both. Only the sklearn probe fits remain on host.

    Members are processed in ``chunk_size`` batches through one compiled
    program (results concatenated on host) — bounds device memory and blast
    radius for very large grids. With ``mesh``, each chunk's member axis is
    additionally sharded over ``member_axis`` (make chunk_size a multiple
    of the mesh axis).

    Returns a dict of stacked arrays with leading member axis:
    zx/zc/zy_{train,test} latents and z_{train,test} ground-truth factors.
    """
    config = _resolve_sweep_config(config)
    if key is None:
        key = jax.random.PRNGKey(1)
    from dpivae_tpu.eval.evaluate import build_eval_sample_fn

    n = config.n_mc_test if use_mean else 1

    def build():
        gt_dist = case.gt_dist()
        sample_fn = build_eval_sample_fn(config, case, cond, n)

        def member(params, member_key, reg_key):
            k_dtr, _, _, _ = jax.random.split(member_key, 4)  # replay split
            data_train = sample_response(
                case, k_dtr, config.n_train, sample_dist=gt_dist
            )
            k1, k2, k3, k4 = jax.random.split(reg_key, 4)
            dtr = sample_response(case, k1, n_train_reg, sample_dist=gt_dist)
            dte = sample_response(case, k2, n_test_reg, sample_dist=gt_dist)
            out_tr = sample_fn(params, k3, data_train[:3], dtr[0], dtr[1])
            out_te = sample_fn(params, k4, data_train[:3], dte[0], dte[1])
            mean = lambda a: jnp.mean(a, axis=0)
            return {
                "zx_train": mean(out_tr[5]), "zc_train": mean(out_tr[6]),
                "zy_train": mean(out_tr[7]), "z_train": dtr[3],
                "zx_test": mean(out_te[5]), "zc_test": mean(out_te[6]),
                "zy_test": mean(out_te[7]), "z_test": dte[3],
            }

        return jax.jit(jax.vmap(member))

    reg_keys = jax.random.split(key, result.n_members)
    batched = _SWEEP_JIT_CACHE.get(
        ("disent_latents", config, case.fingerprint(), cond, n, n_train_reg, n_test_reg),
        build,
    )

    n_members = result.n_members
    if chunk_size is None:
        chunk_size = LATENTS_CHUNK_DEFAULT
    chunk_size = min(chunk_size, n_members)
    # Pad to a chunk multiple so one compiled program serves every chunk
    n_pad = (-n_members) % chunk_size
    take = lambda tree, sl: jax.tree.map(lambda a: a[sl], tree)
    pad = lambda tree: jax.tree.map(
        lambda a: jnp.concatenate([a, a[:n_pad]]) if n_pad else a, tree
    )
    params_p = pad(result.params)
    keys_p = pad(result.keys)
    reg_keys_p = pad(reg_keys)

    place = _member_sharding(mesh, member_axis)
    if place is not None and chunk_size % mesh.shape[member_axis]:
        raise ValueError("chunk_size must be a multiple of the mesh axis")

    if place is None:
        batched = _aot(
            ("disent_latents", config, case.fingerprint(), cond, n,
             n_train_reg, n_test_reg),
            batched,
            lambda: (take(params_p, slice(0, chunk_size)),
                     keys_p[:chunk_size], reg_keys_p[:chunk_size]),
        )

    def chunk_args():
        for start in range(0, n_members + n_pad, chunk_size):
            sl = slice(start, start + chunk_size)
            p_sl = take(params_p, sl)
            k_sl, rk_sl = keys_p[sl], reg_keys_p[sl]
            if place is not None:
                p_sl = jax.tree.map(place, p_sl)
                k_sl, rk_sl = place(k_sl), place(rk_sl)
            yield p_sl, k_sl, rk_sl

    chunks = _run_chunks(batched, chunk_args())
    return _concat_chunks(chunks, n_members)


def warm_disentanglement_latents(
    config: TrainConfig,
    case: Case,
    n_members: int,
    n_train_reg: int,
    n_test_reg: int,
    cond: bool = False,
    use_mean: bool = False,
    chunk_size: Optional[int] = None,
) -> None:
    """Pre-compile AND pre-execute the full latent-extraction pipeline on
    template-initialized dummy params, so the post-training
    ``sweep_disentanglement_latents`` call is pure steady state.

    Run this in a background thread while ``train_sweep`` occupies the
    device: compilation/cache-load (the 9-24s that dominates a cold
    extraction) is host-side and overlaps the training chunks; the dummy
    execution itself costs ~0.1s of device time per chunk, interleaved
    into the training queue. Shapes, chunking, and the final concat
    program are exercised at the exact real-call signature (same
    ``n_members``), so every compile the real call needs is already
    cached. Best-effort: any failure here only loses the warming.
    """
    config = _resolve_sweep_config(config)
    from dpivae_tpu.utils import on_host_cpu

    with on_host_cpu():
        params0 = make_template_model(config, case).init(jax.random.PRNGKey(0))
        keys = jax.random.split(jax.random.PRNGKey(0), n_members)
    params = jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (n_members,) + np.shape(a)),
        params0,
    )
    fake = SweepResult(
        params=params,
        logs=None,
        lambdas=np.zeros(n_members, np.float32),  # only its length is read
        keys=keys,
    )
    out = sweep_disentanglement_latents(
        config, case, fake, n_train_reg, n_test_reg, cond=cond,
        use_mean=use_mean, key=jax.random.PRNGKey(0), chunk_size=chunk_size,
    )
    _force(out)


def train_sweep_data(
    config: TrainConfig,
    case: Case,
    lambdas,
    data_train,
    data_val,
    key=None,
    mesh: Optional[Mesh] = None,
    member_axis: str = "sweep",
    chunk_size: Union[int, str, None] = "auto",
    checkpoint_dir: Optional[str] = None,
    chunk_callback=None,
    gc_stale_chunks: bool = False,
) -> SweepResult:
    """Sweep over *host-provided* per-member datasets.

    ``data_train``/``data_val`` are (x, c, y) tuples whose arrays carry a
    leading member axis — e.g. the 4-domain × 6-run transfer grid of
    reference 2_regression_comparison.py, where each member samples from a
    different quadrant-mixture distribution. The grid trains as vmapped
    programs of ``chunk_size`` members (see train_sweep: long single
    programs trip the TPU transport), optionally mesh-sharded instead.
    ``checkpoint_dir``/``chunk_callback``/``gc_stale_chunks`` behave
    exactly as in ``train_sweep`` (chunked non-mesh path; the manifest
    digest covers the per-member datasets too, so swapping datasets never
    resumes foreign chunks).
    """
    if gc_stale_chunks and checkpoint_dir is None:
        raise ValueError("gc_stale_chunks requires checkpoint_dir")
    lambdas = jnp.asarray(lambdas, jnp.float32)
    n_members = lambdas.shape[0]
    data_train = tuple(jnp.asarray(a) for a in data_train[:3])
    data_val = tuple(jnp.asarray(a) for a in data_val[:3])
    for a in (*data_train, *data_val):
        if a.shape[0] != n_members:
            raise ValueError("data member axis must match len(lambdas)")
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    keys = jax.random.split(key, n_members)

    def build():
        template = make_template_model(config, case)
        train_fn = build_train_fn(config, case, unroll=False)

        def member(key, lam, dtr, dva):
            k_init, k_train = jax.random.split(key)
            params = template.init(k_init)
            state, logs = train_fn(params, k_train, dtr, dva, lam)
            return state.params, logs

        return jax.jit(jax.vmap(member))

    if mesh is not None:
        if chunk_callback is not None or checkpoint_dir is not None:
            raise ValueError(
                "checkpoint_dir/chunk_callback require the chunked "
                "(non-mesh) path — the mesh path runs as one sharded "
                "program with no chunks"
            )
        # members=None: the per-device decode working set under member
        # sharding is an unmeasured regime — mc_chunk stays single-shot.
        config = _resolve_sweep_config(config)
        batched = _SWEEP_JIT_CACHE.get(
            ("train_sweep_data", config, case.fingerprint()), build
        )
        sharding = NamedSharding(mesh, P(member_axis))
        if n_members % mesh.shape[member_axis]:
            raise ValueError(
                "pad members to a multiple of the mesh axis for train_sweep_data"
            )
        keys = jax.device_put(keys, sharding)
        lambdas = jax.device_put(lambdas, sharding)
        data_sh = lambda a: jax.device_put(
            a, NamedSharding(mesh, P(member_axis, *([None] * (a.ndim - 1))))
        )
        data_train = jax.tree.map(data_sh, data_train)
        data_val = jax.tree.map(data_sh, data_val)
        params, logs = batched(keys, lambdas, data_train, data_val)
        return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)

    if chunk_size == "auto":
        chunk_size = auto_chunk_size(n_members, config.n_iter, config)
    elif chunk_size is not None:
        _warn_if_over_budget(chunk_size, config.n_iter, config)
    # Resolve on the per-program vmapped member count (the chunk size) —
    # BEFORE anything keyed on config (jit cache, AOT keys, manifest
    # digest, treedef) so every consumer sees the same concrete mc_chunk.
    config = _resolve_sweep_config(
        config, members=min(chunk_size or n_members, n_members))
    batched = _SWEEP_JIT_CACHE.get(
        ("train_sweep_data", config, case.fingerprint()), build
    )
    if (
        (chunk_size is None or chunk_size >= n_members)
        and checkpoint_dir is None
        and chunk_callback is None
    ):
        batched = _aot(
            ("train_sweep_data", config, case.fingerprint()), batched,
            (keys, lambdas, data_train, data_val),
        )
        params, logs = batched(keys, lambdas, data_train, data_val)
        return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)

    chunk_size = min(chunk_size or n_members, n_members)
    n_pad = (-n_members) % chunk_size
    # Host-side (numpy) padding + per-chunk slicing: eager device slices
    # would serialize the chunk pipeline on the tunneled backend.
    pad_np = lambda a: (
        np.concatenate([a, a[-1:].repeat(n_pad, 0)]) if n_pad else a
    )
    pad = lambda a: pad_np(np.asarray(a))
    keys_h, wrap_keys = _host_keys(keys)
    keys_p, lambdas_p = pad_np(keys_h), pad(lambdas)
    dtr_p = jax.tree.map(pad, data_train)
    dva_p = jax.tree.map(pad, data_val)
    first = slice(0, chunk_size)
    params, logs = _chunked_execute(
        make_batched=lambda: _aot(
            ("train_sweep_data", config, case.fingerprint()), batched,
            lambda: (wrap_keys(keys_p[first]), lambdas_p[first],
                     jax.tree.map(lambda a: a[first], dtr_p),
                     jax.tree.map(lambda a: a[first], dva_p)),
        ),
        slice_args=lambda sl: (
            wrap_keys(keys_p[sl]), lambdas_p[sl],
            jax.tree.map(lambda a: a[sl], dtr_p),
            jax.tree.map(lambda a: a[sl], dva_p),
        ),
        n_members=n_members,
        chunk_size=chunk_size,
        treedef_thunk=_treedef_thunk(config, case),
        checkpoint_dir=checkpoint_dir,
        chunk_callback=chunk_callback,
        manifest=(
            _sweep_manifest(
                config, case,
                (keys_p, lambdas_p, *jax.tree.leaves((dtr_p, dva_p))),
                n_members, flavor="data-sweep",
            )
            if checkpoint_dir is not None else None
        ),
        label="data-sweep",
        gc_stale_chunks=gc_stale_chunks,
    )
    return SweepResult(params=params, logs=logs, lambdas=lambdas, keys=keys)
