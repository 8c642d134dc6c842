"""Early stopping as a pure state-transition function.

The reference's ``EarlyStopping`` is a stateful patience counter checked on
the host every ``val_freq`` iterations (reference utils/loss.py:6-25,
dpivae.py:500). Here the same semantics are a jit-safe ``(state, val_loss) ->
state`` transition so the stop decision lives *inside* the fused training
scan: once ``stopped`` is set, subsequent steps freeze the train state
(mask-based "freeze when stopped", which also makes vmapped sweep members
with different stop times well-defined — SURVEY.md §7).

Exact reference semantics preserved:
- improvement (val < best - min_delta): best <- val, counter <- 0
- val > best: counter += 1; stop when counter >= patience
- best - min_delta <= val <= best: no change (dead zone, as in the reference)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EarlyStopState(NamedTuple):
    best: jnp.ndarray  # lowest validation loss seen
    counter: jnp.ndarray  # iterations since last improvement (int32)
    stopped: jnp.ndarray  # bool flag, latched once set


def early_stop_init() -> EarlyStopState:
    return EarlyStopState(
        best=jnp.asarray(jnp.inf, jnp.float32),
        counter=jnp.asarray(0, jnp.int32),
        stopped=jnp.asarray(False),
    )


def early_stop_update(
    state: EarlyStopState, val_loss, patience: int, min_delta: float
) -> EarlyStopState:
    val_loss = jnp.asarray(val_loss, jnp.float32)
    improved = val_loss < (state.best - min_delta)
    worse = val_loss > state.best

    new_best = jnp.where(improved, val_loss, state.best)
    new_counter = jnp.where(
        improved, 0, jnp.where(worse, state.counter + 1, state.counter)
    ).astype(jnp.int32)
    # The reference evaluates the stop condition only in the worse-than-best
    # branch (ref: utils/loss.py:21-24); without the `worse` gate patience=0
    # would stop on the first validation even when improving.
    newly_stopped = jnp.logical_and(worse, new_counter >= patience)
    # Latch: once stopped, state no longer changes
    return EarlyStopState(
        best=jnp.where(state.stopped, state.best, new_best),
        counter=jnp.where(state.stopped, state.counter, new_counter),
        stopped=state.stopped | newly_stopped,
    )
