"""Small-parity utilities: Flip transform, test_train_split, host-cpu
context, profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from dpivae_tpu.utils import on_host_cpu
from dpivae_tpu.utils.data import test_train_split as split_fn
from dpivae_tpu.utils.profiling import timed
from dpivae_tpu.utils.transforms import Flip, ShiftScale


def test_flip_swaps_directions():
    ss = ShiftScale(jnp.array([0.0]), jnp.array([2.0]))
    flipped = Flip(ss)
    z = jnp.array([[0.5]])
    fwd, ld_f = flipped.forward(z)
    inv, ld_i = ss.inverse(z)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(inv))
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_i))
    back, _ = flipped.inverse(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-6)


def test_test_train_split_shapes():
    x = np.arange(200).reshape(100, 2)
    y = np.arange(100)
    x_tr, x_te, y_tr, y_te = split_fn(60, 40, (x, y))
    assert x_tr.shape == (60, 2) and x_te.shape == (40, 2)
    assert y_tr.shape == (60,) and y_te.shape == (40,)


def test_on_host_cpu_places_on_cpu():
    with on_host_cpu():
        x = jnp.ones(4) * 2
        assert list(x.devices())[0].platform == "cpu"
    np.testing.assert_allclose(np.asarray(x), 2.0)


def test_timed_records_seconds():
    with timed() as t:
        _ = sum(range(1000))
    assert t["seconds"] >= 0.0


# --- cache_guard: environment-fault self-healing ------------------------


def test_cache_guard_fault_classification():
    from dpivae_tpu.utils import cache_guard as cg

    stale = RuntimeError(
        'FAILED_PRECONDITION: libtpu version mismatch: terminal has "A", '
        "client AOT libtpu has \"B\""
    )
    transient = RuntimeError("UNAVAILABLE: TPU device error: socket closed")
    bug = ValueError("shapes do not match")
    assert cg.is_stale_cache_fault(stale)
    assert not cg.is_stale_cache_fault(transient)
    assert cg.is_transient_tpu_fault(transient)
    assert not cg.is_transient_tpu_fault(bug)
    assert not cg.is_stale_cache_fault(bug)


def test_cache_guard_stale_cache_self_heals(tmp_path, monkeypatch):
    """A forced stale-cache fault must clear the cache dir and retry once."""
    import dpivae_tpu
    from dpivae_tpu.utils import cache_guard as cg

    cache = tmp_path / "xla_cache"
    cache.mkdir()
    (cache / "stale_executable.bin").write_bytes(b"\x00" * 8)
    monkeypatch.setattr(dpivae_tpu, "_compilation_cache_dir", str(cache))

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "FAILED_PRECONDITION: libtpu version mismatch: the "
                "AOT-compiled executable may diverge from the runtime"
            )
        return "ok"

    assert cg.run_with_healing(fn) == "ok"
    assert calls["n"] == 2
    assert cache.exists() and list(cache.iterdir()) == []


def test_cache_guard_deterministic_bug_propagates():
    from dpivae_tpu.utils.cache_guard import run_with_healing

    def fn():
        raise ValueError("a real bug")

    import pytest

    with pytest.raises(ValueError, match="a real bug"):
        run_with_healing(fn)


def test_cache_guard_transient_retries_once(monkeypatch):
    from dpivae_tpu.utils import cache_guard as cg

    monkeypatch.setattr(cg.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: TPU device error")

    import pytest

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        cg.run_with_healing(fn)
    assert calls["n"] == 2  # one heal attempt, then propagate


def test_wait_for_device_noop_off_tunnel(monkeypatch):
    """wait_for_device must be a pure no-op (no subprocess, no sleep)
    without the axon tunnel environment — CPU tests and local-TPU users
    must not pay probe subprocesses."""
    from dpivae_tpu.utils import cache_guard as cg

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    import subprocess

    def boom(*a, **k):  # any probe attempt is a failure
        raise AssertionError("no subprocess expected off-tunnel")

    monkeypatch.setattr(subprocess, "run", boom)
    cg.wait_for_device()


def test_wait_for_device_rides_out_attach_hang(monkeypatch):
    """With the tunnel env present, a hung probe (TimeoutExpired) retries
    until the budget runs out, then returns False — never raises, never
    hangs in-process."""
    import subprocess

    from dpivae_tpu.utils import cache_guard as cg

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setattr(cg.time, "sleep", lambda s: None)
    clock = {"t": 0.0}

    def mono():
        clock["t"] += 100.0
        return clock["t"]

    monkeypatch.setattr(cg.time, "monotonic", mono)
    calls = {"n": 0}

    def hang(*a, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", hang)
    assert cg.wait_for_device(total_budget_s=500.0) is False
    assert calls["n"] >= 1


def test_run_with_healing_refuses_unreachable_device(monkeypatch):
    """With wait_device=True and the probe budget exhausted, the runner
    must raise (loud nonzero exit for unattended callers) instead of
    proceeding into an uncancellable C++ attach hang."""
    import pytest

    from dpivae_tpu.utils import cache_guard as cg

    monkeypatch.setattr(cg, "wait_for_device", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="unreachable"):
        cg.run_with_healing(lambda: "never runs", wait_device=True)


def test_model_cache_detects_recycled_id():
    """A cache entry keyed on id(model) must not survive the model object:
    if a new object reuses the address (id recycling after GC), the stale
    compiled closure — with the OLD model's fitted scalers — must be
    rebuilt, not silently returned."""
    from dpivae_tpu.utils.jit_cache import JitLRU, _model_cached

    class FakeModel:
        pass

    cache = JitLRU(8)
    m1, m2 = FakeModel(), FakeModel()
    sig = ("same-signature",)  # simulate an id collision: identical key
    built = []

    fn1 = _model_cached(cache, sig, m1, lambda: built.append(1) or "fn-m1")
    assert fn1 == "fn-m1" and built == [1]
    # same model, same sig -> cached
    assert _model_cached(cache, sig, m1, lambda: built.append(2)) == "fn-m1"
    assert built == [1]
    # DIFFERENT model under the same sig -> rebuilt, not the stale closure
    fn2 = _model_cached(cache, sig, m2, lambda: built.append(3) or "fn-m2")
    assert fn2 == "fn-m2" and built == [1, 3]
    # and the rebuilt entry now serves m2 from cache
    assert _model_cached(cache, sig, m2, lambda: built.append(4)) == "fn-m2"
    assert built == [1, 3]
