"""Disk-backed AOT executable cache (utils/aot.py).

Runs the REAL serialize/deserialize path on the CPU backend (the probe
verified the identical API on TPU; benchmarks/experiments/aot_probe.py)."""

import os
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.utils import aot


@pytest.fixture
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DPIVAE_AOT", "1")
    monkeypatch.setenv("DPIVAE_AOT_DIR", str(tmp_path))
    return tmp_path


def _unique_key():
    return ("test", uuid.uuid4().hex)


def test_roundtrip_and_disk_hit(aot_env):
    key_parts = _unique_key()
    x = jnp.arange(12.0).reshape(3, 4)
    built = []

    def build():
        built.append(1)
        return jax.jit(lambda a: (a * 2).sum(axis=1))

    fn = aot.aot_get(key_parts, build, (x,))
    expect = np.asarray(jax.jit(lambda a: (a * 2).sum(axis=1))(x))
    np.testing.assert_array_equal(np.asarray(fn(x)), expect)
    assert built == [1]
    pkls = [p for p in os.listdir(aot_env) if p.endswith(".pkl")]
    assert len(pkls) == 1

    # Simulate a fresh process: clear the in-memory layer; the disk entry
    # must serve the executable WITHOUT calling build.
    aot._MEM._entries.clear()
    fn2 = aot.aot_get(key_parts, build, (x,))
    np.testing.assert_array_equal(np.asarray(fn2(x)), expect)
    assert built == [1], "disk hit must not rebuild"


def test_corrupt_entry_recompiles(aot_env):
    key_parts = _unique_key()
    x = jnp.ones((4,))
    build = lambda: jax.jit(lambda a: a + 3)
    aot.aot_get(key_parts, build, (x,))
    (pkl,) = [aot_env / p for p in os.listdir(aot_env) if p.endswith(".pkl")]
    pkl.write_bytes(b"not a pickle")
    aot._MEM._entries.clear()
    fn = aot.aot_get(key_parts, build, (x,))
    np.testing.assert_array_equal(np.asarray(fn(x)), np.full(4, 4.0))
    assert pkl.read_bytes() != b"not a pickle", "entry must be rewritten"


def test_distinct_shapes_distinct_entries(aot_env):
    key_parts = _unique_key()
    build = lambda: jax.jit(lambda a: a.sum())
    f3 = aot.aot_get(key_parts, build, (jnp.ones((3,)),))
    f5 = aot.aot_get(key_parts, build, (jnp.ones((5,)),))
    assert float(f3(jnp.ones((3,)))) == 3.0
    assert float(f5(jnp.ones((5,)))) == 5.0
    assert len([p for p in os.listdir(aot_env) if p.endswith(".pkl")]) == 2


def test_disabled_returns_jitted(tmp_path, monkeypatch):
    monkeypatch.setenv("DPIVAE_AOT", "0")
    monkeypatch.setenv("DPIVAE_AOT_DIR", str(tmp_path))
    jitted = jax.jit(lambda a: a * 2)
    fn = aot.aot_get(_unique_key(), lambda: jitted, (jnp.ones(()),))
    assert fn is jitted
    assert not list(tmp_path.iterdir())


def test_default_enabled_policy():
    """On by default only for locally-attached accelerators: off on CPU
    (tests/dryruns must not write executables) and off through the
    tunneled axon proxy (the first-call executable upload costs more
    than the compile it saves — see module docstring). Env overrides
    both ways."""
    d = aot._default_enabled
    assert d(None, "cpu", "cpu") is False
    assert d(None, "tpu", "axon,cpu") is False  # tunneled proxy
    assert d(None, "tpu", "") is True  # real local TPU
    assert d("1", "cpu", "cpu") is True
    assert d("0", "tpu", "") is False
    # Natural falsey spellings must not silently force-enable
    for off in ("False", "FALSE", "no", "off", " 0 "):
        assert d(off, "tpu", "") is False, off


def test_prune_bounds_directory(aot_env, monkeypatch):
    monkeypatch.setenv("DPIVAE_AOT_MAX_MB", "0.0001")  # ~100 bytes
    build = lambda: jax.jit(lambda a: a + 1)
    aot.aot_get(_unique_key(), build, (jnp.ones((2,)),))
    aot.aot_get(_unique_key(), build, (jnp.ones((2, 2)),))
    # after the second write, pruning removes the oldest over-budget files
    pkls = [p for p in os.listdir(aot_env) if p.endswith(".pkl")]
    assert len(pkls) <= 1


def test_typed_key_args_roundtrip(aot_env):
    """Sweep programs take typed PRNG-key arrays as inputs."""
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    build = lambda: jax.jit(
        jax.vmap(lambda k: jax.random.uniform(k, (2,)))
    )
    fn = aot.aot_get(_unique_key(), build, (keys,))
    out = np.asarray(fn(keys))
    expect = np.asarray(jax.vmap(lambda k: jax.random.uniform(k, (2,)))(keys))
    np.testing.assert_array_equal(out, expect)


def test_call_fallback_on_sharding_mismatch(aot_env):
    """A cached executable is placement-specialized; args committed to a
    different device/sharding must FALL BACK to the jit path (correct
    result), not crash — the cache may only ever cost time."""
    key_parts = _unique_key()
    x = jnp.arange(8.0)
    build = lambda: jax.jit(lambda a: a * 2)
    fn = aot.aot_get(key_parts, build, (jax.device_put(x, jax.devices()[0]),))
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(x) * 2)
    # Same shapes, different placement: committed to another device
    other = jax.device_put(x, jax.devices()[1])
    np.testing.assert_array_equal(np.asarray(fn(other)), np.asarray(x) * 2)


def test_digest_distinguishes_sharding(aot_env):
    """Args committed to different devices must map to different cache
    entries (an executable lowered for device 0 cannot serve device 1)."""
    key_parts = _unique_key()
    x = jnp.ones((4,))
    build = lambda: jax.jit(lambda a: a + 1)
    aot.aot_get(key_parts, build, (jax.device_put(x, jax.devices()[0]),))
    aot.aot_get(key_parts, build, (jax.device_put(x, jax.devices()[1]),))
    assert len([p for p in os.listdir(aot_env) if p.endswith(".pkl")]) == 2


def test_case_fingerprint_keys_content_not_name():
    """Two same-name cases with different physics must not share compiled
    programs (AOT keys use Case.fingerprint, not the name)."""
    import dataclasses

    from dpivae_tpu.cases import get_case

    base = get_case("simple_beam")
    other = dataclasses.replace(base, sigma_y=base.sigma_y * 3.0)
    assert base.fingerprint() == get_case("simple_beam").fingerprint()
    assert base.fingerprint() != other.fingerprint()


def test_train_sweep_aot_matches_plain(aot_env):
    """The executable-cache path must be bit-identical to the jit path on
    a real (tiny) training sweep, including across a simulated fresh
    process (disk hit)."""
    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig
    from dpivae_tpu.sweep import train_sweep

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_iter=6, val_freq=3, n_train=32, n_val=16, n_batch=8,
        n_mc_train=2, n_mc_val=2, use_seed=True,
    )
    lambdas = [0.0, 0.1]

    os.environ["DPIVAE_AOT"] = "0"
    try:
        plain = train_sweep(cfg, case, lambdas, n_runs=1, chunk_size=None)
    finally:
        os.environ["DPIVAE_AOT"] = "1"
    cached = train_sweep(cfg, case, lambdas, n_runs=1, chunk_size=None)
    aot._MEM._entries.clear()
    reloaded = train_sweep(cfg, case, lambdas, n_runs=1, chunk_size=None)

    for other in (cached, reloaded):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            plain.params, other.params,
        )
        np.testing.assert_array_equal(
            np.asarray(plain.logs.train), np.asarray(other.logs.train)
        )
