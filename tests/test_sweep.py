"""Sweep (vmap/mesh-batched training) and multi-chip sharding tests.

Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.parallel import make_mesh
from dpivae_tpu.sweep import train_sweep


def _cfg(case, **over):
    defaults = dict(
        n_train=64,
        n_val=32,
        n_batch=16,
        n_iter=20,
        val_freq=10,
        n_mc_train=2,
        n_mc_val=4,
        use_seed=True,
    )
    defaults.update(over)
    return TrainConfig().with_preset(case.presets["dpivae"]).replace(**defaults)


def test_sweep_vmap_members_differ():
    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_sweep(cfg, case, lambdas=[1 / 256, -1.0], n_runs=2)
    assert res.n_members == 4
    # member ordering is lambda-major
    np.testing.assert_allclose(
        np.asarray(res.lambdas), [1 / 256, 1 / 256, -1.0, -1.0], rtol=1e-6
    )
    # different seeds/lambdas -> different trained params
    p0 = jax.tree.leaves(res.member_params(0))[0]
    p1 = jax.tree.leaves(res.member_params(1))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # per-member logs finite
    logs = res.member_logs(0)
    assert logs.train.shape == (20, 13)
    assert np.all(np.isfinite(np.asarray(logs.train)))


def test_sweep_on_mesh():
    case = get_case("simple_beam")
    cfg = _cfg(case)
    mesh = make_mesh(8, axes=("sweep",))
    res = train_sweep(
        cfg, case, lambdas=[1 / 256] * 3, n_runs=2, mesh=mesh
    )  # 6 members padded to 8, trimmed back
    assert res.n_members == 6
    assert np.all(np.isfinite(np.asarray(res.logs.train)))


def test_sweep_mesh_matches_unsharded():
    """Sharding must not change results: same keys, same members."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(7)
    res_a = train_sweep(cfg, case, lambdas=[1 / 256, -1.0], n_runs=1, key=key)
    mesh = make_mesh(2, axes=("sweep",))
    res_b = train_sweep(
        cfg, case, lambdas=[1 / 256, -1.0], n_runs=1, key=key, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(res_a.logs.train),
        np.asarray(res_b.logs.train),
        rtol=2e-3, atol=1e-4,
    )


def test_sweep_chunk_callback_streams_every_member(tmp_path):
    """chunk_callback receives every member's host arrays (fresh AND
    resumed chunks, padding trimmed), identical to the returned result."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(13)
    seen = {}

    def on_chunk(start, params_chunk, logs_chunk):
        n = jax.tree.leaves(logs_chunk)[0].shape[0]
        for j in range(n):
            assert isinstance(jax.tree.leaves(params_chunk)[0], np.ndarray)
            seen[start + j] = np.asarray(logs_chunk.train[j])

    ckpt = str(tmp_path / "chunks")
    res = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1,
                      key=key, chunk_size=2, checkpoint_dir=ckpt,
                      chunk_callback=on_chunk)
    assert sorted(seen) == [0, 1, 2]  # 3 members, padding member trimmed
    for m in range(3):
        np.testing.assert_array_equal(
            seen[m], np.asarray(res.member_logs(m).train)
        )
    # Resumed run: the callback must still stream every member
    seen.clear()
    res_b = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1,
                        key=key, chunk_size=2, checkpoint_dir=ckpt,
                        chunk_callback=on_chunk)
    assert sorted(seen) == [0, 1, 2]
    np.testing.assert_array_equal(
        np.asarray(res.logs.train), np.asarray(res_b.logs.train)
    )
    # callback without checkpointing must also force the chunked path
    seen.clear()
    train_sweep(cfg, case, lambdas=[1 / 256], n_runs=2, key=key,
                chunk_size=4, chunk_callback=on_chunk)
    assert sorted(seen) == [0, 1]
    # mesh path has no chunk stream: must refuse loudly, not drop silently
    mesh = make_mesh(2, axes=("sweep",))
    with pytest.raises(ValueError, match="chunk_callback"):
        train_sweep(cfg, case, lambdas=[1 / 256, 0.0], n_runs=1, key=key,
                    mesh=mesh, chunk_callback=on_chunk)


def test_warm_disentanglement_latents_primes_cache():
    """The warm call must exercise the exact compile key the real
    extraction uses, and must not corrupt real results."""
    from dpivae_tpu.sweep import (
        sweep_disentanglement_latents,
        warm_disentanglement_latents,
    )
    from dpivae_tpu.sweep.sweep import _SWEEP_JIT_CACHE, _resolve_sweep_config

    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1)
    lat_ref = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=32, n_test_reg=24, chunk_size=2
    )
    # jit-cache keys carry the sweep-resolved config (use_pallas="auto"
    # resolves to the XLA path module-wide), so warm and real calls agree
    cache_key = ("disent_latents", _resolve_sweep_config(cfg),
                 case.fingerprint(), False, 1, 32, 24)
    sentinel = _SWEEP_JIT_CACHE.get(cache_key, lambda: None)
    assert sentinel is not None  # the real call populated this key ...
    warm_disentanglement_latents(cfg, case, 3, 32, 24, chunk_size=2)
    assert _SWEEP_JIT_CACHE.get(cache_key, lambda: None) is sentinel
    # ... and a post-warm real call returns the same numbers
    lat = sweep_disentanglement_latents(
        cfg, case, res, n_train_reg=32, n_test_reg=24, chunk_size=2
    )
    for k in lat_ref:
        np.testing.assert_array_equal(
            np.asarray(lat_ref[k]), np.asarray(lat[k])
        )


def test_sweep_use_pallas_auto_resolves_to_xla_path(tmp_path, monkeypatch):
    """Inside sweeps use_pallas="auto" resolves to the XLA path: the
    manifest digest equals the explicit-False digest (flipping the config
    *default* from False to "auto" must not orphan pre-flip checkpoint
    dirs), a False-written checkpoint resumes under "auto", and the
    single-run decision band (ops.pallas_mlp.auto_select) is never
    consulted by the member program."""
    from dpivae_tpu.ops import pallas_mlp
    from dpivae_tpu.sweep.sweep import _sweep_manifest

    case = get_case("simple_beam")
    arrays = [np.arange(4.0)]

    def digest(use_pallas):
        cfg = _cfg(case, use_pallas=use_pallas)
        return _sweep_manifest(cfg, case, arrays, 4)["digest"]

    assert digest("auto") == digest(False)
    assert digest("auto") != digest(True)

    # The sweep path must never consult the single-run measured band —
    # it was measured on the single-run program, not the vmapped one.
    def _boom(*a, **k):
        raise AssertionError("auto_select consulted inside a sweep")

    monkeypatch.setattr(pallas_mlp, "auto_select", _boom)

    cfg = _cfg(case, n_iter=10, use_pallas=False)
    key = jax.random.PRNGKey(3)
    ckpt = str(tmp_path / "chunks")
    res_false = train_sweep(cfg, case, lambdas=[1 / 256, 0.0], n_runs=1,
                            key=key, chunk_size=1, checkpoint_dir=ckpt)
    # same sweep under "auto": digest matches -> resumes the False chunks
    res_auto = train_sweep(cfg.replace(use_pallas="auto"), case,
                           lambdas=[1 / 256, 0.0], n_runs=1,
                           key=key, chunk_size=1, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(
        np.asarray(res_false.logs.train), np.asarray(res_auto.logs.train)
    )


def test_sweep_checkpoint_resume(tmp_path):
    """Chunk checkpoints: a rerun loads completed chunks and returns
    identical results without retraining."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(11)
    ckpt = str(tmp_path / "chunks")
    res_a = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1,
                        key=key, chunk_size=2, checkpoint_dir=ckpt)
    import os

    files = sorted(os.listdir(ckpt))
    import re

    chunk_files = [f for f in files if f.startswith("chunk_")]
    # chunk names embed the sweep identity digest + start index
    assert [re.sub(r"chunk_[0-9a-f]{12}_", "chunk_", f) for f in chunk_files] \
        == ["chunk_000000.npz", "chunk_000002.npz"]
    assert "manifest.json" in files
    # corrupt-resistant resume: second run must load, not retrain
    res_b = train_sweep(cfg, case, lambdas=[1 / 256, 0.0, -1.0], n_runs=1,
                        key=key, chunk_size=2, checkpoint_dir=ckpt)
    for a, b in zip(jax.tree.leaves(res_a.params), jax.tree.leaves(res_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(res_a.logs.train), np.asarray(res_b.logs.train)
    )


def test_checkpoint_gc_keeps_registered_sweeps_resumable(tmp_path):
    """Two interleaved sweeps share a dir; gc_stale_chunks deletes an
    unregistered third sweep's orphan chunks (and legacy digest-less
    files) while BOTH registered sweeps stay resumable."""
    import json
    import os

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    ckpt = str(tmp_path / "shared")
    key = jax.random.PRNGKey(11)
    lam_a, lam_b = [1 / 256, 0.0], [0.5, -0.5]
    res_a = train_sweep(cfg, case, lambdas=lam_a, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)
    res_b = train_sweep(cfg, case, lambdas=lam_b, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)
    # Plant an orphan from an unregistered "third sweep" + a legacy file
    orphan = os.path.join(ckpt, "chunk_deadbeef0123_000000.npz")
    legacy = os.path.join(ckpt, "chunk_000000.npz")
    np.savez(orphan.replace(".npz", ""), x=np.zeros(3))
    os.replace(orphan.replace(".npz", "") + ".npz", orphan)
    np.savez(legacy.replace(".npz", ""), x=np.zeros(3))
    os.replace(legacy.replace(".npz", "") + ".npz", legacy)
    unrelated = os.path.join(ckpt, "notes.txt")
    with open(unrelated, "w") as f:
        f.write("keep me")

    res_a2 = train_sweep(cfg, case, lambdas=lam_a, n_runs=1, key=key,
                         chunk_size=1, checkpoint_dir=ckpt,
                         gc_stale_chunks=True)
    files = set(os.listdir(ckpt))
    assert "chunk_deadbeef0123_000000.npz" not in files
    assert "chunk_000000.npz" not in files
    assert "notes.txt" in files  # non-chunk files are never touched
    # registry holds both sweeps
    with open(os.path.join(ckpt, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["history"]) == 2
    # both sweeps still resume byte-identically (A via the GC run itself,
    # B from its surviving chunks)
    np.testing.assert_array_equal(
        np.asarray(res_a.logs.train), np.asarray(res_a2.logs.train)
    )
    res_b2 = train_sweep(cfg, case, lambdas=lam_b, n_runs=1, key=key,
                         chunk_size=1, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(
        np.asarray(res_b.logs.train), np.asarray(res_b2.logs.train)
    )

    # age-based expiry: backdate sweep B's registry entry and prune
    from dpivae_tpu.sweep import clean_checkpoint_dir

    with open(os.path.join(ckpt, "manifest.json")) as f:
        manifest = json.load(f)
    # backdate one registered sweep's entry; exactly its chunks must vanish
    digest_b = sorted(manifest["history"])[0]
    manifest["history"][digest_b]["ts"] -= 10 * 86400
    with open(os.path.join(ckpt, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    deleted = clean_checkpoint_dir(ckpt, max_age_days=5)
    assert all(fn.startswith(f"chunk_{digest_b}_") for fn in deleted)
    assert len(deleted) == 2
    with open(os.path.join(ckpt, "manifest.json")) as f:
        assert digest_b not in json.load(f)["history"]

    with pytest.raises(ValueError, match="gc_stale_chunks"):
        train_sweep(cfg, case, lambdas=lam_a, n_runs=1, key=key,
                    gc_stale_chunks=True)


def test_checkpoint_dir_size_warning(tmp_path, monkeypatch):
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    ckpt = str(tmp_path / "big")
    monkeypatch.setenv("DPIVAE_CHECKPOINT_WARN_MB", "0.0001")  # ~100 bytes
    with pytest.warns(UserWarning, match="chunk checkpoints"):
        train_sweep(cfg, case, lambdas=[1 / 256, 0.0], n_runs=1,
                    key=jax.random.PRNGKey(3), chunk_size=1,
                    checkpoint_dir=ckpt)
        # the warning fires on the NEXT run over the now-populated dir
        train_sweep(cfg, case, lambdas=[1 / 256, 0.0], n_runs=1,
                    key=jax.random.PRNGKey(3), chunk_size=1,
                    checkpoint_dir=ckpt)


def test_sweep_full_resume_skips_aot_compile(tmp_path, monkeypatch):
    """A fully checkpoint-resumed train_sweep dispatches no fresh chunk,
    so the (potentially expensive) AOT wrap must never be entered — the
    lazy wrapper defers it to the first real dispatch."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(11)
    ckpt = str(tmp_path / "chunks")
    res_a = train_sweep(cfg, case, lambdas=[0.5, 0.0, -1.0], n_runs=1,
                        key=key, chunk_size=2, checkpoint_dir=ckpt)

    from dpivae_tpu.utils import aot

    def boom(*a, **k):
        raise AssertionError("aot_get must not run on a full resume")

    monkeypatch.setattr(aot, "aot_get", boom)
    monkeypatch.setenv("DPIVAE_AOT", "1")  # even with the cache forced on
    res_b = train_sweep(cfg, case, lambdas=[0.5, 0.0, -1.0], n_runs=1,
                        key=key, chunk_size=2, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(
        np.asarray(res_a.logs.train), np.asarray(res_b.logs.train)
    )


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    loss, _ = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    # In-process: conftest already forces a CPU backend with 8 virtual
    # devices, which is exactly the environment the hermetic child sets up.
    graft._dryrun_body(8)


@pytest.mark.slow
def test_graft_dryrun_subprocess_is_hermetic(monkeypatch):
    """The public dryrun_multichip wrapper must succeed from a process whose
    default platform is NOT pre-forced to CPU — the round-1 driver failure
    mode (MULTICHIP_r01.json: eager ops hit the TPU + stale AOT cache)."""
    import __graft_entry__ as graft

    # Simulate the driver env: no JAX_PLATFORMS, a conflicting device count.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    graft.dryrun_multichip(4)


def test_auto_chunk_size():
    from dpivae_tpu.sweep import auto_chunk_size

    # the reference's 66-member study at 20k iters: smallest padding-free
    # chunk >= 8 (measured optimum; see sweep.auto_chunk_size docstring)
    assert auto_chunk_size(66, 20_000) == 11
    # 48-member transfer grid: 8 divides it
    assert auto_chunk_size(48, 20_000) == 8
    # small sweeps run as one program
    assert auto_chunk_size(12, 20_000) == 12
    assert auto_chunk_size(1, 20_000) == 1
    # primes: padding-free is impossible; accept the minimum waste in the
    # flat-throughput region rather than one huge chunk
    c = auto_chunk_size(67, 20_000)
    assert 8 <= c <= 22 and (-(-67 // c)) * c - 67 <= 4
    # very long trainings cap the chunk to respect the transport deadline
    assert auto_chunk_size(66, 1_000_000) <= 2
    # every chunking covers all members
    for n in (17, 23, 48, 66, 100):
        c = auto_chunk_size(n, 20_000)
        assert (-(-n // c)) * c >= n


def test_auto_chunk_size_scales_with_member_cost():
    """Workloads heavier than the calibration config (CNN encoders, larger
    batch/MC products) must pick proportionally smaller chunks so one
    program stays under the TPU transport deadline."""
    from dpivae_tpu.sweep import auto_chunk_size, member_step_cost

    case = get_case("simple_beam")
    calib = TrainConfig().replace(
        n_batch=64, n_mc_train=16, n_val=512, n_mc_val=64, val_freq=10
    )
    assert member_step_cost(None) == 1.0
    assert member_step_cost(calib) == pytest.approx(1.0)
    heavy = calib.replace(encoder_x="CNN", encoder_c="CNN", encoder_y="CNN")
    assert member_step_cost(heavy) == pytest.approx(4.0)
    big = calib.replace(n_batch=256, n_mc_train=32)
    assert member_step_cost(big) > 2.0
    # light configs never inflate the cap (fixed step overhead floors rate)
    tiny = calib.replace(n_batch=8, n_mc_train=2, n_val=32, n_mc_val=4)
    assert member_step_cost(tiny) == 1.0

    # at 20k iters the calibration cap allows chunk 11 for 66 members;
    # the 4x-cost CNN config must cap at <= 1/4 of the member-steps
    assert auto_chunk_size(66, 20_000, calib) == 11
    c_heavy = auto_chunk_size(66, 20_000, heavy)
    assert c_heavy * 20_000 * 4.0 <= 100.0 * 20_000.0 + 1e-6
    assert c_heavy >= 1
    del case


def test_explicit_chunk_over_budget_warns():
    """A hand-picked chunk whose predicted runtime nears the ~2-minute
    transport deadline must warn (auto chunks are capped instead)."""
    import warnings

    from dpivae_tpu.sweep.sweep import _warn_if_over_budget

    with pytest.warns(UserWarning, match="transport deadline"):
        _warn_if_over_budget(66, 1_000_000, None)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # within budget: no warning
        _warn_if_over_budget(11, 20_000, None)


def test_train_sweep_auto_chunk_matches_explicit():
    case = get_case("simple_beam")
    cfg = _cfg(case)
    key = jax.random.PRNGKey(3)
    res_auto = train_sweep(cfg, case, lambdas=[0.1, -0.5], n_runs=1, key=key,
                           chunk_size="auto")
    res_one = train_sweep(cfg, case, lambdas=[0.1, -0.5], n_runs=1, key=key,
                          chunk_size=1)
    for a, b in zip(jax.tree.leaves(res_auto.params),
                    jax.tree.leaves(res_one.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_sweep_auto_mc_chunk_past_boundary(monkeypatch):
    """With the VMEM-cliff boundary monkeypatched to 1 element, a sweep's
    mc_chunk="auto" resolves to the chunked decode (the vmapped member
    count folds into the working set — benchmarks/results/
    sweep_mc_chunk.json) and trains bit-identically to an explicit
    mc_chunk sweep: after resolution the configs are EQUAL, so they share
    one jit-cache entry and one float program."""
    from dpivae_tpu.sweep.sweep import _resolve_sweep_config
    from dpivae_tpu.train import setup as setup_mod

    monkeypatch.setattr(setup_mod, "_MC_AUTO_MIN_ROWS_X_WIDTH", 1)
    case = get_case("simple_beam")
    cfg = _cfg(case, n_mc_train=4, n_mc_val=4)
    assert cfg.mc_chunk == "auto"
    # largest divisor <= 8 of both MC counts that still chunks (< 4) is 2
    assert _resolve_sweep_config(cfg, members=2).mc_chunk == 2
    key = jax.random.PRNGKey(9)
    res_auto = train_sweep(cfg, case, lambdas=[0.1, -0.5], n_runs=1,
                           key=key, chunk_size=2)
    res_expl = train_sweep(cfg.replace(mc_chunk=2), case,
                           lambdas=[0.1, -0.5], n_runs=1, key=key,
                           chunk_size=2)
    for a, b in zip(jax.tree.leaves(res_auto.params),
                    jax.tree.leaves(res_expl.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(res_auto.logs.train)))


def test_sweep_checkpoint_stale_chunk_size_recomputes(tmp_path):
    """A checkpoint chunk written under a different chunk size must be
    recomputed, not concatenated into a misaligned member axis."""
    case = get_case("simple_beam")
    cfg = _cfg(case)
    key = jax.random.PRNGKey(5)
    lambdas = [0.1, -0.2, 0.4, -0.6]
    ckpt = str(tmp_path / "chunks")
    stale = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, key=key,
                        chunk_size=3, checkpoint_dir=ckpt)
    # chunk_000000.npz now holds 3 members; resume with chunk_size=2
    res = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, key=key,
                      chunk_size=2, checkpoint_dir=ckpt)
    fresh = train_sweep(cfg, case, lambdas=lambdas, n_runs=1, key=key,
                        chunk_size=2)
    for a, b in zip(jax.tree.leaves(res.params), jax.tree.leaves(fresh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    del stale


def test_sweep_typed_keys_chunked():
    """Typed jax.random.key members survive host-side chunk slicing."""
    case = get_case("simple_beam")
    cfg = _cfg(case)
    key = jax.random.key(7, impl="threefry2x32")
    res = train_sweep(cfg, case, lambdas=[0.1, -0.2, 0.4], n_runs=1,
                      key=key, chunk_size=2)
    assert res.n_members == 3
    assert np.all(np.isfinite(np.asarray(res.logs.train)))


def test_hyper_sweep_identity_and_effect():
    """Sweeping a field at its config value reproduces the vanilla sweep
    member exactly; different values produce different training."""
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case)
    key = jax.random.PRNGKey(9)
    res = train_hyper_sweep(
        cfg, case, grid={"lr_e": [cfg.lr_e, cfg.lr_e * 10.0]},
        key=key,
    )
    assert res.n_members == 2
    assert res.member_overrides(1)["lr_e"] == pytest.approx(cfg.lr_e * 10)
    # a single-member vanilla sweep shares the run key (paired seeds)
    vanilla = train_sweep(
        cfg, case, lambdas=[cfg.lambda_g0], n_runs=1, key=key
    )
    # member 0 swept at the config value == the vanilla member (same key)
    for a, b in zip(
        jax.tree.leaves(res.member_params(0)),
        jax.tree.leaves(vanilla.member_params(0)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # member 1 shares the SAME run key (paired) but trains with 10x lr —
    # the hyperparameter effect, isolated from sampling noise, must show
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree.leaves(res.member_params(1)),
            jax.tree.leaves(res.member_params(0)),
        )
    ]
    assert max(diffs) > 1e-4


def test_hyper_sweep_pairs_run_keys_across_rows():
    """Grid rows reuse the same run-keys, so each seed's dataset draw is
    identical across hyperparameter settings (paired comparisons)."""
    from dpivae_tpu.sweep import member_datasets, train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=2, val_freq=1)
    res = train_hyper_sweep(
        cfg, case, grid={"lr_e": [1e-3, 1e-2, 1e-1]}, n_runs=2,
        key=jax.random.PRNGKey(13),
    )
    assert res.n_members == 6
    keys = np.asarray(res.keys)
    # member = row * n_runs + run: run 0 key identical across all 3 rows
    np.testing.assert_array_equal(keys[0], keys[2])
    np.testing.assert_array_equal(keys[0], keys[4])
    np.testing.assert_array_equal(keys[1], keys[5])
    # distinct runs have distinct keys
    assert not np.array_equal(keys[0], keys[1])
    # and the replayed datasets are therefore shared row-to-row
    d0, _ = member_datasets(cfg, case, res.keys[0])
    d2, _ = member_datasets(cfg, case, res.keys[2])
    np.testing.assert_array_equal(np.asarray(d0[0]), np.asarray(d2[0]))


def test_hyper_sweep_multi_field_chunked():
    """Multi-field grids (wd + beta) train chunked with finite logs."""
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_hyper_sweep(
        cfg, case,
        grid={"wd_e": [0.0, 1e-3, 1e-2], "beta_x0": [1.0, 0.5, 2.0]},
        key=jax.random.PRNGKey(11), chunk_size=2,
    )
    assert res.n_members == 3
    assert np.all(np.isfinite(np.asarray(res.logs.train)))
    host = res.host()
    assert isinstance(host.member_logs(2).train, np.ndarray)


def test_hyper_sweep_rejects_untraceable_field():
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case)
    with pytest.raises(ValueError, match="not traceable"):
        train_hyper_sweep(cfg, case, grid={"n_batch": [8, 16]})


def test_hyper_sweep_mesh_matches_unsharded():
    """train_hyper_sweep(mesh=...) — including a 2-D (sweep, dp) mesh —
    must reproduce the unsharded grid member-for-member."""
    from dpivae_tpu.parallel import make_mesh
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(21)
    grid = {"lr_e": [1e-3, 1e-2]}
    res_plain = train_hyper_sweep(cfg, case, grid=grid, n_runs=2, key=key)
    mesh = make_mesh(8, axes=("sweep", "dp"), shape=(2, 4))
    res_mesh = train_hyper_sweep(cfg, case, grid=grid, n_runs=2, key=key,
                                 mesh=mesh)
    assert res_mesh.n_members == 4
    np.testing.assert_allclose(
        np.asarray(res_plain.logs.train), np.asarray(res_mesh.logs.train),
        rtol=2e-3, atol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(res_plain.params),
                    jax.tree.leaves(res_mesh.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_export_member_servable(tmp_path):
    """export_member replays the member's data for scaler parity and
    writes a checkpoint load_model restores to identical sample outputs,
    from BOTH a device-resident and a host() SweepResult."""
    from dpivae_tpu.sweep import export_member
    from dpivae_tpu.train.checkpoint import load_model
    from dpivae_tpu.utils.data import sample_response

    case = get_case("simple_beam")
    cfg = _cfg(case)
    res = train_sweep(cfg, case, lambdas=[1 / 256, -1.0], n_runs=1)

    model, params = export_member(cfg, case, res, 1, str(tmp_path / "m1"))
    model2, params2 = load_model(str(tmp_path / "m1"), case)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    key = jax.random.PRNGKey(9)
    dte = sample_response(case, key, 8, sample_dist=case.gt_dist())
    out_a = model.sample(params, key, dte[0], dte[1], n=2)
    out_b = model2.sample(params2, key, dte[0], dte[1], n=2)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # host() degrades typed keys to raw key data; export must still replay
    # the same member (identical scalers/params -> identical checkpoint)
    model3, params3 = export_member(
        cfg, case, res.host(), 1, str(tmp_path / "m1h")
    )
    np.testing.assert_allclose(
        np.asarray(model.transform_x.mean), np.asarray(model3.transform_x.mean)
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    import json

    with open(tmp_path / "m1.meta.json") as f:
        meta = json.load(f)
    assert meta["sweep_member"] == 1
    np.testing.assert_allclose(meta["lambda"], -1.0, rtol=1e-6)
    assert meta["case"] == "simple_beam"

    # Serving-artifact variant: the same member exports as a StableHLO
    # predictor whose outputs match the restored model's MC-mean exactly
    from dpivae_tpu.serving import build_predict_fn, load_predictor
    from dpivae_tpu.sweep import export_member_predictor

    shlo = export_member_predictor(
        cfg, case, res, 1, str(tmp_path / "m1.shlo"),
        platforms=("cpu",), n=3,
    )
    served = load_predictor(shlo)
    assert served.meta["lambda_g0"] == -1.0  # member λ, not cfg.lambda_g0
    x, c = np.asarray(dte[0]), np.asarray(dte[1])
    got = served(x, c, seed=5)
    predict = build_predict_fn(model, params, cfg, n=3)
    key_data = np.asarray(
        jax.random.key_data(jax.random.PRNGKey(5)), np.uint32
    )
    (want_y,) = predict(key_data, x, c)
    np.testing.assert_allclose(got["y"], np.asarray(want_y), rtol=1e-5,
                               atol=1e-6)


def test_sweep_checkpoint_foreign_grid_not_resumed(tmp_path):
    """Chunk files whose member count happens to match but that were
    written by a DIFFERENT sweep (different λ grid here) must be ignored:
    the manifest digest of (config, case, grid, keys) detects the
    mismatch and the run recomputes instead of silently resuming."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(13)
    ckpt = str(tmp_path / "chunks")
    grid_a = [0.5, -0.5]
    grid_b = [0.05, -0.9]  # same member count, different sweep
    res_a = train_sweep(cfg, case, lambdas=grid_a, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)
    res_b = train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)
    fresh_b = train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                          chunk_size=1)
    # B must equal a clean B run, and differ from the stale A chunks
    for a, b in zip(jax.tree.leaves(res_b.params),
                    jax.tree.leaves(fresh_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    pa = np.asarray(jax.tree.leaves(res_a.params)[0])
    pb = np.asarray(jax.tree.leaves(res_b.params)[0])
    assert not np.allclose(pa, pb)
    # ...and the refreshed manifest lets the B grid resume normally now
    res_b2 = train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                         chunk_size=1, checkpoint_dir=ckpt)
    for a, b in zip(jax.tree.leaves(res_b.params),
                    jax.tree.leaves(res_b2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_interrupted_recompute_cannot_resume_foreign_chunks(tmp_path):
    """An interrupted recompute must not resurrect the PREVIOUS sweep's
    later chunks: chunk filenames embed the sweep identity digest, so a
    healing rerun of sweep B can only ever resume chunks B wrote — while
    sweep A's completed chunks stay on disk and A remains resumable."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(13)
    ckpt = str(tmp_path / "chunks")
    grid_a = [0.5, -0.5]
    res_a = train_sweep(cfg, case, lambdas=grid_a, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)  # A completes

    calls = []

    def boom(start, params_chunk, logs_chunk):
        calls.append(start)
        raise RuntimeError("interrupt after the first chunk")

    grid_b = [0.05, -0.9]  # same member count as A, different sweep
    with pytest.raises(RuntimeError):
        train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                    chunk_size=1, checkpoint_dir=ckpt, chunk_callback=boom)
    assert calls == [0]  # B checkpointed chunk 0, then died
    # Healing rerun: B's chunk 0 resumes, and chunk 1 must be RECOMPUTED
    # as B — A's chunk-1 file carries A's digest in its name, so keying
    # chunks by start index alone would silently load A's member here.
    res_b = train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                        chunk_size=1, checkpoint_dir=ckpt)
    fresh_b = train_sweep(cfg, case, lambdas=grid_b, n_runs=1, key=key,
                          chunk_size=1)
    for a, b in zip(jax.tree.leaves(res_b.params),
                    jax.tree.leaves(fresh_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # ... and A's checkpoints survived B entirely: a rerun of A resumes
    # every chunk byte-identically even with B's files interleaved.
    res_a2 = train_sweep(cfg, case, lambdas=grid_a, n_runs=1, key=key,
                         chunk_size=1, checkpoint_dir=ckpt)
    for a, b in zip(jax.tree.leaves(res_a.params),
                    jax.tree.leaves(res_a2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hyper_sweep_field_names_guard_resume(tmp_path):
    """Two grids over DIFFERENT hyperparameter fields can hold
    byte-identical value columns yet train different members; the manifest
    digests the field names, so the second sweep recomputes instead of
    resuming the first's chunks."""
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    vals = [3e-3, 3e-4]
    ckpt = str(tmp_path / "chunks")
    res_a = train_hyper_sweep(cfg, case, {"lr_e": vals}, n_runs=1,
                              chunk_size=1, checkpoint_dir=ckpt)
    res_b = train_hyper_sweep(cfg, case, {"lr_dx": vals}, n_runs=1,
                              chunk_size=1, checkpoint_dir=ckpt)
    fresh_b = train_hyper_sweep(cfg, case, {"lr_dx": vals}, n_runs=1,
                                chunk_size=1)
    for a, b in zip(jax.tree.leaves(res_b.params),
                    jax.tree.leaves(fresh_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # sanity: the two grids really do train different members
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(res_a.params),
                        jax.tree.leaves(res_b.params))
    )


def test_hyper_sweep_checkpoint_resume_and_callback(tmp_path):
    """train_hyper_sweep shares the chunked engine: chunk checkpoints
    resume identically and chunk_callback streams host chunks."""
    from dpivae_tpu.sweep import train_hyper_sweep

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    grid = {"lr_e": [1e-3, 3e-4, 1e-4]}
    ckpt = str(tmp_path / "chunks")
    seen = []

    def cb(start, params_chunk, logs_chunk):
        seen.append((start, jax.tree.leaves(logs_chunk)[0].shape[0]))

    res_a = train_hyper_sweep(cfg, case, grid, n_runs=1, chunk_size=2,
                              checkpoint_dir=ckpt, chunk_callback=cb)
    assert seen == [(0, 2), (2, 1)]  # 3 members, chunk 2: trimmed tail
    res_b = train_hyper_sweep(cfg, case, grid, n_runs=1, chunk_size=2,
                              checkpoint_dir=ckpt)
    for a, b in zip(jax.tree.leaves(res_a.params),
                    jax.tree.leaves(res_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # foreign grid (same member count) is not resumed
    res_c = train_hyper_sweep(cfg, case, {"lr_e": [5e-3, 5e-4, 5e-5]},
                              n_runs=1, chunk_size=2, checkpoint_dir=ckpt)
    fresh_c = train_hyper_sweep(cfg, case, {"lr_e": [5e-3, 5e-4, 5e-5]},
                                n_runs=1, chunk_size=2)
    for a, b in zip(jax.tree.leaves(res_c.params),
                    jax.tree.leaves(fresh_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_data_sweep_checkpoint_resume_and_callback(tmp_path):
    """train_sweep_data shares the chunked engine; the manifest digests
    the per-member datasets, so swapping data never resumes foreign
    chunks."""
    from dpivae_tpu.sweep import train_sweep_data
    from dpivae_tpu.utils.data import sample_response

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    key = jax.random.PRNGKey(21)

    def make_data(salt):
        ks = jax.random.split(jax.random.fold_in(key, salt), 6)
        mk = lambda k, n: jax.tree.map(
            np.asarray,
            sample_response(case, k, n, sample_dist=case.gt_dist())[:3],
        )
        stack = lambda parts: tuple(
            np.stack([p[i] for p in parts]) for i in range(3)
        )
        return (stack([mk(k, cfg.n_train) for k in ks[:3]]),
                stack([mk(k, cfg.n_val) for k in ks[3:]]))

    dtr_a, dva_a = make_data(0)
    lam = np.zeros(3, np.float32)
    ckpt = str(tmp_path / "chunks")
    seen = []
    res_a = train_sweep_data(
        cfg, case, lam, dtr_a, dva_a, key=key, chunk_size=2,
        checkpoint_dir=ckpt,
        chunk_callback=lambda s, p, l: seen.append(s),
    )
    assert seen == [0, 2]
    res_b = train_sweep_data(cfg, case, lam, dtr_a, dva_a, key=key,
                             chunk_size=2, checkpoint_dir=ckpt)
    for a, b in zip(jax.tree.leaves(res_a.params),
                    jax.tree.leaves(res_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different datasets, same shapes -> manifest mismatch -> recompute
    dtr_c, dva_c = make_data(1)
    res_c = train_sweep_data(cfg, case, lam, dtr_c, dva_c, key=key,
                             chunk_size=2, checkpoint_dir=ckpt)
    fresh_c = train_sweep_data(cfg, case, lam, dtr_c, dva_c, key=key,
                               chunk_size=2)
    for a, b in zip(jax.tree.leaves(res_c.params),
                    jax.tree.leaves(fresh_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_expired_latest_digest_stays_expired(tmp_path):
    """max_age_days expiry of the manifest's OWN (latest-sweep) digest must
    stick: later manifest reads/writes must not resurrect it into the
    registry as a ts-None entry that is then exempt from every future
    expiry pass."""
    import json
    import os

    from dpivae_tpu.sweep import clean_checkpoint_dir
    from dpivae_tpu.sweep.sweep import _manifest_history, _read_manifest

    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    ckpt = str(tmp_path / "ck")
    train_sweep(cfg, case, lambdas=[0.5, 0.0], n_runs=1,
                key=jax.random.PRNGKey(0), chunk_size=1,
                checkpoint_dir=ckpt)
    path = os.path.join(ckpt, "manifest.json")
    with open(path) as f:
        manifest = json.load(f)
    latest = manifest["digest"][:12]
    assert latest in manifest["history"]
    manifest["history"][latest]["ts"] -= 10 * 86400
    with open(path, "w") as f:
        json.dump(manifest, f)

    deleted = clean_checkpoint_dir(ckpt, max_age_days=5)
    assert deleted, "backdated latest sweep's chunks must be GCed"
    # the registry folding path must NOT bring the expired digest back
    history = _manifest_history(_read_manifest(ckpt))
    assert latest not in history
    # and a second expiry pass stays clean (no ts-None resurrection)
    assert clean_checkpoint_dir(ckpt, max_age_days=5) == []
    assert latest not in _manifest_history(_read_manifest(ckpt))


def test_mesh_path_rejects_checkpoint_dir(tmp_path):
    """checkpoint_dir/gc_stale_chunks silently did nothing on the mesh
    path (it runs as one sharded program, no chunks) — now they raise."""
    case = get_case("simple_beam")
    cfg = _cfg(case)
    mesh = make_mesh(2, axes=("sweep",))
    with pytest.raises(ValueError, match="non-mesh"):
        train_sweep(cfg, case, lambdas=[0.5, 0.0], n_runs=1,
                    key=jax.random.PRNGKey(0), mesh=mesh,
                    checkpoint_dir=str(tmp_path / "ck"))


def test_checkpoint_warn_env_malformed(tmp_path, monkeypatch):
    """A non-numeric DPIVAE_CHECKPOINT_WARN_MB must not crash sweeps —
    the cosmetic size warning falls back to the default threshold."""
    case = get_case("simple_beam")
    cfg = _cfg(case, n_iter=10)
    monkeypatch.setenv("DPIVAE_CHECKPOINT_WARN_MB", "512MB")
    with pytest.warns(UserWarning, match="non-numeric"):
        train_sweep(cfg, case, lambdas=[0.5], n_runs=1,
                    key=jax.random.PRNGKey(0), chunk_size=1,
                    checkpoint_dir=str(tmp_path / "ck"))
