"""mc_chunk: MC-axis chunking of the loss's decode.

The mc64 rows of benchmarks/results/scaling.json collapse superlinearly
(7.4-7.8x for 4x work) because the (n_mc*n_batch, width) decode
activations outgrow VMEM and every matmul->matmul edge becomes an HBM
round-trip (docs/PERFORMANCE.md "The MC-axis collapse"). mc_chunk scans
the decode over equal MC chunks so the per-chunk working set stays
resident. The math is an exact reassociation of the MC means, so the
contract pinned here is *equality up to summation order* with the
unchunked loss — values AND gradients — plus config validation and
composition with bf16/remat/the fused trainer/the sweep vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train import setup_model


@pytest.fixture(scope="module")
def beam_setup():
    from dpivae_tpu.utils.data import sample_response

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=40, val_freq=10, patience=10**9
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dtr = jax.tree.map(
        np.asarray, sample_response(case, k1, cfg.n_train,
                                    sample_dist=case.gt_dist())
    )
    dva = jax.tree.map(
        np.asarray, sample_response(case, k2, cfg.n_val,
                                    sample_dist=case.gt_dist())
    )
    return case, cfg, dtr, dva


def _loss_tuple_and_grad(cfg, case, dtr, n=8, preset=None):
    if preset is not None:
        cfg = cfg.with_preset(preset)
    model = setup_model(cfg, case, dtr)
    params = model.init(jax.random.PRNGKey(1))
    x, c, y = (jnp.asarray(a[:16]) for a in dtr[:3])
    out = model.loss(params, jax.random.PRNGKey(2), x, c, y, n=n,
                     grl_alpha=jnp.asarray(0.5))

    def f(p):
        return jnp.sum(model.loss(p, jax.random.PRNGKey(2), x, c, y, n=n,
                                  grl_alpha=jnp.asarray(0.5))[0])

    return out, jax.grad(f)(params)


def _assert_tree_close(t0, t1, rtol=5e-6):
    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=1e-5 * max(1.0, np.abs(a).max())
        )

    jax.tree.map(close, t0, t1)


# Gradient tolerance: the chunked backward accumulates per-chunk weight-
# grad matmuls in a different order than the single (n*batch)-row matmul,
# so f32 grads agree only to reassociation noise (~3e-5 rel observed on
# the bridge/P case). Verified pure rounding: the same comparison under
# jax_enable_x64 agrees to 5.6e-14 relative (worst leaf).
_GRAD_RTOL = 2e-4


class TestConfigValidation:
    @pytest.mark.parametrize("bad", [0, -2, "4", 2.0, "Auto", "none", True])
    def test_non_positive_or_non_int_raises(self, bad):
        with pytest.raises(ValueError, match="mc_chunk"):
            TrainConfig(mc_chunk=bad)

    def test_non_divisor_of_n_mc_train_raises(self):
        with pytest.raises(ValueError, match="n_mc_train"):
            TrainConfig(mc_chunk=3, n_mc_train=16)

    def test_non_divisor_of_n_mc_val_raises(self):
        with pytest.raises(ValueError, match="n_mc_val"):
            TrainConfig(mc_chunk=4, n_mc_train=16, n_mc_val=6)

    def test_divisor_ok_and_oversized_ok(self):
        TrainConfig(mc_chunk=4, n_mc_train=16, n_mc_val=64)
        # mc_chunk >= every MC count: chunking is a no-op, not an error
        TrainConfig(mc_chunk=128, n_mc_train=16, n_mc_val=64)


class TestExactness:
    def test_loss_tuple_and_grads_match_unchunked_s(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        out0, g0 = _loss_tuple_and_grad(cfg, case, dtr, n=8)
        out1, g1 = _loss_tuple_and_grad(
            cfg.replace(mc_chunk=2), case, dtr, n=8
        )
        # KL terms never enter the scan: bit-identical
        for i in (1, 2, 3):
            np.testing.assert_array_equal(np.asarray(out0[i]),
                                          np.asarray(out1[i]))
        # Reconstruction terms + loss: equal up to summation order
        _assert_tree_close(tuple(out0), tuple(out1))
        _assert_tree_close(g0, g1, rtol=_GRAD_RTOL)

    def test_loss_matches_unchunked_p_with_c_phys(self, beam_setup):
        # bridge: P-variant coverage + idx_c_phys concat inside the
        # chunked zx_in (the one case with a physical covariate)
        _, cfg, _, _ = beam_setup
        from dpivae_tpu.utils.data import sample_response

        case = get_case("bridge")
        cfg = cfg.with_preset(case.presets["DPIVAE-A"]).replace(
            n_train=64, n_val=32
        )
        dtr = jax.tree.map(
            np.asarray,
            sample_response(case, jax.random.PRNGKey(4), cfg.n_train,
                            sample_dist=case.gt_dist()),
        )
        out0, g0 = _loss_tuple_and_grad(cfg, case, dtr, n=6)
        out1, g1 = _loss_tuple_and_grad(
            cfg.replace(mc_chunk=2), case, dtr, n=6
        )
        _assert_tree_close(tuple(out0), tuple(out1))
        _assert_tree_close(g0, g1, rtol=_GRAD_RTOL)

    def test_oversized_chunk_is_bit_identical_noop(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        out0, _ = _loss_tuple_and_grad(cfg, case, dtr, n=4)
        out1, _ = _loss_tuple_and_grad(
            cfg.replace(mc_chunk=64), case, dtr, n=4
        )
        for a, b in zip(out0, out1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_non_divisor_n_raises_at_loss(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        model = setup_model(cfg.replace(mc_chunk=4), case, dtr)
        params = model.init(jax.random.PRNGKey(1))
        x, c, y = (jnp.asarray(a[:8]) for a in dtr[:3])
        with pytest.raises(ValueError, match="mc_chunk"):
            model.loss(params, jax.random.PRNGKey(2), x, c, y, n=6)


class TestAutoResolve:
    """mc_chunk="auto" (the default) resolves via the measured VMEM
    residency-cliff boundary (train.setup.resolve_mc_chunk): chunk with 8
    (or the largest divisor <= 8 of both MC counts) exactly when
    n_mc_train*n_batch*width >= 32M, None everywhere below — in
    particular at every reference shape — and None on a TPU generation
    other than the one the cliff was measured on."""

    def _resolve(self, **kw):
        from dpivae_tpu.train.setup import resolve_mc_chunk

        width = kw.pop("width", 512)
        return resolve_mc_chunk(TrainConfig(**kw), width)

    def test_default_is_auto(self):
        assert TrainConfig().mc_chunk == "auto"

    def test_reference_shapes_resolve_none(self):
        # 16*64*128 = 131k rows*width — three orders below the cliff
        assert self._resolve(width=128) is None

    def test_past_cliff_resolves_chunk8(self):
        # w512_b1024_mc64 = exactly the 32M threshold cell (measured
        # mc8 1.31x there; benchmarks/results/scaled_arms.json)
        assert self._resolve(n_mc_train=64, n_batch=1024,
                             n_mc_val=64) == 8

    def test_below_cliff_stays_single_shot(self):
        # w256_b1024_mc64 = 16.8M: the chunked arm measured 0.75x there
        assert self._resolve(n_mc_train=64, n_batch=1024, n_mc_val=64,
                             width=256) is None

    def test_divisor_fallback(self):
        # 8 does not divide n_mc_train=12 -> largest divisor <= 8 is 6
        assert self._resolve(n_mc_train=12, n_batch=8192,
                             n_mc_val=12) == 6

    def test_val_divisibility_constrains(self):
        # n_mc_val=20 rejects 8 (20 % 8), falls to 4 (64 % 4 == 20 % 4 == 0)
        assert self._resolve(n_mc_train=64, n_batch=1024,
                             n_mc_val=20) == 4

    def test_small_val_count_is_exempt(self):
        # n_mc_val <= chunk: the val loss runs single-shot (mc_chunk >= n
        # is a no-op in the model), so it does not constrain the choice
        assert self._resolve(n_mc_train=64, n_batch=1024,
                             n_mc_val=4) == 8

    def test_explicit_values_pass_through(self):
        assert self._resolve(mc_chunk=None, n_mc_train=64,
                             n_batch=1024) is None
        assert self._resolve(mc_chunk=16, n_mc_train=64, n_mc_val=64,
                             n_batch=1024) == 16

    def test_other_tpu_kind_warns_and_stays_single_shot(self, monkeypatch):
        from dpivae_tpu.train import setup as setup_mod

        class _FakeDev:
            device_kind = "TPU v6 lite"

        # the guard does `import jax` at call time, so patch jax itself
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "devices", lambda: [_FakeDev()])
        monkeypatch.setattr(setup_mod, "_mc_warned_device_kind", set())
        with pytest.warns(UserWarning, match="TPU v6 lite"):
            got = self._resolve(n_mc_train=64, n_batch=1024, n_mc_val=64)
        assert got is None
        # second resolve: warned once, still single-shot, no new warning
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert self._resolve(n_mc_train=64, n_batch=1024,
                                 n_mc_val=64) is None

    def test_setup_model_resolves_auto(self, beam_setup):
        # end-to-end: the default config (mc_chunk="auto") builds a model
        # with the single-shot decode at reference shapes
        case, cfg, dtr, _ = beam_setup
        assert cfg.mc_chunk == "auto"
        assert setup_model(cfg, case, dtr).mc_chunk is None

    def test_setup_model_chunks_past_cliff(self, beam_setup):
        # w512_b1024_mc64 (the 32M threshold cell): the built model
        # carries the auto-resolved chunk (setup only assembles config,
        # so the big shapes are never materialized here)
        case, cfg, dtr, _ = beam_setup
        cfg = cfg.replace(n_batch=1024, n_mc_train=64, n_mc_val=64,
                          n_train=1024, hidden_width=512)
        assert setup_model(cfg, case, dtr).mc_chunk == 8

    def test_sweep_resolver_members_aware_boundary(self):
        # The vmapped regime is MEASURED (benchmarks/results/
        # sweep_mc_chunk.json): the 32M-element boundary transfers once
        # the per-program member count multiplies the working set —
        # 11 members x mc64 x b64 x w512 = 22M total ran chunk8 at 0.73x
        # (stay single-shot), 11 x mc64 x b128 x w512 = 44M at 1.48x
        # (chunk). members=None (exports, mesh paths, standalone
        # build_member_fn) keeps the pre-measurement None resolution, so
        # reference-shape manifest digests are unchanged.
        from dpivae_tpu.sweep.sweep import _resolve_sweep_config

        assert _resolve_sweep_config(TrainConfig()).mc_chunk is None
        assert _resolve_sweep_config(TrainConfig(), members=11).mc_chunk \
            is None  # reference shape: 11*16*64*128 = 1.4M, ~20x below
        scaled = TrainConfig(n_mc_train=64, n_batch=128, n_mc_val=64,
                             hidden_width=512)
        assert _resolve_sweep_config(scaled).mc_chunk is None
        assert _resolve_sweep_config(scaled, members=11).mc_chunk == 8
        edge = scaled.replace(n_batch=64)  # 22M: measured 0.73x
        assert _resolve_sweep_config(edge, members=11).mc_chunk is None
        # explicit values pass through untouched either way
        assert _resolve_sweep_config(
            TrainConfig(mc_chunk=8, n_mc_train=16, n_mc_val=64), members=11
        ).mc_chunk == 8


def test_auto_pallas_resolves_on_chunked_rows(beam_setup):
    """The band's 65536-row shape chunked to 16384 rows per scan step must
    resolve auto -> XLA (the kernel would run on the chunked op)."""
    case, cfg, dtr, _ = beam_setup
    in_band = cfg.replace(
        use_pallas="auto", n_batch=1024, n_mc_train=64, n_train=1024,
        hidden_width=256,
    )
    assert setup_model(in_band, case, dtr).use_pallas is True
    chunked = in_band.replace(mc_chunk=16)
    assert setup_model(chunked, case, dtr).use_pallas is False


@pytest.mark.parametrize(
    "opts",
    [
        {"mc_chunk": 4},
        {"mc_chunk": 4, "compute_dtype": "bfloat16"},
        {"mc_chunk": 4, "remat_decode": True},
        {"mc_chunk": 4, "compute_dtype": "bfloat16", "remat_decode": True},
    ],
    ids=["chunk", "chunk+bf16", "chunk+remat", "chunk+bf16+remat"],
)
def test_fused_trainer_end_to_end(beam_setup, opts):
    """mc_chunk composes with the full lax.scan trainer (train AND val
    losses run chunked: n_mc_train=16, n_mc_val=64, chunk=4) and with
    the bf16/remat knobs it is meant to stack with at the roof cells."""
    from dpivae_tpu.train.train import train_model

    case, cfg, dtr, dva = beam_setup
    cfg = cfg.replace(**opts)
    model = setup_model(cfg, case, dtr)
    assert model.mc_chunk == 4
    params, logs = train_model(
        cfg, model, case, dtr, dva, key=jax.random.key(3), progress=False
    )
    train = np.asarray(logs.train)
    assert np.isfinite(train).all()
    assert train[-1, 0] < train[0, 0]


def test_sweep_vmap_composes():
    """The scan-over-chunks loss inside the vmapped sweep member program
    (scan under vmap must batch transparently)."""
    from dpivae_tpu.sweep.sweep import build_member_fn

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=20, val_freq=10, patience=10**9,
        n_train=64, n_val=32, n_batch=16, n_mc_train=4, n_mc_val=4,
        mc_chunk=2,
    )
    member = build_member_fn(cfg, case)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lams = jnp.asarray([0.001, 0.01], jnp.float32)
    params, logs = jax.vmap(member)(keys, lams)
    assert np.isfinite(np.asarray(logs.train)).all()
