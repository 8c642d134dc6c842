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
    @pytest.mark.parametrize("bad", [0, -2, "4", 2.0])
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
