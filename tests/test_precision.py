"""compute_dtype (bf16 decode path) and remat_decode options.

The scaled-shape cells of benchmarks/results/scaling.json are HBM-bound
with f32 everything; these two TrainConfig options attack exactly that
(halve the decode-path bytes / skip the saved-activation round trip).
They must be exact no-ops at defaults — the torch-parity suite pins that
— and these tests pin their own contracts: remat is numerically
equivalent (same ops recomputed), bf16 is close-not-equal with f32
gradients, and both compose with the fused trainer and the sweep vmap.
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


def _loss_and_grad(cfg, case, dtr):
    model = setup_model(cfg, case, dtr)
    params = model.init(jax.random.PRNGKey(1))
    x, c, y = (a[:16] for a in dtr[:3])

    def f(p):
        out = model.loss(p, jax.random.PRNGKey(2), x, c, y, n=4,
                         grl_alpha=jnp.asarray(0.5))
        return jnp.sum(out[0])

    return jax.value_and_grad(f)(params)


class TestConfigValidation:
    def test_bad_compute_dtype_raises(self):
        with pytest.raises(ValueError, match="compute_dtype"):
            TrainConfig(compute_dtype="float16")

    def test_bf16_with_explicit_pallas_raises(self):
        with pytest.raises(ValueError, match="use_pallas"):
            TrainConfig(compute_dtype="bfloat16", use_pallas=True)

    def test_bf16_resolves_auto_pallas_to_xla(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        # Shapes inside the measured pallas win band would normally let
        # "auto" enable the kernel; compute_dtype must force the XLA path
        # (the band was measured in f32).
        cfg = cfg.replace(
            compute_dtype="bfloat16", use_pallas="auto",
            n_batch=1024, n_mc_train=64, n_train=1024, hidden_width=256,
        )
        model = setup_model(cfg, case, dtr)
        assert model.use_pallas is False
        assert model.compute_dtype == "bfloat16"


class TestRematDecode:
    def test_loss_identical_grads_equivalent(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        v0, g0 = _loss_and_grad(cfg, case, dtr)
        v1, g1 = _loss_and_grad(cfg.replace(remat_decode=True), case, dtr)
        assert float(v0) == float(v1)
        # Recomputation replays the same ops; only reassociation-level
        # drift is tolerated (measured ~1e-7 of the leaf's grad scale;
        # atol is scaled per leaf so near-zero elements don't trip rtol).
        def close(a, b):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                a, b, rtol=5e-6, atol=1e-5 * max(1.0, np.abs(a).max())
            )

        jax.tree.map(close, g0, g1)


class TestBf16Decode:
    def test_close_to_f32_with_f32_grads(self, beam_setup):
        case, cfg, dtr, _ = beam_setup
        v0, g0 = _loss_and_grad(cfg, case, dtr)
        v2, g2 = _loss_and_grad(
            cfg.replace(compute_dtype="bfloat16"), case, dtr
        )
        assert np.isfinite(float(v2))
        assert abs(float(v0 - v2)) / abs(float(v0)) < 0.02
        # Mixed precision: master params/grads stay f32
        assert {str(a.dtype) for a in jax.tree.leaves(g2)} == {"float32"}
        # The prior nets run on (c, y) outside the decode cast — their
        # gradients must be bit-identical to the f32 run (a deviation
        # here would mean the cast leaked out of the decode path).
        for k in ("prior_net_c", "prior_net_y"):
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                ),
                g0[k], g2[k],
            )

    def test_surrogate_follows_input_dtype(self):
        case = get_case("bridge")  # MLP-surrogate physics
        z = jnp.zeros((4, case.nz_x + len(case.idx_c_phys)))
        assert case.part_model(z).dtype == jnp.float32
        out = case.part_model(z.astype(jnp.bfloat16))
        assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize(
    "opts",
    [
        {"compute_dtype": "bfloat16"},
        {"remat_decode": True},
        {"compute_dtype": "bfloat16", "remat_decode": True},
    ],
    ids=["bf16", "remat", "bf16+remat"],
)
def test_fused_trainer_end_to_end(beam_setup, opts):
    """The options compose with the full lax.scan trainer: finite logs,
    training actually reduces the loss over 40 iters."""
    from dpivae_tpu.train.train import train_model

    case, cfg, dtr, dva = beam_setup
    cfg = cfg.replace(**opts)
    model = setup_model(cfg, case, dtr)
    params, logs = train_model(
        cfg, model, case, dtr, dva, key=jax.random.key(3), progress=False
    )
    train = np.asarray(logs.train)
    assert np.isfinite(train).all()
    assert train[-1, 0] < train[0, 0]  # ELBO loss decreased


def test_sweep_vmap_composes():
    """remat+bf16 inside the vmapped sweep member program (the checkpoint
    region and the casts must be vmap-transparent)."""
    from dpivae_tpu.sweep.sweep import build_member_fn

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        use_seed=True, n_iter=20, val_freq=10, patience=10**9,
        n_train=64, n_val=32, n_batch=16, n_mc_train=4, n_mc_val=4,
        compute_dtype="bfloat16", remat_decode=True,
    )
    member = build_member_fn(cfg, case)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lams = jnp.asarray([0.001, 0.01], jnp.float32)
    params, logs = jax.vmap(member)(keys, lams)
    assert np.isfinite(np.asarray(logs.train)).all()
