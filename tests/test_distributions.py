"""Distribution library: densities/icdf vs scipy, mixture sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from dpivae_tpu.config import TrainConfig
from dpivae_tpu.utils.distributions import (
    BoxUniform,
    MarginalDistribution,
    Normal,
    Uniform,
    UniformBoxMixture,
    make_distribution,
)


def test_normal_matches_scipy():
    d = Normal(2.0, 0.5)
    z = np.linspace(0.0, 4.0, 9)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(z)), stats.norm(2.0, 0.5).logpdf(z), rtol=1e-5
    )
    u = np.linspace(0.01, 0.99, 7)
    np.testing.assert_allclose(
        np.asarray(d.icdf(u)), stats.norm(2.0, 0.5).ppf(u), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d.cdf(z)), stats.norm(2.0, 0.5).cdf(z), atol=1e-6
    )


def test_uniform_support_and_icdf():
    d = Uniform(1.0, 3.0)
    np.testing.assert_allclose(float(d.log_prob(2.0)), -np.log(2.0))
    assert float(d.log_prob(0.5)) == -np.inf
    np.testing.assert_allclose(float(d.icdf(0.25)), 1.5)
    s = d.sample(jax.random.PRNGKey(0), (1000,))
    assert float(s.min()) >= 1.0 and float(s.max()) <= 3.0


def test_marginal_distribution_contract():
    m = MarginalDistribution([Normal(0.0, 1.0), Uniform(0.0, 1.0)])
    z = m.sample(jax.random.PRNGKey(0), (100,))
    assert z.shape == (100, 2)
    lp = m.log_prob(z)
    assert lp.shape == (100, 2)  # per-dim, NOT summed (caller sums)
    u = np.full((1, 2), 0.5)
    icdf = np.asarray(m.icdf(u))
    np.testing.assert_allclose(icdf[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(icdf[0, 1], 0.5, atol=1e-6)


def test_box_mixture_sampling_and_log_prob():
    lows = np.array([[0.0, 0.0], [2.0, 2.0], [4.0, 0.0]], np.float32)
    highs = lows + 1.0
    mix = UniformBoxMixture(lows=lows, highs=highs)
    s = np.asarray(mix.sample(jax.random.PRNGKey(0), (3000,)))
    # every sample lies in exactly one box
    in_box = np.stack(
        [np.all((s >= lo) & (s <= hi), axis=-1) for lo, hi in zip(lows, highs)]
    )
    assert np.all(in_box.sum(axis=0) == 1)
    # roughly equal weights
    frac = in_box.mean(axis=1)
    np.testing.assert_allclose(frac, 1 / 3, atol=0.05)
    # density: 1/3 per unit box => log(1/3); outside -inf
    lp = np.asarray(mix.log_prob(np.array([[0.5, 0.5], [10.0, 10.0]])))
    np.testing.assert_allclose(lp[0], np.log(1 / 3), rtol=1e-5)
    assert lp[1] == -np.inf


def test_box_uniform():
    d = BoxUniform(low=np.array([0.0, 1.0]), high=np.array([1.0, 3.0]))
    s = np.asarray(d.sample(jax.random.PRNGKey(1), (500,)))
    assert s.shape == (500, 2)
    assert s[:, 1].min() >= 1.0 and s[:, 1].max() <= 3.0
    np.testing.assert_allclose(
        float(d.log_prob(np.array([0.5, 2.0]))), -np.log(2.0), rtol=1e-6
    )


def test_make_distribution_registry():
    assert isinstance(make_distribution("normal", loc=0.0, scale=1.0), Normal)
    assert isinstance(make_distribution("Uniform", low=0.0, high=1.0), Uniform)


def test_mixture_same_family_scalar():
    # Weighted two-Normal mixture vs scipy: density and sample moments
    from dpivae_tpu.utils.distributions import MixtureSameFamily

    mix = MixtureSameFamily(
        weights=(0.25, 0.75),
        components=(Normal(-2.0, 0.5), Normal(3.0, 1.0)),
    )
    zs = np.linspace(-5, 7, 41)
    ref = 0.25 * stats.norm(-2.0, 0.5).pdf(zs) + 0.75 * stats.norm(3.0, 1.0).pdf(zs)
    np.testing.assert_allclose(
        np.exp(np.asarray(mix.log_prob(zs))), ref, rtol=1e-5, atol=1e-12
    )
    s = np.asarray(mix.sample(jax.random.PRNGKey(0), (20000,)))
    assert s.shape == (20000,)
    np.testing.assert_allclose(s.mean(), 0.25 * -2.0 + 0.75 * 3.0, atol=0.05)
    # Component occupancy follows the weights
    frac_right = np.mean(s > 0.5)
    np.testing.assert_allclose(frac_right, 0.75, atol=0.02)


def test_mixture_same_family_vector_event():
    # Box components (vector event): generalizes UniformBoxMixture with
    # non-equal weights
    from dpivae_tpu.utils.distributions import MixtureSameFamily

    b1 = BoxUniform(low=np.zeros(2), high=np.ones(2))
    b2 = BoxUniform(low=np.array([10.0, 10.0]), high=np.array([12.0, 11.0]))
    mix = MixtureSameFamily(weights=(1.0, 3.0), components=(b1, b2))
    s = np.asarray(mix.sample(jax.random.PRNGKey(1), (8000,)))
    assert s.shape == (8000, 2)
    in_b2 = s[:, 0] >= 10.0
    np.testing.assert_allclose(np.mean(in_b2), 0.75, atol=0.02)
    # log_prob: inside b1 only -> w1 * 1/vol(b1)
    np.testing.assert_allclose(
        float(mix.log_prob(np.array([0.5, 0.5]))), np.log(0.25 * 1.0), rtol=1e-5
    )
    # equal-weight box mixture agrees with the specialized UniformBoxMixture
    lows = np.stack([b1.low, b2.low]).astype(np.float32)
    highs = np.stack([b1.high, b2.high]).astype(np.float32)
    eq = MixtureSameFamily(weights=(1.0, 1.0), components=(b1, b2))
    spec = UniformBoxMixture(lows=lows, highs=highs)
    pts = np.array([[0.5, 0.5], [11.0, 10.5], [5.0, 5.0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(eq.log_prob(pts)), np.asarray(spec.log_prob(pts)),
        rtol=1e-5,
    )


def test_mixture_same_family_rejects_bad_weights():
    # Negative or zero-sum weights would produce silent NaN log-weights
    from dpivae_tpu.utils.distributions import MixtureSameFamily

    comps = (Normal(0.0, 1.0), Normal(1.0, 1.0))
    with pytest.raises(ValueError, match="non-negative"):
        MixtureSameFamily(weights=(0.5, -0.5), components=comps)
    with pytest.raises(ValueError, match="positive sum"):
        MixtureSameFamily(weights=(0.0, 0.0), components=comps)


def test_mixture_same_family_traced_weights():
    """Eager weight validation must not break construction under a trace —
    jit/vmap users pass tracer weights, which can only validate at
    runtime semantics (NaN log-weights), not eagerly."""
    from dpivae_tpu.utils.distributions import MixtureSameFamily

    comps = (Normal(0.0, 1.0), Normal(1.0, 1.0))

    @jax.jit
    def lp(w, x):
        return MixtureSameFamily(weights=(w[0], w[1]),
                                 components=comps).log_prob(x)

    out = float(lp(jnp.array([0.6, 0.4]), jnp.array(0.3)))
    assert np.isfinite(out)


def test_make_distribution_mixture_spec():
    from dpivae_tpu.utils.distributions import MixtureSameFamily

    mix = make_distribution(
        "mixture",
        weights=[0.5, 0.5],
        components=[
            {"dist": "normal", "args": {"loc": 0.0, "scale": 1.0}},
            {"dist": "uniform", "args": {"low": 2.0, "high": 3.0}},
        ],
    )
    assert isinstance(mix, MixtureSameFamily)
    assert np.isfinite(float(mix.log_prob(2.5)))


def test_config_json_roundtrip(tmp_path):
    cfg = TrainConfig().replace(lambda_g0=-1.0, model_type="P", n_iter=777)
    path = str(tmp_path / "cfg.json")
    cfg.save_json(path)
    assert TrainConfig.from_json(path) == cfg


def test_config_rejects_bad_use_pallas(tmp_path):
    """use_pallas is tri-state {False, True, "auto"}; any other value
    (e.g. the string "false" from a hand-edited JSON) must raise instead
    of silently passing bool(use_pallas) at model build."""
    import json

    import pytest

    for bad in ("false", "Auto", "yes", 2, None):
        with pytest.raises(ValueError, match="use_pallas"):
            TrainConfig(use_pallas=bad)
        with pytest.raises(ValueError, match="use_pallas"):
            TrainConfig().replace(use_pallas=bad)
    # valid values (incl. via JSON round trip) pass
    for ok in (False, True, "auto"):
        assert TrainConfig(use_pallas=ok).use_pallas == ok
    path = str(tmp_path / "bad.json")
    blob = json.loads(TrainConfig().to_json())
    blob["use_pallas"] = "false"
    with open(path, "w") as f:
        json.dump(blob, f)
    with pytest.raises(ValueError, match="use_pallas"):
        TrainConfig.from_json(path)
