"""use_pallas model path equals the plain path (fallback on CPU; on-TPU
numeric parity benchmarked by benchmarks/pallas_bench.py)."""

import jax
import numpy as np

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.train.setup import setup_model
from dpivae_tpu.utils.data import sample_response


def test_pallas_flag_matches_plain_model():
    case = get_case("simple_beam")
    base = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=32, n_batch=32, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), 32,
                           sample_dist=case.gt_dist())
    m_plain = setup_model(base, case, data)
    m_pallas = setup_model(base.replace(use_pallas=True), case, data)
    params = m_plain.init(jax.random.PRNGKey(1))

    k = jax.random.PRNGKey(2)
    x, c, y = data[0], data[1], data[2]
    out_a = m_plain.loss(params, k, x, c, y, n=3, grl_alpha=base.lambda_g0)
    out_b = m_pallas.loss(params, k, x, c, y, n=3, grl_alpha=base.lambda_g0)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # gradients identical too (custom VJP vs autodiff)
    def total(model):
        def f(p):
            return jax.numpy.sum(
                model.loss(p, k, x, c, y, n=2, grl_alpha=base.lambda_g0)[0]
            )
        return f

    g_a = jax.grad(total(m_plain))(params)
    g_b = jax.grad(total(m_pallas))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_hidden_width_override_scales_every_trunk():
    """TrainConfig.hidden_width=w rebuilds every MLP trunk at width w
    (the scaling study's knob, benchmarks/experiments/scaling.py); None
    keeps the reference architecture."""
    case = get_case("simple_beam")
    base = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=32, n_batch=32, use_seed=True
    )
    data = sample_response(case, jax.random.PRNGKey(0), 32,
                           sample_dist=case.gt_dist())
    w = 256
    model = setup_model(base.replace(hidden_width=w), case, data)
    params = model.init(jax.random.PRNGKey(1))

    # S-mode joint encoder trunk, decoder_x hidden, prior nets, aux decoders
    assert params["encoder"]["trunk"]["layers"][0]["w"].shape[1] == w
    assert params["decoder_x"]["fx0"]["w"].shape == (
        base.nz_c + base.nz_y, w)
    assert params["prior_net_c"]["trunk"]["layers"][0]["w"].shape[1] == w
    assert params["decoder_c"]["layers"][0]["w"].shape[1] == w

    # the widened model trains a step end-to-end (loss finite)
    out = model.loss(params, jax.random.PRNGKey(2), data[0], data[1],
                     data[2], n=2, grl_alpha=base.lambda_g0)
    assert np.isfinite(np.asarray(out[0])).all()

    # reference default untouched
    m_ref = setup_model(base, case, data)
    p_ref = m_ref.init(jax.random.PRNGKey(1))
    assert p_ref["encoder"]["trunk"]["layers"][0]["w"].shape[1] == 128
    assert p_ref["decoder_x"]["fx0"]["w"].shape[1] == 128


def test_use_pallas_auto_resolves_to_bool():
    """use_pallas="auto" resolves through the measured boundary
    (ops/pallas_mlp.py:auto_select) to a plain bool at model build."""
    from dpivae_tpu.ops import pallas_mlp

    case = get_case("simple_beam")
    base = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=32, n_batch=32, use_seed=True, use_pallas="auto"
    )
    data = sample_response(case, jax.random.PRNGKey(0), 32,
                           sample_dist=case.gt_dist())
    model = setup_model(base, case, data)
    assert model.use_pallas in (True, False)
    # reference scale (rows=16*32, hidden 128) sits OUTSIDE any measured
    # win region — auto must keep the XLA path there
    assert model.use_pallas is False

    # the measured-win band (benchmarks/results/scaling.json, repeat-
    # confirmed): decoder rows >= 65536 at hidden EXACTLY 256 — neighbors
    # measured neutral-to-worse, so auto must stay off there
    assert pallas_mlp.auto_select(65536, 4, 256, 32) is True
    assert pallas_mlp.auto_select(65536, 4, 128, 32) is False  # 0.61x
    assert pallas_mlp.auto_select(65536, 4, 512, 32) is False  # ~1.0x
    assert pallas_mlp.auto_select(16384, 4, 256, 32) is False  # 0.86x
    assert pallas_mlp.auto_select(65536, 4, 192, 32) is False  # not %128

    # the boundary constants drive the decision
    if pallas_mlp._HAS_PLTPU:
        old = pallas_mlp._AUTO_MIN_ROWS, pallas_mlp._AUTO_MIN_HIDDEN
        try:
            pallas_mlp._AUTO_MIN_ROWS, pallas_mlp._AUTO_MIN_HIDDEN = 1, 128
            m2 = setup_model(base, case, data)
            assert m2.use_pallas is True
        finally:
            pallas_mlp._AUTO_MIN_ROWS, pallas_mlp._AUTO_MIN_HIDDEN = old


def test_auto_select_guards_device_kind(monkeypatch):
    """The auto band was measured on one TPU generation
    (_AUTO_DEVICE_KIND); on a TPU of a different kind auto_select must
    warn once and keep the XLA path, while the measured kind and non-TPU
    backends keep the band decision."""
    import types
    import warnings

    from dpivae_tpu.ops import pallas_mlp

    in_band = (65536, 4, 256, 32)
    monkeypatch.setattr(pallas_mlp.jax, "default_backend", lambda: "tpu")

    fake = types.SimpleNamespace(device_kind="TPU v9 hypothetical")
    monkeypatch.setattr(pallas_mlp.jax, "devices", lambda: [fake])
    monkeypatch.setattr(pallas_mlp, "_warned_device_kind", set())
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert pallas_mlp.auto_select(*in_band) is False
        assert pallas_mlp.auto_select(*in_band) is False  # warn once
    warns = [w for w in rec if "auto" in str(w.message)]
    assert len(warns) == 1
    assert "TPU v9 hypothetical" in str(warns[0].message)

    # matching kind: band decision stands, no warning
    match = types.SimpleNamespace(device_kind=pallas_mlp._AUTO_DEVICE_KIND)
    monkeypatch.setattr(pallas_mlp.jax, "devices", lambda: [match])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert pallas_mlp.auto_select(*in_band) is True
    assert not [w for w in rec if "auto" in str(w.message)]

    # out-of-band shapes never consult the device (no warning either)
    monkeypatch.setattr(pallas_mlp.jax, "devices", lambda: [fake])
    monkeypatch.setattr(pallas_mlp, "_warned_device_kind", set())
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert pallas_mlp.auto_select(16384, 4, 256, 32) is False
    assert not [w for w in rec if "auto" in str(w.message)]
