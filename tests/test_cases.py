"""Case-study loading, shape bookkeeping, and imported-surrogate parity
against the torch reference artifacts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.cases import get_case, list_cases
from dpivae_tpu.utils.data import sample_response


def test_list_cases():
    assert list_cases() == ["bridge", "damped_oscillator", "simple_beam"]


@pytest.mark.parametrize(
    "name,shapes,nd_x,idx_c_phys",
    [
        ("simple_beam", (2, 1, 1, 0, 0), 32, ()),
        ("damped_oscillator", (1, 1, 1, 1, 0), 64, ()),
        ("bridge", (2, 2, 2, 1, 1), 64, (1,)),
    ],
)
def test_case_shapes(name, shapes, nd_x, idx_c_phys):
    case = get_case(name)
    assert case.shapes == shapes
    assert case.nd_x == nd_x
    assert case.idx_c_phys == idx_c_phys
    assert len(case.prior_x) == case.nz_x


@pytest.mark.parametrize("name", ["simple_beam", "damped_oscillator", "bridge"])
def test_surrogate_matches_torch(name):
    """Golden parity: imported surrogate == torch reference model on X."""
    import torch

    from dpivae_tpu.utils.io import reference_case_dir

    case = get_case(name)
    X = case.x_full[:64]

    # Rebuild the torch forward directly from the reference state dict:
    # scaler -> (Linear, tanh)* -> Linear (ref: models/nn.py:67-80 with
    # StandardScaler input transform)
    sd = torch.load(
        f"{reference_case_dir(name)}/full_model",
        weights_only=True,
        map_location="cpu",
    )
    n_layers = len(sd) // 2
    keys = sorted(sd, key=lambda k: int(k.split(".")[1]))
    Xt = torch.from_numpy(
        (X - case.full_model.scaler_mean) / case.full_model.scaler_scale
    )
    h = Xt
    for i in range(n_layers):
        w = sd[f"net.{2 * i}.weight"]
        b = sd[f"net.{2 * i}.bias"]
        h = h @ w.T + b
        if i < n_layers - 1:
            h = torch.tanh(h)
    want = h.numpy()

    got = np.asarray(case.full_model(jnp.asarray(X)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    del keys


def test_bridge_part_model_input_dim():
    case = get_case("bridge")
    # part model takes (z_x || c_phys): 2 + 1 = 3 inputs
    z = jnp.zeros((4, 3))
    out = case.part_model(z)
    assert out.shape == (4, 64)


def test_sample_response_shapes_and_noise():
    case = get_case("simple_beam")
    key = jax.random.PRNGKey(0)
    x, c, y, z = sample_response(case, key, 128, sample_dist=case.gt_dist())
    assert x.shape == (128, 32)
    assert c.shape == (128, 1)
    assert y.shape == (128, 1)
    assert z.shape == (128, 4)
    # c/y are noisy copies of the right z columns
    np.testing.assert_allclose(
        np.asarray(c[:, 0]), np.asarray(z[:, 3]), atol=5 * 0.02
    )
    np.testing.assert_allclose(
        np.asarray(y[:, 0]), np.asarray(z[:, 2]), atol=5 * 0.02
    )
    # factors within their sampling bounds
    zn = np.asarray(z)
    assert zn[:, 0].min() >= 2.5 and zn[:, 0].max() <= 4.5


def test_sample_response_tiled_z():
    case = get_case("simple_beam")
    z_pin = jnp.tile(jnp.array([[3.0, 0.5, 7.0, 0.0]]), (5, 1))
    x, c, y, z = sample_response(case, jax.random.PRNGKey(1), 3, z=z_pin)
    assert z.shape == (3, 5, 4)
    assert x.shape == (3, 5, 32)


def test_sample_response_requires_source():
    case = get_case("simple_beam")
    with pytest.raises(ValueError):
        sample_response(case, jax.random.PRNGKey(0), 4)


def test_gt_dist_and_prior_sampling():
    case = get_case("simple_beam")
    d = case.gt_dist()
    z = d.sample(jax.random.PRNGKey(0), (1000,))
    assert z.shape == (1000, 4)
    lp = d.log_prob(z)
    assert lp.shape == (1000, 4)
    assert np.all(np.isfinite(np.asarray(lp)))

    px = case.prior_x_dist()
    lp_x = px.log_prob(z[..., :2])
    assert np.all(np.isfinite(np.asarray(lp_x)))
