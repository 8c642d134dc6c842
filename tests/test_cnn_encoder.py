"""CNN encoder option tests.

The reference stubs (comments out) a CNN encoder choice at
ref dpivae.py:198-199/240-241 and carries dead ch_in/ch_out/ch_latent args
(ref utils/__init__.py:112-114). Here ``encoder_x="CNN"`` is a working
Conv1d-trunk option sharing the full-covariance heads and clamps with the
MLP trunk; these tests cover shapes, both model variants, gradient flow,
and short-training behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.models import encoders
from dpivae_tpu.train import setup_model, train_model
from dpivae_tpu.utils.data import sample_response


def _setup(model_type=None, **over):
    case = get_case("simple_beam")
    defaults = dict(
        n_train=128, n_val=64, n_batch=32, n_iter=60, val_freq=10,
        n_mc_train=4, n_mc_val=8, use_seed=True,
        encoder_x="CNN", encoder_c="CNN", encoder_y="CNN",
    )
    defaults.update(over)
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(**defaults)
    if model_type is not None:
        cfg = cfg.replace(model_type=model_type)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    data_train = sample_response(case, k1, cfg.n_train, sample_dist=case.gt_dist())
    data_val = sample_response(case, k2, cfg.n_val, sample_dist=case.gt_dist())
    model = setup_model(cfg, case, data_train)
    return case, cfg, model, data_train, data_val


def test_cnn_head_shapes_and_clamps():
    key = jax.random.PRNGKey(0)
    n_latent, nd = 4, 12
    params = encoders.cnn_encoder_init(key, n_latent, nd, ch_in=1, ch_out=8,
                                       ch_latent=32)
    for x in (jnp.ones((5, nd)), jnp.ones((3, 5, nd))):
        loc, tril = encoders.gaussian_head_apply(params, x, n_latent)
        assert loc.shape == (*x.shape[:-1], n_latent)
        assert tril.shape == (*x.shape[:-1], n_latent, n_latent)
        assert np.all(np.isfinite(np.asarray(loc)))
        assert np.all(np.abs(np.asarray(loc)) <= 50.0)
        diag = np.diagonal(np.asarray(tril), axis1=-2, axis2=-1)
        assert np.all(diag > 0)
        # strictly-upper triangle is zero
        upper = np.triu(np.asarray(tril), k=1)
        assert np.all(upper == 0)


def test_cnn_multichannel_and_divisibility():
    key = jax.random.PRNGKey(1)
    params = encoders.cnn_encoder_init(key, 3, 12, ch_in=3, ch_out=4,
                                       ch_latent=16)
    loc, tril = encoders.gaussian_head_apply(params, jnp.ones((7, 12)), 3)
    assert loc.shape == (7, 3)
    with pytest.raises(ValueError, match="divisible"):
        encoders.cnn_encoder_init(key, 3, 11, ch_in=3)


@pytest.mark.parametrize("model_type", ["S", "P"])
def test_cnn_loss_and_grads(model_type):
    case, cfg, model, data_train, data_val = _setup(model_type=model_type)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(data_train[0][:16])
    c = jnp.asarray(data_train[1][:16])
    y = jnp.asarray(data_train[2][:16])
    x_t, c_t, y_t = model.transform_inputs(x, c, y)

    def loss_fn(p):
        out = model.loss(p, jax.random.PRNGKey(1), x_t, c_t, y_t, n=4,
                         grl_alpha=cfg.lambda_g0)
        return jnp.mean(out[0])

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    # Gradients reach the conv trunk (not just the heads)
    g_conv = grads["encoder"]["trunk"]["conv"][0]["w"]
    assert np.all(np.isfinite(np.asarray(g_conv)))
    assert float(jnp.max(jnp.abs(g_conv))) > 0.0


def test_cnn_trains_and_improves():
    # Training-parity check: the CNN-encoder model trains under the same
    # fused scan and improves the ELBO like the NN encoder does.
    case, cfg, model, data_train, data_val = _setup(n_iter=400, val_freq=50)
    params, logs = train_model(cfg, model, case, data_train, data_val)
    _, elbo = logs.scalars("ELBO")
    assert np.all(np.isfinite(elbo))
    assert np.mean(elbo[-20:]) < np.mean(elbo[:20]) - 1.0


def test_cnn_sweep_vmap():
    # Conv1d trunk must vmap over sweep members (batched conv params)
    from dpivae_tpu.sweep import train_sweep

    case = get_case("simple_beam")
    cfg = TrainConfig().with_preset(case.presets["dpivae"]).replace(
        n_train=64, n_val=32, n_batch=16, n_iter=20, val_freq=10,
        n_mc_train=2, n_mc_val=4, use_seed=True,
        encoder_x="CNN", encoder_c="CNN", encoder_y="CNN",
    )
    res = train_sweep(cfg, case, lambdas=[1 / 256, -1.0], n_runs=1)
    assert res.n_members == 2
    assert np.all(np.isfinite(np.asarray(res.logs.train)))
    p0 = jax.tree.leaves(res.member_params(0))[0]
    p1 = jax.tree.leaves(res.member_params(1))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError, match="Unknown encoder_x"):
        _setup(encoder_x="RNN")
