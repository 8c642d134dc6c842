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
