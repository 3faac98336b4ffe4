import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import nn
from myconvnet_tpu.core import transform


def small_net(x, train=False):
    x = nn.conv(x, 8, 3, name="c1")
    x = nn.batch_norm(x, train=train)
    x = nn.relu(x)
    x = nn.conv(x, 8, 3, name="c2")
    x = nn.gap(x)
    return nn.dense(x, 4, name="head")


def test_init_apply_shapes():
    net = transform(small_net)
    key = jax.random.key(0)
    x = jnp.zeros((2, 8, 8, 3))
    params, state = net.init(key, x)
    assert "c1" in params and "w" in params["c1"]
    assert params["c1"]["w"].shape == (3, 3, 3, 8)
    y, new_state = net.apply(params, state, key, x)
    assert y.shape == (2, 4)


def test_auto_naming_stable():
    def f(x):
        x = nn.conv(x, 4, 1)  # conv
        x = nn.conv(x, 4, 1)  # conv_1
        return x

    net = transform(f)
    params, _ = net.init(jax.random.key(0), jnp.zeros((1, 4, 4, 2)))
    assert set(params) == {"conv", "conv_1"}
    y, _ = net.apply(params, {}, None, jnp.ones((1, 4, 4, 2)))
    assert y.shape == (1, 4, 4, 4)


def test_missing_param_raises():
    net = transform(lambda x: nn.dense(x, 3))
    with pytest.raises(KeyError):
        net.apply({}, {}, None, jnp.zeros((1, 2)))


def test_bn_state_updates_in_train_only():
    net = transform(lambda x, train: nn.batch_norm(x, train=train))
    key = jax.random.key(1)
    x = jax.random.normal(key, (4, 4, 4, 3)) * 2.0 + 1.0
    params, state = net.init(key, x, True)
    np.testing.assert_allclose(state["bn"]["moving_mean"], 0.0)
    np.testing.assert_allclose(state["bn"]["moving_var"], 1.0)
    _, s_train = net.apply(params, state, key, x, True)
    assert not np.allclose(s_train["bn"]["moving_mean"], 0.0)
    _, s_eval = net.apply(params, state, key, x, False)
    np.testing.assert_allclose(s_eval["bn"]["moving_mean"], 0.0)


def test_apply_is_jittable_and_differentiable():
    net = transform(small_net)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    params, state = net.init(key, x, True)

    @jax.jit
    def loss_fn(p):
        y, _ = net.apply(p, state, key, x, True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss_fn)(params)
    assert g["c1"]["w"].shape == params["c1"]["w"].shape
    assert np.isfinite(jax.tree.reduce(
        lambda a, b: a + jnp.sum(b), g, 0.0))


def test_dropout_rng():
    def f(x, train):
        return nn.dropout(x, 0.5, train=train)

    net = transform(f)
    x = jnp.ones((64, 64))
    params, state = net.init(jax.random.key(0), x, True)
    y, _ = net.apply(params, state, jax.random.key(1), x, True)
    # roughly half zeroed, survivors scaled by 2
    zeros = float(jnp.mean(y == 0.0))
    assert 0.3 < zeros < 0.7
    assert np.allclose(sorted(set(np.asarray(y).ravel())), [0.0, 2.0])
    y_eval, _ = net.apply(params, state, None, x, False)
    np.testing.assert_array_equal(y_eval, x)
