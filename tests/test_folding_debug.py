"""BN folding (serving-graph optimization), new zoo members, nan guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.models.folding import (fold_batch_norms,
                                          verify_folding)
from myconvnet_tpu.utils.debugging import (NonFiniteError, nan_guard,
                                           tree_nonfinite_report)


def _trained_like(net, x, steps=3):
    """Init then perturb BN stats so folding is non-trivial."""
    key = jax.random.key(0)
    params, state = net.init(key, x, True)
    # run a few train steps so moving stats differ from init
    for i in range(steps):
        _, state = net.apply(params, state, jax.random.key(i), x, True)
    return params, state


def test_fold_resnet18_outputs_match():
    net = transform(lambda x, train=False: models.resnet(
        x, 10, 18, train=train))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    params, state = _trained_like(net, x)
    err = verify_folding(net, params, state, x, atol=1e-3, eps=1e-5)
    assert err < 1e-3
    fp, fs = fold_batch_norms(params, state, 1e-5)
    # all paired BNs removed, convs gained biases
    assert not any(k.endswith("bn_a") for k in fp)
    assert "b" in fp["stem/conv"]


def test_fold_smallnet_outputs_match():
    net = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    params, state = _trained_like(net, x)
    err = verify_folding(net, params, state, x, atol=1e-3, eps=1e-3)
    assert err < 1e-3


@pytest.mark.slow
def test_fold_reduces_param_scopes():
    net = transform(lambda x, train=False: models.resnet(
        x, 10, 18, train=train))
    x = jnp.zeros((1, 32, 32, 3))
    params, state = net.init(jax.random.key(0), x, True)
    fp, fs = fold_batch_norms(params, state, 1e-5)
    assert len(fp) < len(params)
    assert len(fs) < len(state)


@pytest.mark.slow
def test_mobilenet_v2_forward():
    net = transform(lambda x, train: models.mobilenet_v2(x, 10,
                                                         train=train))
    x = jnp.zeros((2, 32, 32, 3))
    params, state = net.init(jax.random.key(0), x, True)
    y, _ = net.apply(params, state, jax.random.key(1), x, True)
    assert y.shape == (2, 10)


@pytest.mark.slow
def test_mobilenet_v2_param_count():
    """torchvision mobilenet_v2 = 3.50M params."""
    net = transform(lambda x: models.mobilenet_v2(x, 1000))
    params, _ = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for b in params.values()
            for p in b.values()) / 1e6
    assert abs(n - 3.50) < 0.1, n


@pytest.mark.slow
def test_efficientnet_b0_param_count():
    """torch efficientnet_b0 = 5.29M params."""
    net = transform(lambda x, train: models.efficientnet_b0(x, 1000,
                                                            train=train))
    params, _ = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                         False)
    n = sum(int(np.prod(p.shape)) for b in params.values()
            for p in b.values()) / 1e6
    assert abs(n - 5.29) < 0.15, n


@pytest.mark.slow
def test_efficientnet_forward_with_stochastic_depth():
    net = transform(lambda x, train: models.efficientnet_b0(x, 4,
                                                            train=train))
    x = jnp.zeros((2, 32, 32, 3))
    params, state = net.init(jax.random.key(0), x, True)
    y, _ = net.apply(params, state, jax.random.key(1), x, True)
    assert y.shape == (2, 4)
    y2, _ = net.apply(params, state, None, x, False)  # no rng needed eval
    assert np.isfinite(np.asarray(y2)).all()


def test_nan_guard_catches_poisoning():
    from collections import namedtuple
    S = namedtuple("S", ["params"])

    def bad_step(state, x):
        return S(params={"w": state.params["w"] * x}), {}

    guarded = nan_guard(bad_step)
    s = S(params={"w": jnp.ones(4)})
    s, _ = guarded(s, 2.0)  # fine
    with pytest.raises(NonFiniteError, match="non-finite"):
        guarded(s, float("nan"))


def test_tree_nonfinite_report():
    tree = {"a": jnp.asarray([1.0, jnp.nan]), "b": jnp.ones(3),
            "c": jnp.asarray([jnp.inf])}
    rep = tree_nonfinite_report(tree)
    assert rep == {"a": 1, "c": 1}


@pytest.mark.slow
def test_mobilenet_v3_param_counts_exact():
    """torchvision mobilenet_v3_large = 5,483,032 / _small = 2,542,856
    params — EXACT (the V3 tables, expanded-channel SE with round8
    reduction, and the post-pool biased expansion fc all verified by
    the count)."""
    for fn, target in ((models.mobilenet_v3_large, 5_483_032),
                       (models.mobilenet_v3_small, 2_542_856)):
        net = transform(lambda x, train=False, f=fn: f(x, 1000,
                                                       train=train))
        params, _ = net.init(jax.random.key(0),
                             jnp.zeros((1, 64, 64, 3)), False)
        n = sum(int(np.prod(p.shape)) for b in params.values()
                for p in b.values())
        assert n == target, (fn.__name__, n, target)


@pytest.mark.slow
def test_mobilenet_v3_forward_and_train_step():
    from myconvnet_tpu.models.mobilenetv3 import hard_sigmoid, hard_swish

    # activation identities (torch Hardsigmoid/Hardswish semantics)
    xs = jnp.asarray([-4.0, -3.0, -1.0, 0.0, 1.0, 3.0, 4.0])
    np.testing.assert_allclose(hard_sigmoid(xs),
                               jnp.clip((xs + 3) / 6, 0, 1), atol=1e-6)
    np.testing.assert_allclose(hard_swish(xs),
                               xs * jnp.clip((xs + 3) / 6, 0, 1),
                               atol=1e-6)

    net = transform(lambda x, train=False: models.mobilenet_v3_small(
        x, 10, train=train, dropout_rate=0.0))
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params, state = net.init(jax.random.key(1), x, True)
    y, new_state = net.apply(params, state, jax.random.key(2), x, True)
    assert y.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(y)))
    # BN stats actually update in train mode
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for (sa, va), (sb, vb) in zip(sorted(state.items()),
                                      sorted(new_state.items()))
        for (ka, a), (kb, b) in zip(sorted(va.items()),
                                    sorted(vb.items())))
    assert moved
