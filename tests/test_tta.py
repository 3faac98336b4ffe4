"""Test-time augmentation (ConvNet.predict tta=...)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.models.base import ConvNet


def _net(augment=None, shape=(16, 16, 3)):
    net = ConvNet(models.smallnet, input_shape=shape, num_classes=4,
                  augment=augment, width=4, dropout_rate=0.0, seed=3)
    net.build()
    return net


def test_flip_tta_matches_manual_average():
    net = _net()
    x = np.random.RandomState(0).rand(6, 16, 16, 3).astype(np.float32)
    out = net.predict(x, batch_size=6, tta="flip")
    # manual: mean softmax over {x, mirror(x)}
    p1 = jax.nn.softmax(jnp.asarray(net.predict(x, batch_size=6)), -1)
    p2 = jax.nn.softmax(
        jnp.asarray(net.predict(x[:, :, ::-1, :], batch_size=6)), -1)
    expect = np.log(np.asarray((p1 + p2) / 2.0) + 1e-12)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_ten_crop_tta_shapes_and_finiteness():
    cfg = AugmentConfig(out_hw=(16, 16), area_range=None, flip=False)
    net = _net(augment=cfg)
    x = np.random.RandomState(1).randint(
        0, 256, (5, 20, 20, 3), dtype=np.uint8)
    out = net.predict(x, batch_size=5, tta="ten_crop")
    assert out.shape == (5, 4)
    assert np.all(np.isfinite(out))
    # log-probs: exp sums to 1
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-4)


def test_ten_crop_requires_augment():
    net = _net()
    with pytest.raises(ValueError):
        net.predict(np.zeros((1, 16, 16, 3), np.float32), tta="ten_crop")


def test_unknown_mode_rejected():
    net = _net()
    with pytest.raises(ValueError):
        net.predict(np.zeros((1, 16, 16, 3), np.float32), tta="bogus")


def test_tta_improves_or_matches_symmetric_input():
    """On a mirror-symmetric image, flip-TTA must equal the plain
    prediction's probabilities."""
    net = _net()
    half = np.random.RandomState(2).rand(2, 16, 8, 3).astype(np.float32)
    x = np.concatenate([half, half[:, :, ::-1, :]], axis=2)
    plain = jax.nn.softmax(jnp.asarray(net.predict(x, batch_size=2)), -1)
    tta = np.exp(net.predict(x, batch_size=2, tta="flip"))
    np.testing.assert_allclose(tta, np.asarray(plain), rtol=1e-4,
                               atol=1e-5)
