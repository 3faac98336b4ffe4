"""MixUp / CutMix / Random Erasing (data/mix.py) — on-device batch mixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.data.mix import (MixConfig, _rect_mask, mixup_cutmix,
                                    random_erasing)

KEY = jax.random.key(42)


def _batch(n=8, h=16, w=16, c=3, classes=10, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randint(0, classes, n))
    return x, y, classes


def test_mixup_only_convex_combination():
    x, y, nc = _batch()
    cfg = MixConfig(mixup_alpha=0.4, cutmix_alpha=0.0, prob=1.0)
    mx, my = jax.jit(lambda k, x, y: mixup_cutmix(k, x, y, nc, cfg))(
        KEY, x, y)
    assert mx.shape == x.shape and my.shape == (x.shape[0], nc)
    # soft labels are a distribution
    np.testing.assert_allclose(np.sum(np.asarray(my), -1), 1.0, atol=1e-5)
    # outputs stay inside the convex hull of the batch range
    assert float(jnp.min(mx)) >= float(jnp.min(x)) - 1e-6
    assert float(jnp.max(mx)) <= float(jnp.max(x)) + 1e-6


@pytest.mark.slow
def test_cutmix_label_matches_pixel_area():
    x, y, nc = _batch(n=16, h=32, w=32)
    cfg = MixConfig(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0)
    mx, my = mixup_cutmix(KEY, x, y, nc, cfg)
    perm_share = 1.0 - np.asarray(my)[np.arange(16), np.asarray(y)]
    # each image: fraction of pixels replaced == label mass moved (where
    # source and partner labels differ)
    x2 = np.asarray(mx)
    xf = np.asarray(x)
    changed = np.mean(np.any(np.abs(x2 - xf) > 1e-6, axis=-1), axis=(1, 2))
    yl = np.asarray(y)
    for i in range(16):
        if perm_share[i] > 1e-6:  # partner is a different class
            assert abs(changed[i] - perm_share[i]) < 0.05, i
        # identical-partner rows can't be checked via labels
    assert np.all(perm_share >= -1e-6) and np.all(perm_share <= 1.0 + 1e-6)
    del yl


def test_mix_prob_zero_is_identity_images():
    x, y, nc = _batch()
    cfg = MixConfig(mixup_alpha=0.4, cutmix_alpha=1.0, prob=0.0)
    mx, my = mixup_cutmix(KEY, x, y, nc, cfg)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(x), atol=1e-6)
    # labels collapse to (smoothed) one-hot of the original class
    assert np.all(np.argmax(np.asarray(my), -1) == np.asarray(y))


def test_mix_disabled_returns_onehot():
    x, y, nc = _batch()
    cfg = MixConfig(mixup_alpha=0.0, cutmix_alpha=0.0)
    mx, my = mixup_cutmix(KEY, x, y, nc, cfg)
    assert mx is x
    assert np.all(np.asarray(my) == np.asarray(
        jax.nn.one_hot(y, nc)))


def test_label_smoothing_folded_in():
    x, y, nc = _batch()
    cfg = MixConfig(mixup_alpha=0.0, cutmix_alpha=0.0, label_smoothing=0.1)
    _, my = mixup_cutmix(KEY, x, y, nc, cfg)
    my = np.asarray(my)
    np.testing.assert_allclose(my.max(-1), 0.9 + 0.1 / nc, atol=1e-6)
    np.testing.assert_allclose(my.min(-1), 0.1 / nc, atol=1e-6)


def test_rect_mask_area():
    lam = jnp.asarray([0.0, 0.25, 0.75, 1.0])
    m = _rect_mask(KEY, 4, (64, 64), lam)
    area = np.asarray(jnp.mean(m, axis=(1, 2, 3)))
    # area ~= 1 - lam up to frame clamping (clamp only shrinks)
    assert area[3] == 0.0
    # lam=0 cut is frame-sized; uniform centers clamp it to >=25% coverage
    assert area[0] >= 0.25 - 1e-6
    for i, l in enumerate([0.0, 0.25, 0.75, 1.0]):
        assert area[i] <= 1.0 - l + 0.05


def test_random_erasing_statistics():
    x = jnp.ones((32, 24, 24, 3))
    out = random_erasing(KEY, x, prob=1.0, area_range=(0.1, 0.11),
                         fill="zero")
    frac = np.mean(np.asarray(out) == 0.0, axis=(1, 2, 3))
    assert np.all(frac > 0.0)         # every image erased at prob=1
    assert np.all(frac < 0.35)        # bounded by clamped area
    out2 = random_erasing(KEY, x, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))


def test_random_erasing_noise_fill_changes_pixels():
    x = jnp.zeros((4, 16, 16, 3))
    out = random_erasing(KEY, x, prob=1.0, fill="noise")
    assert float(jnp.max(jnp.abs(out))) > 0.0


def test_deterministic_under_same_key():
    x, y, nc = _batch()
    cfg = MixConfig()
    a = mixup_cutmix(KEY, x, y, nc, cfg)
    b = mixup_cutmix(KEY, x, y, nc, cfg)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_convnet_trains_with_mix(tmp_path):
    """End-to-end: ConvNet with augment+mix+erasing runs a few steps."""
    from myconvnet_tpu import models
    from myconvnet_tpu.data.augment import AugmentConfig
    from myconvnet_tpu.data.pipeline import ArraySource, DataSet
    from myconvnet_tpu.models.base import ConvNet
    from myconvnet_tpu.train import optim

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (64, 24, 24, 3), dtype=np.uint8)
    labels = rng.randint(0, 5, 64)
    ds = DataSet(ArraySource(images, labels), seed=0)
    net = ConvNet(models.smallnet, input_shape=(16, 16, 3), num_classes=5,
                  augment=AugmentConfig(out_hw=(16, 16), area_range=None,
                                        pad=2, flip=True),
                  mix=MixConfig(mixup_alpha=0.2, cutmix_alpha=1.0),
                  erase_prob=0.25, width=4, dropout_rate=0.0)
    net.build(optim.momentum(0.05, 0.9))
    state = net.train(ds, batch_size=16, total_steps=6)
    assert int(state.step) == 6
    preds = net.predict(images[:8], batch_size=8)
    assert preds.shape == (8, 5)


def test_mix_loss_compatible():
    """Soft labels flow through softmax_cross_entropy with finite grad."""
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    x, y, nc = _batch()
    _, my = mixup_cutmix(KEY, x, y, nc, MixConfig())
    logits = jnp.zeros((x.shape[0], nc))
    loss = softmax_cross_entropy(logits, my)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), np.log(nc), atol=1e-5)
