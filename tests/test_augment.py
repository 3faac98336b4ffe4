"""On-device augmentation: geometry vs torch goldens + distribution checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from myconvnet_tpu.data import augment as aug


def test_identity_box_resize_matches_torch():
    """Full-image box + resize == plain bilinear resize."""
    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    boxes = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 8.0, 8.0]), (2, 4))
    y = aug.batched_crop_resize(jnp.asarray(x), boxes, (16, 16))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = F.interpolate(xt, size=(16, 16), mode="bilinear",
                       align_corners=False)
    np.testing.assert_allclose(y, np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_integer_crop_is_exact():
    """An integer-aligned box at native size must slice exactly."""
    rng = np.random.RandomState(1)
    x = rng.rand(1, 10, 10, 2).astype(np.float32)
    boxes = jnp.asarray([[2.0, 3.0, 4.0, 4.0]])
    y = aug.batched_crop_resize(jnp.asarray(x), boxes, (4, 4))
    np.testing.assert_allclose(y[0], x[0, 2:6, 3:7], rtol=1e-5, atol=1e-6)


def test_flip_reverses_columns():
    x = jnp.arange(4.0).reshape(1, 1, 4, 1)
    x = jnp.broadcast_to(x, (1, 4, 4, 1))
    boxes = jnp.asarray([[0.0, 0.0, 4.0, 4.0]])
    y = aug.batched_crop_resize(x, boxes, (4, 4), flip=jnp.asarray([True]))
    np.testing.assert_allclose(y[0, 0, :, 0], [3.0, 2.0, 1.0, 0.0],
                               atol=1e-5)
    y2 = aug.batched_crop_resize(x, boxes, (4, 4), flip=jnp.asarray([False]))
    np.testing.assert_allclose(y2[0, 0, :, 0], [0.0, 1.0, 2.0, 3.0],
                               atol=1e-5)


def test_random_resized_crop_boxes_within_image():
    boxes = aug.random_resized_crop_boxes(jax.random.key(0), 256, (50, 70))
    b = np.asarray(boxes)
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 0] + b[:, 2] <= 50 + 1e-3).all()
    assert (b[:, 1] + b[:, 3] <= 70 + 1e-3).all()
    areas = b[:, 2] * b[:, 3] / (50 * 70)
    assert areas.min() >= 0.05 and areas.max() <= 1.0 + 1e-6


def test_pad_crop_boxes():
    boxes = aug.pad_crop_boxes(jax.random.key(0), 128, (32, 32), pad=4)
    b = np.asarray(boxes)
    assert (np.abs(b[:, :2]) <= 4.0).all()
    assert (b[:, 2:] == 32.0).all()
    # offsets actually vary
    assert b[:, 0].std() > 1.0


def test_normalize():
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    y = aug.normalize(x, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    np.testing.assert_allclose(y, 0.0, atol=1e-6)


def test_color_jitter_ranges_and_determinism():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    k = jax.random.key(3)
    y1 = aug.color_jitter(k, x, brightness=0.4, contrast=0.4,
                          saturation=0.4, hue=0.1)
    y2 = aug.color_jitter(k, x, brightness=0.4, contrast=0.4,
                          saturation=0.4, hue=0.1)
    np.testing.assert_array_equal(y1, y2)  # same key -> same draw
    y3 = aug.color_jitter(jax.random.key(4), x, brightness=0.4)
    assert not np.allclose(y1, y3)
    assert float(jnp.min(y1)) >= 0.0 and float(jnp.max(y1)) <= 1.0


def test_hue_zero_is_identity():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
    y = aug.color_jitter(jax.random.key(0), x, hue=1e-9)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_augment_train_end_to_end_jit():
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 40, 40, 3), dtype=np.uint8))
    cfg = aug.AugmentConfig(out_hw=(32, 32), area_range=(0.3, 1.0),
                            brightness=0.2, contrast=0.2, saturation=0.2,
                            flip=True)
    fn = jax.jit(lambda k, x: aug.augment_train(k, x, cfg))
    out = fn(jax.random.key(0), imgs)
    assert out.shape == (8, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # different keys give different augmentations
    out2 = fn(jax.random.key(1), imgs)
    assert not np.allclose(out, out2)


def test_augment_eval_deterministic():
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 36, 36, 3), dtype=np.uint8))
    cfg = aug.AugmentConfig(out_hw=(32, 32))
    a = aug.augment_eval(imgs, cfg)
    b = aug.augment_eval(imgs, cfg)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 32, 32, 3)


def test_cifar_style_pad_crop_chain():
    rng = np.random.RandomState(8)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    cfg = aug.AugmentConfig(out_hw=(32, 32), area_range=None, pad=4,
                            flip=True, mean=(0.5, 0.5, 0.5),
                            std=(0.25, 0.25, 0.25))
    out = aug.augment_train(jax.random.key(0), imgs, cfg)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pad_crop_matches_numpy_zero_pad_reference():
    """The einsum pad-crop path (integer offsets, clamp=False) must equal
    literal zero-pad-then-crop — the reference's (and the Pallas
    kernel's) semantics."""
    rng = np.random.RandomState(11)
    imgs = rng.randint(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    pad = 3
    boxes = aug.pad_crop_boxes(jax.random.key(5), 6, (16, 16), pad=pad)
    out = np.asarray(aug.batched_crop_resize(
        jnp.asarray(imgs), boxes, (16, 16), clamp=False))
    b = np.asarray(boxes).astype(int)
    padded = np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    for i in range(6):
        y0, x0 = b[i, 0] + pad, b[i, 1] + pad
        expect = padded[i, y0:y0 + 16, x0:x0 + 16].astype(np.float32)
        np.testing.assert_allclose(out[i], expect, atol=1e-4, err_msg=i)


def test_pad_crop_offsets_are_integers():
    boxes = aug.pad_crop_boxes(jax.random.key(1), 64, (32, 32), pad=4)
    b = np.asarray(boxes)
    np.testing.assert_array_equal(b[:, :2], np.round(b[:, :2]))


def test_pair_pad_crop_masks_get_ignore_label():
    """Padded border pixels of the mask are ignore-label (255), never a
    trainable class."""
    rng = np.random.RandomState(12)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8))
    masks = jnp.asarray(rng.randint(1, 5, (8, 16, 16)).astype(np.int32))
    cfg = aug.AugmentConfig(out_hw=(16, 16), area_range=None, pad=4,
                            flip=False)
    x, y = aug.augment_train_pair(jax.random.key(3), imgs, masks, cfg)
    y = np.asarray(y)
    # any pixel outside the shifted frame must be 255; all others in 1..4
    assert set(np.unique(y)).issubset(set(range(1, 5)) | {255})
    # with pad=4 over 8 draws, at least one image has a shifted border
    assert (y == 255).any()
    # and the image's padded border is exactly zero pre-normalization:
    # normalize(0) = -mean/std
    expect_border = (0.0 - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    xi = np.asarray(x)
    border_pix = xi[y == 255]
    np.testing.assert_allclose(border_pix,
                               np.broadcast_to(expect_border,
                                               border_pix.shape),
                               atol=1e-4)


def test_interp_dtype_bf16_close_to_f32():
    """interp_dtype='bfloat16' runs the sampling einsums on the bf16
    MXU path; the result must stay within ~1 u8 LSB of the exact-f32
    geometry (pixel values <=255 are exact in bf16; only interpolation
    weights round)."""
    import jax
    import numpy as np

    from myconvnet_tpu.data.augment import AugmentConfig, augment_train

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (8, 40, 40, 3), np.uint8)
    base = dict(out_hw=(32, 32), area_range=(0.5, 1.0), flip=True,
                mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    key = jax.random.key(3)
    y32 = np.asarray(augment_train(key, raw,
                                   AugmentConfig(**base)), np.float32)
    y16 = np.asarray(augment_train(
        key, raw, AugmentConfig(**base, interp_dtype="bfloat16")),
        np.float32)
    # same random geometry (same key), so only interpolation rounding
    # differs: ~1/255 in [0,1] units
    assert np.max(np.abs(y32 - y16)) <= 2.5 / 255.0
    assert np.mean(np.abs(y32 - y16)) <= 0.5 / 255.0
