"""Paired image+mask augmentation and the segmentation recipe path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.data import augment as aug


def test_pair_geometry_is_shared():
    """Image and mask must receive the SAME crop/flip: a mask equal to a
    channel of the image stays aligned after augmentation."""
    rng = np.random.RandomState(0)
    # image whose channel 0 encodes an integer label field
    labels = rng.randint(0, 5, (4, 16, 16)).astype(np.int32)
    imgs = np.zeros((4, 16, 16, 3), np.uint8)
    imgs[..., 0] = labels * 50  # label*50 in [0,250]
    cfg = aug.AugmentConfig(out_hw=(16, 16), area_range=(0.5, 1.0),
                            aspect_range=(1.0, 1.0), flip=True,
                            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    x, y = aug.augment_train_pair(jax.random.key(3), jnp.asarray(imgs),
                                  jnp.asarray(labels), cfg)
    # nearest-sampled mask * 50/255 must match bilinear image channel
    # wherever the bilinear sample falls on a constant patch; check a
    # looser invariant: the mask values that appear must come from the
    # original label set and the spatial correlation must be high
    assert set(np.unique(np.asarray(y))) <= set(np.unique(labels))
    img_chan = np.asarray(x[..., 0]) * 255.0 / 50.0
    mask = np.asarray(y).astype(np.float32)
    # correlation between image-encoded labels and mask labels
    # bilinear (image) vs nearest (mask) diverge at every label boundary
    # of this per-pixel-random field, so the ceiling is ~0.9; a geometry
    # mismatch (e.g. flip applied to only one of the pair) drops it
    # below ~0.3.
    corr = np.corrcoef(img_chan.ravel(), mask.ravel())[0, 1]
    assert corr > 0.75, corr


def test_mask_values_exact_with_ignore_label():
    masks = np.full((2, 8, 8), 255, np.int32)
    masks[:, 2:6, 2:6] = 7
    boxes = jnp.asarray([[0.0, 0.0, 8.0, 8.0]] * 2)
    out = aug.batched_crop_nearest(jnp.asarray(masks), boxes, (8, 8))
    np.testing.assert_array_equal(out, masks)  # identity box -> exact
    assert set(np.unique(np.asarray(out))) == {7, 255}


def test_eval_pair_resizes_both():
    imgs = np.zeros((2, 20, 20, 3), np.uint8)
    masks = np.zeros((2, 20, 20), np.int32)
    masks[:, :10] = 3
    cfg = aug.AugmentConfig(out_hw=(10, 10), mean=(0,)*3, std=(1,)*3)
    x, y = aug.augment_eval_pair(jnp.asarray(imgs), jnp.asarray(masks), cfg)
    assert x.shape == (2, 10, 10, 3)
    assert y.shape == (2, 10, 10)
    np.testing.assert_array_equal(np.asarray(y[:, :5]), 3)
    np.testing.assert_array_equal(np.asarray(y[:, 5:]), 0)


@pytest.mark.slow
def test_segmentation_recipe_trains():
    from myconvnet_tpu import recipes
    cfg = recipes.load_config("configs/voc_deeplabv3plus.py",
                              total_steps=3, batch_size=2)
    cfg["model_kwargs"] = dict(backbone_depth=18, output_stride=16)
    cfg["precision"] = "f32"
    net, train_set, val_set = recipes.build_segmenter(cfg, synthetic=True)
    net.logger.stdout = False
    evaluator = recipes.build_evaluator(cfg)
    opt = recipes.make_optimizer(cfg["optimizer"])
    state = net.train(train_set, val_set, batch_size=2, total_steps=3,
                      optimizer=opt, evaluator=evaluator)
    assert int(state.step) == 3
    miou = net.evaluate(val_set, evaluator, batch_size=2)
    assert 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_segmenter_predict_images_only():
    """ConvNet.predict on a segmentation net takes raw images (no masks)."""
    from myconvnet_tpu import recipes
    import numpy as np
    cfg = recipes.load_config("configs/voc_deeplabv3plus.py",
                              total_steps=1, batch_size=2)
    cfg["model_kwargs"] = dict(backbone_depth=18, output_stride=16)
    cfg["precision"] = "f32"
    net, train_set, _ = recipes.build_segmenter(cfg, synthetic=True)
    net.build(recipes.make_optimizer(cfg["optimizer"]))
    imgs = train_set.source.images[:3]
    out = net.predict(imgs, batch_size=2)
    assert out.shape == (3, 96, 96, 21)


@pytest.mark.slow
def test_dice_loss_properties():
    import jax
    from myconvnet_tpu.train.losses import ce_dice_loss, dice_loss

    labels = jnp.asarray(np.random.RandomState(0)
                         .randint(0, 4, (2, 8, 8)).astype(np.int32))
    # perfect predictions (huge correct logits) -> dice -> ~0
    perfect = jax.nn.one_hot(labels, 4) * 50.0
    assert float(dice_loss(perfect, labels, ignore_label=None)) < 0.01
    # wrong predictions -> near 1
    wrong = jax.nn.one_hot((labels + 1) % 4, 4) * 50.0
    assert float(dice_loss(wrong, labels, ignore_label=None)) > 0.9
    # ignore pixels don't contribute: flipping an ignored pixel's logits
    labels_ig = labels.at[0, 0, 0].set(255)
    a = float(dice_loss(perfect, labels_ig))
    b = float(dice_loss(perfect.at[0, 0, 0].set(-50.0), labels_ig))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # combined loss is differentiable and positive for imperfect preds
    g = jax.grad(lambda l: ce_dice_loss(l, labels,
                                        ignore_label=None))(wrong)
    assert float(jnp.sum(jnp.abs(g))) > 0


@pytest.mark.slow
def test_seg_loss_config_selection():
    from myconvnet_tpu import recipes
    cfg = dict(task="segmentation", model="unet",
               model_kwargs=dict(base_features=4, depth=2),
               dataset="voc", data_dir=None, num_classes=21,
               batch_size=2, total_steps=1, seg_loss="ce_dice",
               augment=dict(out_hw=(32, 32), area_range=(0.75, 1.25),
                            flip=True),
               precision="f32", seed=0)
    net, train_set, _ = recipes.build_segmenter(cfg, synthetic=True)
    state = net.train(train_set, batch_size=2, total_steps=1)
    assert int(state.step) == 1
    cfg["seg_loss"] = "tversky"
    import pytest
    with pytest.raises(ValueError, match="unknown seg_loss"):
        recipes.build_segmenter(cfg, synthetic=True)


def test_focal_loss_downweights_easy_examples():
    import jax
    from myconvnet_tpu.train.losses import (focal_loss,
                                            pixel_cross_entropy)

    labels = jnp.asarray(np.random.RandomState(1)
                         .randint(0, 4, (2, 8, 8)).astype(np.int32))
    onehot = jax.nn.one_hot(labels, 4)
    easy = onehot * 10.0          # confident + correct
    hard = jnp.zeros_like(onehot)  # uniform
    # gamma=0 degenerates to CE
    for lg in (easy, hard):
        np.testing.assert_allclose(
            float(focal_loss(lg, labels, gamma=0.0)),
            float(pixel_cross_entropy(lg, labels, ignore_label=None)),
            rtol=1e-5)
    # focal crushes the easy loss far more than CE does
    ratio_focal = float(focal_loss(easy, labels)) / \
        float(focal_loss(hard, labels))
    ratio_ce = float(pixel_cross_entropy(easy, labels,
                                         ignore_label=None)) / \
        float(pixel_cross_entropy(hard, labels, ignore_label=None))
    assert ratio_focal < ratio_ce * 0.1
    # classification-rank logits work too
    cls_logits = jnp.asarray(np.random.RandomState(2)
                             .randn(8, 5).astype(np.float32))
    cls_labels = jnp.asarray(np.arange(8) % 5)
    assert np.isfinite(float(focal_loss(cls_logits, cls_labels)))


def test_focal_loss_per_class_alpha():
    """alpha as a length-C sequence is the paper's alpha_t: the target
    class's weight scales that example's term (binary case: (1-a, a))."""
    import numpy as np

    from myconvnet_tpu.train.losses import focal_loss
    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.1, 1.5, -0.3]])
    labels = jnp.asarray([0, 1])
    base = float(focal_loss(logits, labels, gamma=2.0))
    uniform = float(focal_loss(logits, labels, gamma=2.0,
                               alpha=(1.0, 1.0, 1.0)))
    np.testing.assert_allclose(uniform, base, rtol=1e-6)
    # doubling only class 0's weight changes only example 0's term:
    # loss = mean(w_t * f_i); with w=(2,1,1): sum = f0*2 + f1
    per0 = float(focal_loss(logits[:1], labels[:1], gamma=2.0))
    per1 = float(focal_loss(logits[1:], labels[1:], gamma=2.0))
    weighted = float(focal_loss(logits, labels, gamma=2.0,
                                alpha=(2.0, 1.0, 1.0)))
    np.testing.assert_allclose(weighted, (2 * per0 + per1) / 2, rtol=1e-5)
    # scalar stays a plain uniform rescale (backward compat)
    np.testing.assert_allclose(
        float(focal_loss(logits, labels, gamma=2.0, alpha=0.25)),
        0.25 * base, rtol=1e-6)
    with pytest.raises(ValueError):
        focal_loss(logits, labels, alpha=(1.0, 2.0))
