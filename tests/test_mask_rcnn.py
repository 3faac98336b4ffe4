"""Mask R-CNN: model contract, mask loss, instance sources, mask-IoU
mAP evaluators, recipe round-trip on the CPU-runnable tinymask."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.detection import (COCOMaskMeanAPEvaluator,
                                          MaskMeanAPEvaluator,
                                          _paste_det_mask)
from myconvnet_tpu.models.mask_rcnn import tinymask
from myconvnet_tpu.subsets.voc import (make_instance_source,
                                       synthetic_instance_subset)
from myconvnet_tpu.train import rcnn as rcnn_lib

TINY_CFG = dict(
    task="detection",
    model="tinymask",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    max_boxes=8,
    batch_size=4,
    total_steps=10,
    optimizer=dict(name="momentum", momentum_coef=0.9,
                   lr=dict(kind="constant", lr=0.02)),
    augment=dict(flip=True),
    seed=0,
)


def _net():
    return transform(lambda x, n, train=False, **kw: tinymask(
        x, n, train=train, **kw))


def _gt(b=2):
    gt_b = jnp.asarray([[[0.1, 0.1, 0.4, 0.4],
                         [0.5, 0.5, 0.9, 0.9]]] * b)
    gt_l = jnp.asarray([[3, 7]] * b, jnp.int32)
    return gt_b, gt_l


def test_model_contract_modes():
    net = _net()
    x = jnp.zeros((2, 128, 128, 3))
    gt_b, gt_l = _gt()
    params, state = net.init(jax.random.key(0), x, 21, train=True,
                             gt_boxes=gt_b, gt_labels=gt_l)
    out, _ = net.apply(params, state, jax.random.key(1), x, 21,
                       train=True, gt_boxes=gt_b, gt_labels=gt_l)
    # mask branch: mask_samples=16 RoIs at 2*mask_pool=10 resolution,
    # one channel per foreground class
    assert out.mask_logits.shape == (2, 16, 10, 10, 20)
    assert out.mask_rois.shape == (2, 16, 4)
    assert out.mask_valid.dtype == jnp.bool_
    # positives-first subsample: every box-head positive that fits the
    # quota must be marked valid for the mask loss
    assert int(out.mask_valid.sum()) == min(16, int(out.roi_pos.sum()))
    lab = np.asarray(out.mask_labels)[np.asarray(out.mask_valid)]
    assert set(np.unique(lab)) <= {3, 7}
    # detection-time mode: logits for exactly the given boxes
    rois = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]), (2, 5, 1))
    logits, _ = net.apply(params, state, None, x, 21, mask_rois=rois)
    assert logits.shape == (2, 5, 10, 10, 20)


def test_mask_head_loss_target_channel_only():
    B, S, p, F = 1, 3, 4, 6
    labels = jnp.asarray([[2, 5, 1]], jnp.int32)
    valid = jnp.asarray([[True, True, False]])
    targets = jnp.ones((B, S, p, p))
    # perfect: +8 logits on the target channel where target=1
    z = jnp.full((B, S, p, p, F), -8.0)
    for s, c in enumerate([1, 4, 0]):
        z = z.at[:, s, :, :, c].set(8.0)
    l0, m = rcnn_lib.mask_head_loss(z, labels, valid, targets)
    assert float(l0) < 0.01 and int(m["mask_pos"]) == 2
    # corrupting a NON-target channel changes nothing
    z_off = z.at[:, 0, :, :, 3].set(99.0)
    l1, _ = rcnn_lib.mask_head_loss(z_off, labels, valid, targets)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    # corrupting an INVALID roi's target channel changes nothing
    z_inv = z.at[:, 2, :, :, 0].set(-99.0)
    l2, _ = rcnn_lib.mask_head_loss(z_inv, labels, valid, targets)
    np.testing.assert_allclose(float(l2), float(l0), atol=1e-6)
    # corrupting a valid roi's TARGET channel raises the loss
    z_bad = z.at[:, 0, :, :, 1].set(-8.0)
    l3, _ = rcnn_lib.mask_head_loss(z_bad, labels, valid, targets)
    assert float(l3) > float(l0) + 1.0


def test_synthetic_instance_consistency():
    imgs, boxes, labels, inst = synthetic_instance_subset(
        n=8, raw_hw=(64, 64), seed=0, max_boxes=8)
    assert imgs.shape == (8, 64, 64, 3) and imgs.dtype == np.uint8
    assert inst.shape == (8, 64, 64) and inst.dtype == np.int32
    for i in range(8):
        ids = np.unique(inst[i])
        for k in ids[ids > 0]:
            assert labels[i, k - 1] >= 1  # id k <-> gt row k-1
            ys, xs = np.where(inst[i] == k)
            x1, y1, x2, y2 = boxes[i, k - 1]
            # instance pixels live inside the (amodal) gt box
            assert ys.min() / 64 >= y1 - 0.02 and xs.min() / 64 >= x1 - 0.02
            assert (ys.max() + 1) / 64 <= y2 + 0.02
            assert (xs.max() + 1) / 64 <= x2 + 0.02


def test_paste_det_mask_window():
    # full-ones 4x4 mask over a box -> window covers exactly the box
    box = np.asarray([0.25, 0.25, 0.75, 0.75], np.float32)
    rs, cs, win = _paste_det_mask(box, np.ones((4, 4), bool), (32, 32))
    assert (rs.start, rs.stop, cs.start, cs.stop) == (8, 24, 8, 24)
    assert win.all()
    # degenerate box -> empty window, no crash
    rs, cs, win = _paste_det_mask(
        np.asarray([0.5, 0.5, 0.5, 0.5], np.float32),
        np.ones((4, 4), bool), (32, 32))
    assert win.size == 0


def _one_det_scene():
    """One image: a single gt instance (rows 8..24, cols 8..24 of 32^2),
    stored as id 1 <-> gt row 0, class 5."""
    inst = np.zeros((1, 32, 32), np.int32)
    inst[0, 8:24, 8:24] = 1
    gt_boxes = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    gt_labels = np.asarray([[5]], np.int32)
    box = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    scores = np.asarray([[0.9]], np.float32)
    labels = np.asarray([[5]], np.int32)
    valid = np.asarray([[True]])
    return (box, scores, labels, valid), (gt_boxes, gt_labels, inst)


def test_mask_evaluator_scores_mask_overlap_not_boxes():
    preds, targets = _one_det_scene()
    # perfect mask -> AP 1.0
    good = MaskMeanAPEvaluator(21)
    good.update(preds + (np.ones((1, 1, 8, 8), np.float32),), targets)
    assert good.score() == 1.0
    # right box, EMPTY mask -> mask IoU 0 -> AP 0 (a box evaluator
    # would have scored this 1.0)
    bad = MaskMeanAPEvaluator(21)
    bad.update(preds + (np.zeros((1, 1, 8, 8), np.float32),), targets)
    assert bad.score() == 0.0
    # half mask (left half ones): IoU 0.5 -> passes at 0.5, not at 0.75
    half = np.zeros((1, 1, 8, 8), np.float32)
    half[..., :4] = 1.0
    at50 = MaskMeanAPEvaluator(21, iou_threshold=0.5)
    at75 = MaskMeanAPEvaluator(21, iou_threshold=0.75)
    for ev in (at50, at75):
        ev.update(preds + (half,), targets)
    assert at50.score() == 1.0 and at75.score() == 0.0


def test_coco_mask_evaluator_sweeps_thresholds():
    preds, targets = _one_det_scene()
    half = np.zeros((1, 1, 8, 8), np.float32)
    half[..., :4] = 1.0
    ev = COCOMaskMeanAPEvaluator(21)
    ev.update(preds + (half,), targets)
    per = ev.per_threshold()
    # IoU exactly 0.5: TP at the 0.50 threshold only
    assert per[0.5] == 1.0 and per[0.55] == 0.0
    np.testing.assert_allclose(ev.score(), 1.0 / 10.0)


def test_instance_source_and_recipe_roundtrip():
    src = make_instance_source(None, "train", synthetic=True,
                               raw_hw=(128, 128))
    imgs, boxes, labels, inst = src.get_batch(np.arange(4))
    assert imgs.shape == (4, 128, 128, 3)
    assert inst.shape == (4, 128, 128)

    cfg = dict(TINY_CFG, total_steps=12)
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=True)
    losses, mask_losses = [], []
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        mask_losses.append(float(m["mask_loss"]))
        if i >= 11:
            break
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    assert np.isfinite(mask_losses).all()
    ev = recipes.build_evaluator(cfg)
    assert isinstance(ev, MaskMeanAPEvaluator)
    mAP = recipes.evaluate_detection(state, predict, val_set, 4, ev)
    assert np.isfinite(mAP) and 0.0 <= mAP <= 1.0


def test_make_detector_inference_serves_masks():
    cfg = dict(TINY_CFG, total_steps=2)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _ = step(state, batch)
        if i >= 1:
            break
    imgs = train_set.source.get_batch(np.arange(4))[0]
    fn = recipes.make_detector_inference(cfg, state)
    want = predict(state, imgs)
    got = fn(jnp.asarray(np.asarray(imgs), np.float32) / 255.0)
    assert len(got) == 5  # boxes, scores, labels, valid, masks
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-3)


def test_predict_contract():
    cfg = dict(TINY_CFG, total_steps=1)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    imgs = train_set.source.get_batch(np.arange(4))[0]
    boxes, scores, labels, valid, masks = (np.asarray(t)
                                           for t in predict(state, imgs))
    assert boxes.shape == (4, 100, 4)       # max_detections
    assert masks.shape == (4, 100, 10, 10)  # 2 * mask_pool
    assert ((masks >= 0.0) & (masks <= 1.0)).all()


def test_difficult_instances_are_ignore_zones():
    """Mark-encoded labels (-(class+1)) score as devkit ignore: a
    detection on one is neither TP nor FP and it never counts toward
    recall."""
    inst = np.zeros((1, 32, 32), np.int32)
    inst[0, 2:14, 2:14] = 1     # difficult instance, row 0
    inst[0, 18:30, 18:30] = 2   # real instance, row 1
    gt_boxes = np.asarray([[[2 / 32, 2 / 32, 14 / 32, 14 / 32],
                            [18 / 32, 18 / 32, 30 / 32, 30 / 32]]],
                          np.float32)
    gt_labels = np.asarray([[-(5 + 1), 5]], np.int32)
    ones = np.ones((1, 1, 8, 8), np.float32)
    # one detection on the REAL instance -> AP 1.0 (difficult row does
    # not cap recall)
    ev = MaskMeanAPEvaluator(21)
    ev.update((gt_boxes[:, 1:2], np.asarray([[0.9]]),
               np.asarray([[5]]), np.asarray([[True]]), ones),
              (gt_boxes, gt_labels, inst))
    assert ev.score() == 1.0
    # one detection on the DIFFICULT instance -> ignored, AP 0 but the
    # detection is not an FP (precision curve stays empty)
    ev2 = MaskMeanAPEvaluator(21)
    ev2.update((gt_boxes[:, 0:1], np.asarray([[0.9]]),
                np.asarray([[5]]), np.asarray([[True]]), ones),
               (gt_boxes, gt_labels, inst))
    assert ev2.score() == 0.0
