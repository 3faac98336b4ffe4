"""Detection path: matching, multibox loss, postprocess, mAP, e2e step.

Hand-computed goldens for the matcher/AP; the e2e test trains a toy
single-map detector with the real fused step until the loss drops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import nn
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.detection import MeanAPEvaluator, average_precision
from myconvnet_tpu.ops import boxes as B
from myconvnet_tpu.train import detection as det
from myconvnet_tpu.train.optim import sgd

ANCHORS = jnp.asarray(np.array([
    [0.0, 0.0, 0.4, 0.4],
    [0.5, 0.5, 0.9, 0.9],
    [0.1, 0.6, 0.3, 0.9],
], np.float32))


def test_match_anchors_basic():
    gt = jnp.asarray(np.array([[0.05, 0.05, 0.42, 0.40]], np.float32))
    labels = jnp.asarray(np.array([3], np.int32))
    mb, ml, pos = det.match_anchors(ANCHORS, gt, labels, 0.5)
    assert bool(pos[0]) and not bool(pos[1]) and not bool(pos[2])
    assert int(ml[0]) == 3 and int(ml[1]) == 0
    np.testing.assert_allclose(np.asarray(mb[0]), np.asarray(gt[0]))


def test_match_anchors_empty_gt_all_background():
    gt = jnp.zeros((2, 4))
    labels = -jnp.ones((2,), jnp.int32)  # all padding
    _, ml, pos = det.match_anchors(ANCHORS, gt, labels, 0.5)
    assert not bool(pos.any())
    assert int(ml.sum()) == 0


def test_match_anchors_force_matches_best_anchor():
    # a gt overlapping nothing above threshold still claims its best anchor
    gt = jnp.asarray(np.array([[0.55, 0.55, 0.6, 0.6]], np.float32))
    labels = jnp.asarray(np.array([7], np.int32))
    _, ml, pos = det.match_anchors(ANCHORS, gt, labels, 0.5)
    assert bool(pos[1])  # anchor 1 is the best (containing) anchor
    assert int(ml[1]) == 7


def test_multibox_loss_perfect_prediction_is_small():
    gt_boxes = jnp.asarray(np.array([[[0.05, 0.05, 0.42, 0.40]]],
                                    np.float32))
    gt_labels = jnp.asarray(np.array([[2]], np.int32))
    mb, ml, pos = det.match_anchors(ANCHORS, gt_boxes[0], gt_labels[0], 0.5)
    loc = B.encode_boxes(mb, ANCHORS)[None]  # exact regression targets
    cls = jax.nn.one_hot(ml, 5)[None] * 50.0  # near-delta logits
    loss, metrics = det.multibox_loss(cls, loc, gt_boxes, gt_labels,
                                      ANCHORS)
    assert float(loss) < 1e-3
    assert int(metrics["n_pos"]) == 1


def test_multibox_loss_hard_negative_ratio():
    # 1 positive, ratio 3 -> at most 3 mined negatives contribute;
    # with only 2 other anchors the count clamps to 2
    gt_boxes = jnp.asarray(np.array([[[0.05, 0.05, 0.42, 0.40]]],
                                    np.float32))
    gt_labels = jnp.asarray(np.array([[2]], np.int32))
    cls = jnp.zeros((1, 3, 5))  # uniform logits: every anchor equal CE
    loc = jnp.zeros((1, 3, 4))
    _, m = det.multibox_loss(cls, loc, gt_boxes, gt_labels, ANCHORS,
                             neg_pos_ratio=3.0)
    ce_uniform = float(np.log(5.0))
    # cls_loss = (1 pos + 2 mined neg) * ce / n_pos
    np.testing.assert_allclose(float(m["cls_loss"]), 3 * ce_uniform,
                               rtol=1e-5)


def test_average_precision_hand_case():
    # 2 gts; detections: TP@0.9, FP@0.8 -> all-point AP = 0.5
    recall = np.array([0.5, 0.5])
    precision = np.array([1.0, 0.5])
    assert average_precision(recall, precision) == pytest.approx(0.5)
    ap11 = average_precision(recall, precision, "11point")
    assert ap11 == pytest.approx(6 / 11, abs=1e-6)


def test_mean_ap_evaluator_perfect_and_miss():
    ev = MeanAPEvaluator(num_classes=3)
    gt_boxes = np.zeros((1, 2, 4), np.float32)
    gt_boxes[0, 0] = [0.1, 0.1, 0.4, 0.4]
    gt_boxes[0, 1] = [0.6, 0.6, 0.9, 0.9]
    gt_labels = np.array([[1, 2]], np.int32)
    # detections: exact matches
    boxes = gt_boxes.copy()
    scores = np.array([[0.9, 0.8]], np.float32)
    labels = np.array([[1, 2]], np.int32)
    valid = np.ones((1, 2), bool)
    ev.update((boxes, scores, labels, valid), (gt_boxes, gt_labels))
    assert ev.score() == pytest.approx(1.0)
    # a wrong-class detection scores 0 for its class... but its class has
    # no gt, so it is excluded; a missed class with gt scores 0
    ev.reset()
    ev.update((boxes[:, :1], scores[:, :1], labels[:, :1], valid[:, :1]),
              (gt_boxes, gt_labels))
    assert ev.score() == pytest.approx(0.5)  # class 1 found, class 2 missed


def test_mean_ap_duplicate_detections_are_fps():
    ev = MeanAPEvaluator(num_classes=2)
    gt_boxes = np.array([[[0.1, 0.1, 0.5, 0.5]]], np.float32)
    gt_labels = np.array([[1]], np.int32)
    boxes = np.repeat(gt_boxes, 2, axis=1)  # same box twice
    scores = np.array([[0.9, 0.8]], np.float32)
    labels = np.array([[1, 1]], np.int32)
    valid = np.ones((1, 2), bool)
    ev.update((boxes, scores, labels, valid), (gt_boxes, gt_labels))
    # first matches (TP), second is a duplicate (FP): AP stays 1.0 under
    # all-point interpolation (recall hits 1.0 at precision 1.0 first)
    assert ev.score() == pytest.approx(1.0)
    aps = ev.per_class_ap()
    assert set(aps) == {1}


# ---------------------------------------------------------------- e2e

TOY_SPEC = ((4, 0.3, 0.6, ()),)  # 4x4 map, 2 anchors/cell -> 32 anchors


def _toy_detector(x, num_classes, train=False):
    """Conv stack: 32x32 -> 4x4 map, 2 anchors/cell."""
    h = nn.conv(x, 16, 3, stride=2, name="c1")
    h = nn.relu(h)
    h = nn.conv(h, 32, 3, stride=2, name="c2")
    h = nn.relu(h)
    h = nn.conv(h, 32, 3, stride=2, name="c3")
    h = nn.relu(h)
    cls = nn.conv(h, 2 * num_classes, 3, name="cls")
    loc = nn.conv(h, 2 * 4, 3, name="loc")
    b = x.shape[0]
    return (cls.reshape(b, -1, num_classes), loc.reshape(b, -1, 4))


def test_detection_step_trains_toy_detector():
    anchors = jnp.asarray(B.ssd_anchors(TOY_SPEC))
    assert anchors.shape == (32, 4)
    net = transform(_toy_detector)
    opt = sgd(0.05, momentum=0.9)
    state = det.init_det_state(net, opt, jax.random.key(0),
                               jnp.zeros((2, 32, 32, 3)), 4)
    step = jax.jit(det.make_detection_step(net, opt, anchors, 4))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt_boxes = jnp.asarray(np.array(
        [[[0.1, 0.1, 0.45, 0.45], [0.5, 0.55, 0.95, 0.9]],
         [[0.3, 0.3, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]]], np.float32))
    gt_labels = jnp.asarray(np.array([[1, 2], [3, -1]], np.int32))

    first = None
    for _ in range(30):
        state, metrics = step(state, (images, gt_boxes, gt_labels))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, f"loss {first} -> {last}"

    # postprocess end-to-end on the trained model
    post = jax.jit(det.make_postprocess(anchors, 4, score_threshold=0.1,
                                        max_detections=8))
    (cls, loc), _ = net.apply(state.params, state.state, None, images, 4,
                              train=False)
    boxes, scores, labels, valid = post(cls, loc)
    assert boxes.shape == (2, 8, 4) and bool(valid.any())
    ev = MeanAPEvaluator(num_classes=4)
    ev.update((boxes, scores, labels, valid), (gt_boxes, gt_labels))
    assert 0.0 <= ev.score() <= 1.0


def test_coco_map_evaluator_threshold_average():
    from myconvnet_tpu.eval.detection import COCOMeanAPEvaluator
    ev = COCOMeanAPEvaluator(num_classes=3)
    # one image, one gt of class 1; the detection is CONTAINED in the
    # gt with exactly 70% of its area -> IoU 0.7: matches at thresholds
    # 0.50..0.70 (5 of 10), misses 0.75..0.95 -> mAP@[.5:.95] = 0.5
    gt_b = np.array([[[0.0, 0.0, 0.4, 0.4]]], np.float32)
    gt_l = np.array([[1]], np.int32)
    det_b = np.array([[[0.0, 0.0, 0.4, 0.28]]], np.float32)
    ev.update((det_b, np.array([[0.9]]), np.array([[1]]),
               np.array([[True]])), (gt_b, gt_l))
    per = ev.per_threshold()
    assert per[0.5] == 1.0 and per[0.7] == 1.0 and per[0.75] == 0.0
    np.testing.assert_allclose(ev.score(), 0.5)
    # a perfect detection scores 1.0 across the whole sweep
    ev.reset()
    ev.update((gt_b, np.array([[0.9]]), np.array([[1]]),
               np.array([[True]])), (gt_b, gt_l))
    np.testing.assert_allclose(ev.score(), 1.0)


def test_postprocess_pre_nms_topk_preserves_results():
    """Top-k candidate pre-selection must not change what NMS emits
    when the real detections are comfortably inside the top k."""
    from myconvnet_tpu.ops.boxes import ssd_anchors
    from myconvnet_tpu.models.ssd import TINYDET_SPEC
    anchors = jnp.asarray(ssd_anchors(TINYDET_SPEC))  # 756 anchors
    rng = np.random.RandomState(0)
    cls = rng.normal(size=(2, 756, 5)).astype(np.float32)
    # plant two confident detections per image
    cls[:, 10, 2] = 9.0
    cls[:, 400, 3] = 8.0
    loc = (rng.normal(size=(2, 756, 4)) * 0.05).astype(np.float32)
    full = det.make_postprocess(anchors, 5, pre_nms_topk=0)
    topk = det.make_postprocess(anchors, 5, pre_nms_topk=64)
    fb, fs, fl, fv = (np.asarray(t) for t in full(cls, loc))
    tb, ts, tl, tv = (np.asarray(t) for t in topk(cls, loc))
    # compare the valid detections as (score, label, box) sets
    for i in range(2):
        f = sorted((round(float(s), 5), int(l), tuple(np.round(b, 5)))
                   for s, l, b, v in zip(fs[i], fl[i], fb[i], fv[i]) if v)
        t = sorted((round(float(s), 5), int(l), tuple(np.round(b, 5)))
                   for s, l, b, v in zip(ts[i], tl[i], tb[i], tv[i]) if v)
        # the top-64 candidate pool keeps every above-threshold survivor
        # the full pool found among its strongest 64
        assert t == f[:len(t)] or set(t) <= set(f)
        assert len(t) >= 2  # both planted objects survive
        # planted logits at softmax columns 2 and 3 = gt labels 2 and 3
        top2 = {lab for _, lab, _ in sorted(t, reverse=True)[:2]}
        assert top2 == {2, 3}


def test_ssd512_pyramid_and_anchor_agreement():
    """ssd512's seven-map pyramid must line up with SSD512_SPEC: the
    head emits exactly as many rows as the spec generates anchors."""
    from myconvnet_tpu.core import transform
    from myconvnet_tpu import models
    from myconvnet_tpu.ops.boxes import SSD512_SPEC, ssd_anchors
    anchors = ssd_anchors(SSD512_SPEC)
    per_cell = (4, 6, 6, 6, 6, 4, 4)
    want = sum(a * fm * fm
               for a, (fm, *_r) in zip(per_cell, SSD512_SPEC))
    assert anchors.shape == (want, 4) and want == 24564
    net = transform(lambda x, c, train=False: models.ssd512(
        x, c, train=train))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 512, 512, 3)), 21)
    (cls, loc), _ = net.apply(params, state, None,
                              jnp.zeros((1, 512, 512, 3)), 21,
                              train=False)
    assert cls.shape == (1, 24564, 21) and loc.shape == (1, 24564, 4)
