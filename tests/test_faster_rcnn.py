"""Faster R-CNN (two-stage family): model contract, losses, fused
step, postprocess, recipe round-trip on the CPU-runnable tinyfrcnn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.models.faster_rcnn import (TINYFRCNN_RPN_SPEC,
                                              tinyfrcnn)
from myconvnet_tpu.ops.boxes import retina_anchors
from myconvnet_tpu.train import rcnn as rcnn_lib

TINY_CFG = dict(
    task="detection",
    model="tinyfrcnn",
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
    return transform(lambda x, n, train=False, **kw: tinyfrcnn(
        x, n, train=train, **kw))


def _gt(b=2):
    gt_b = jnp.asarray([[[0.1, 0.1, 0.4, 0.4],
                         [0.5, 0.5, 0.9, 0.9]]] * b)
    gt_l = jnp.asarray([[3, 7]] * b, jnp.int32)
    return gt_b, gt_l


def test_model_contract_train_and_eval():
    net = _net()
    x = jnp.zeros((2, 128, 128, 3))
    gt_b, gt_l = _gt()
    params, state = net.init(jax.random.key(0), x, 21, train=True,
                             gt_boxes=gt_b, gt_labels=gt_l)
    out, _ = net.apply(params, state, jax.random.key(1), x, 21,
                       train=True, gt_boxes=gt_b, gt_labels=gt_l)
    A = sum(fm * fm * 3 for fm, *_ in TINYFRCNN_RPN_SPEC)
    assert out.rpn_logits.shape == (2, A)
    assert out.rois.shape == (2, 64, 4)          # num_samples
    assert out.roi_cls.shape == (2, 64, 21)
    assert out.roi_reg.shape == (2, 64, 21, 4)
    assert bool(out.roi_valid.any())
    # foreground targets exist (gt is appended to the proposal set)
    assert int(out.roi_pos.sum()) > 0
    assert set(np.unique(np.asarray(out.roi_labels))) <= {0, 3, 7}
    # eval: RoIs are the RPN's proposals, targets are empty
    out_e, _ = net.apply(params, state, None, x, 21, train=False)
    assert out_e.rois.shape == (2, 64, 4)        # post_eval
    assert not bool(out_e.roi_pos.any())
    # RPN is ONE weight-tied scope (shared across pyramid levels)
    rpn_scopes = [s for s in params if "rpn" in s]
    assert len(rpn_scopes) == len({s for s in rpn_scopes})
    assert sum("rpn" in s for s in params) <= 3  # conv/obj/loc buckets


def test_rpn_loss_prefers_correct_objectness():
    anchors = jnp.asarray(retina_anchors(TINYFRCNN_RPN_SPEC))
    A = anchors.shape[0]
    gt_b, gt_l = _gt(1)
    key = jax.random.key(0)
    # matched map: which anchors are positive under the 0.7/0.3 band
    from myconvnet_tpu.train.detection import match_anchors_band
    _, _, pos, _ = match_anchors_band(anchors, gt_b[0], gt_l[0], 0.7,
                                      0.3)
    good = jnp.where(pos, 8.0, -8.0)[None]        # confident + correct
    bad = -good
    loc = jnp.zeros((1, A, 4))
    l_good, m = rcnn_lib.rpn_loss(key, good, loc, gt_b, gt_l, anchors)
    l_bad, _ = rcnn_lib.rpn_loss(key, bad, loc, gt_b, gt_l, anchors)
    assert float(l_good) < 0.2 < float(l_bad)
    assert int(m["rpn_pos"]) > 0


def test_roi_head_loss_target_class_regression_only():
    B, S, C = 1, 4, 5
    labels = jnp.asarray([[2, 0, 3, 0]], jnp.int32)
    pos = jnp.asarray([[True, False, True, False]])
    valid = jnp.ones((B, S), bool)
    targets = jnp.zeros((B, S, 4))
    cls = jax.nn.one_hot(labels, C) * 10.0
    reg = jnp.zeros((B, S, C, 4))
    # perfect prediction -> tiny loss
    l0, m = rcnn_lib.roi_head_loss(cls, reg, labels, targets, pos, valid)
    assert float(l0) < 0.01 and float(m["roi_acc"]) == 1.0
    # error on a NON-target class must not change the loss
    reg_off = reg.at[:, :, 4, :].set(99.0)
    l1, _ = rcnn_lib.roi_head_loss(cls, reg_off, labels, targets, pos,
                                   valid)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    # error on the TARGET class of a positive roi must
    reg_bad = reg.at[:, 0, 2, :].set(3.0)
    l2, _ = rcnn_lib.roi_head_loss(cls, reg_bad, labels, targets, pos,
                                   valid)
    assert float(l2) > float(l0) + 0.5


def test_recipe_trains_and_evaluates():
    cfg = dict(TINY_CFG, total_steps=25)
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=True)
    losses = []
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        if i >= 24:
            break
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    ev = recipes.build_evaluator(cfg)
    mAP = recipes.evaluate_detection(state, predict, val_set, 4, ev)
    assert np.isfinite(mAP) and 0.0 <= mAP <= 1.0


def test_postprocess_contract():
    cfg = dict(TINY_CFG, total_steps=1)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    imgs = train_set.source.get_batch(np.arange(4))[0]
    boxes, scores, labels, valid = (np.asarray(t)
                                    for t in predict(state, imgs))
    assert boxes.shape == (4, 100, 4) and valid.shape == (4, 100)
    v = valid.astype(bool)
    assert (labels[v] >= 1).all() and (labels[v] <= 20).all()
    assert (boxes >= 0).all() and (boxes <= 1).all()
    assert ((scores[v] >= 0) & (scores[v] <= 1)).all()


def test_make_detector_inference_matches_predict():
    cfg = dict(TINY_CFG, total_steps=4)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _ = step(state, batch)
        if i >= 3:
            break
    imgs = train_set.source.get_batch(np.arange(4))[0]
    fn = recipes.make_detector_inference(cfg, state)
    want = predict(state, imgs)
    got = fn(jnp.asarray(np.asarray(imgs), np.float32) / 255.0)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-3)


@pytest.mark.slow
def test_overfits_fixed_scene():
    """120 steps on a frozen 4-image synthetic set: the detector must
    start finding the rectangles (mAP well above the untrained ~0)."""
    cfg = dict(TINY_CFG, total_steps=120,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.02)))
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    batch = next(iter(train_set.train_iter(4, prefetch=0)))
    for _ in range(120):
        state, m = step(state, batch)
    ev = recipes.build_evaluator(cfg)
    ev.reset()
    raw = train_set.source.get_batch(np.arange(4))
    imgs, gt_b, gt_l = raw
    out = predict(state, imgs)
    ev.update(tuple(np.asarray(t) for t in out),
              (np.asarray(gt_b), np.asarray(gt_l)))
    assert np.isfinite(ev.score())
