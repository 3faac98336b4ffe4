"""RetinaNet family: FPN anchors, weight-tied heads, focal loss, e2e.

Covers the second detector (models/retinanet.py): the octave anchor
grid's geometry, shared_scope weight tying across pyramid levels, the
ignore-band matcher, focal loss goldens, and a fused-step training run
with sigmoid postprocess recovering the planted object.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.module import shared_scope
from myconvnet_tpu.core import module
from myconvnet_tpu.ops.boxes import (RETINA512_SPEC, retina_anchors)
from myconvnet_tpu.train import detection as det
from myconvnet_tpu.train.optim import adam


# ------------------------------------------------------------- anchors

def test_retina_anchor_count_and_geometry():
    a = retina_anchors(RETINA512_SPEC)
    assert a.shape == (9 * (64**2 + 32**2 + 16**2 + 8**2 + 4**2), 4)
    # first cell of the first level: centered at (0.5/64, 0.5/64),
    # first variant = octave 0, ratio 0.5 -> w/h = 0.5, area base^2
    w = a[0, 2] - a[0, 0]
    h = a[0, 3] - a[0, 1]
    np.testing.assert_allclose(w / h, 0.5, rtol=1e-5)
    np.testing.assert_allclose(w * h, 0.0625**2, rtol=1e-5)
    cx = 0.5 * (a[0, 0] + a[0, 2])
    np.testing.assert_allclose(cx, 0.5 / 64, atol=1e-6)
    # unclipped by default: big anchors extend outside the frame
    assert (a < 0).any() and (a > 1).any()


def test_retina_anchor_cell_major_matches_head_layout():
    # anchor k of cell (r, c) on level 0 sits at flat index
    # (r*64 + c)*9 + k — the head's [H, W, a*k] reshape order
    a = retina_anchors(RETINA512_SPEC)
    r, c, k = 2, 5, 3
    idx = (r * 64 + c) * 9 + k
    cy = 0.5 * (a[idx, 1] + a[idx, 3])
    cx = 0.5 * (a[idx, 0] + a[idx, 2])
    np.testing.assert_allclose(cy, (r + 0.5) / 64, atol=1e-6)
    np.testing.assert_allclose(cx, (c + 0.5) / 64, atol=1e-6)


# -------------------------------------------------------- weight tying

def test_shared_scope_ties_parameters_across_visits():
    from myconvnet_tpu import nn

    def f(x):
        outs = []
        for _ in range(3):
            with shared_scope("head"):
                outs.append(nn.conv(x, 4, 3, name="c"))
        return sum(outs)

    net = transform(f)
    params, _ = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 2)))
    scopes = [k for k in params if "head" in k]
    assert scopes == ["head/c"]  # one bucket, not head/c, head/c_1, ...


def test_shared_scope_does_not_leak_numbering():
    from myconvnet_tpu import nn

    def f(x):
        a = nn.conv(x, 4, 3)          # auto-named conv
        with shared_scope("head"):
            b = nn.conv(x, 4, 3)      # head/conv
        c = nn.conv(x, 4, 3)          # conv_1 (outer numbering resumes)
        return a + b + c

    net = transform(f)
    params, _ = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 2)))
    assert set(params) == {"conv", "head/conv", "conv_1"}


def test_tinyretina_head_params_shared_and_apply_matches_init():
    net = transform(lambda x, c, train=False: models.tinyretina(
        x, c, train=train, width=8))
    params, state = net.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
                             4)
    cls_scopes = [k for k in params if "cls_head" in k]
    assert cls_scopes == ["cls_head/conv1", "cls_head/out"]
    (cls, loc), _ = net.apply(params, state, None,
                              jnp.zeros((2, 128, 128, 3)), 4, train=False)
    assert cls.shape == (2, 2016, 3) and loc.shape == (2, 2016, 4)
    # prior-bias init: background-ish sigmoid everywhere at t=0
    p = jax.nn.sigmoid(cls)
    assert float(p.max()) < 0.1


# ------------------------------------------------- matcher + focal loss

ANCHORS = jnp.asarray(np.array([
    [0.0, 0.0, 0.4, 0.4],
    # shifted by 0.15: IoU vs the [0,0,.4,.4] gt = 0.25/0.55 = 0.4545,
    # inside the [0.4, 0.5) ignore band
    [0.15, 0.0, 0.55, 0.4],
    [0.5, 0.5, 0.9, 0.9],
], np.float32))


def test_match_band_ignore_zone():
    # gt overlaps anchor 0 fully, anchor 1 partially (in the band)
    gt = jnp.asarray([[0.0, 0.0, 0.4, 0.4]])
    labels = jnp.asarray([2], jnp.int32)
    mb, ml, pos, ign = det.match_anchors_band(ANCHORS, gt, labels,
                                              0.5, 0.4)
    iou01 = float(
        np.asarray(__import__("myconvnet_tpu.ops.boxes",
                              fromlist=["box_iou"]).box_iou(
            ANCHORS[1:2], gt))[0, 0])
    assert 0.4 <= iou01 < 0.5  # the fixture really is in the band
    assert bool(pos[0]) and not bool(pos[1]) and not bool(pos[2])
    assert bool(ign[1]) and not bool(ign[0]) and not bool(ign[2])
    assert int(ml[0]) == 2


def test_focal_loss_perfect_prediction_small_and_ignore_extends():
    gt_boxes = jnp.asarray([[[0.0, 0.0, 0.4, 0.4]]])
    gt_labels = jnp.asarray([[2]], jnp.int32)
    from myconvnet_tpu.ops.boxes import encode_boxes
    mb, ml, pos, ign = det.match_anchors_band(ANCHORS, gt_boxes[0],
                                              gt_labels[0], 0.5, 0.4)
    loc = encode_boxes(mb, ANCHORS)[None]
    k = 3
    cls = jnp.where(
        (pos[:, None] & (jnp.arange(k)[None, :] == (ml[:, None] - 1))),
        20.0, -20.0)[None]
    loss, metrics = det.focal_det_loss(cls, loc, gt_boxes, gt_labels,
                                       ANCHORS)
    assert float(loss) < 1e-4
    # flipping the in-band anchor's logits must NOT change the loss
    cls2 = cls.at[0, 1].set(20.0)
    loss2, _ = det.focal_det_loss(cls2, loc, gt_boxes, gt_labels, ANCHORS)
    np.testing.assert_allclose(float(loss2), float(loss), atol=1e-6)


def test_focal_loss_gamma_downweights_easy_negatives():
    # an all-background image of confident negatives: gamma=2 must cost
    # (1-p_t)^2 ~ 0.014x what plain weighted BCE (gamma=0) charges
    gt_boxes = jnp.zeros((1, 1, 4))
    gt_labels = -jnp.ones((1, 1), jnp.int32)  # no objects
    cls = jnp.full((1, 3, 3), -2.0)
    loc = jnp.zeros((1, 3, 4))
    l2, _ = det.focal_det_loss(cls, loc, gt_boxes, gt_labels, ANCHORS,
                               gamma=2.0)
    l0, _ = det.focal_det_loss(cls, loc, gt_boxes, gt_labels, ANCHORS,
                               gamma=0.0)
    assert 0.0 < float(l2) < 0.05 * float(l0)


# --------------------------------------------------------------- e2e

@pytest.mark.slow
def test_tinyretina_trains_and_detects():
    net = transform(lambda x, c, train=False: models.tinyretina(
        x, c, train=train, width=8))
    anchors = jnp.asarray(retina_anchors(models.tinyretina.anchor_spec))
    opt = adam(1e-3)
    step = jax.jit(det.make_detection_step(net, opt, anchors, 4,
                                           loss_fn=det.focal_det_loss))
    st = det.init_det_state(net, opt, jax.random.key(0),
                            jnp.zeros((2, 128, 128, 3)), 4)
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.uniform(
        0, 1, size=(2, 128, 128, 3)).astype(np.float32))
    gt_b = jnp.asarray([[[0.2, 0.2, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]],
                        [[0.5, 0.1, 0.9, 0.5], [0.0, 0.0, 0.0, 0.0]]])
    gt_l = jnp.asarray([[1, -1], [2, -1]], dtype=jnp.int32)
    first = last = None
    for i in range(40):
        st, m = step(st, (imgs, gt_b, gt_l))
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < 0.2 * first  # 4.3 -> <0.9 observed ~0.08
    post = det.make_postprocess(anchors, 4, score_activation="sigmoid",
                                score_threshold=0.3)
    (cls, loc), _ = net.apply(st.params, st.state, None, imgs, 4,
                              train=False)
    boxes, scores, labels, valid = jax.jit(post)(cls, loc)
    assert int(valid[0].sum()) >= 1 and int(valid[1].sum()) >= 1
    assert int(labels[0, 0]) == 1 and int(labels[1, 0]) == 2


@pytest.mark.slow
def test_retinanet_recipe_builds_and_steps():
    from myconvnet_tpu import recipes
    cfg = dict(
        task="detection", model="tinyretina", dataset="voc",
        data_dir=None, num_classes=21, input_hw=(128, 128),
        max_boxes=8, batch_size=2, total_steps=2, val_every=2,
        log_every=1, match_iou=0.5, neg_iou=0.4,
        optimizer=dict(name="momentum", momentum_coef=0.9,
                       lr=dict(kind="constant", lr=1e-3)),
        augment=dict(flip=True, iou_crop=True, expand_prob=0.5),
        precision="f32", seed=0)
    state, step, predict, train_set, _val = recipes.build_detector(
        cfg, synthetic=True)
    batch = next(iter(train_set.train_iter(2, prefetch=0)))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    out = predict(state, jnp.asarray(batch[0]))
    assert out[0].shape[1] == 100  # max_detections default


def test_aligned_giou_goldens():
    from myconvnet_tpu.ops.boxes import aligned_giou
    a = jnp.asarray([[0.0, 0.0, 0.4, 0.4],
                     [0.0, 0.0, 0.2, 0.2],
                     [0.0, 0.0, 0.2, 0.2]])
    b = jnp.asarray([[0.0, 0.0, 0.4, 0.4],    # identical -> 1
                     [0.2, 0.0, 0.4, 0.2],    # adjacent -> iou 0,
                                              # enclose 0.4x0.2 fully
                                              # covered by union -> 0
                     [0.8, 0.8, 1.0, 1.0]])   # far apart -> negative
    g = np.asarray(aligned_giou(a, b))
    np.testing.assert_allclose(g[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[1], 0.0, atol=1e-6)
    assert g[2] < -0.5
    # gradient exists for disjoint boxes (the point of GIoU)
    grad = jax.grad(lambda x: aligned_giou(x, b[2]).sum())(a[2])
    assert float(jnp.abs(grad).sum()) > 0


def test_focal_loss_giou_variant_trains():
    net = transform(lambda x, c, train=False: models.tinyretina(
        x, c, train=train, width=8))
    anchors = jnp.asarray(retina_anchors(models.tinyretina.anchor_spec))
    opt = adam(1e-3)
    loss_fn = lambda c, l, gb, gl, a: det.focal_det_loss(  # noqa: E731
        c, l, gb, gl, a, loc_loss_kind="giou")
    step = jax.jit(det.make_detection_step(net, opt, anchors, 4,
                                           loss_fn=loss_fn))
    st = det.init_det_state(net, opt, jax.random.key(0),
                            jnp.zeros((2, 128, 128, 3)), 4)
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.uniform(
        0, 1, size=(2, 128, 128, 3)).astype(np.float32))
    gt_b = jnp.asarray([[[0.2, 0.2, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]],
                        [[0.5, 0.1, 0.9, 0.5], [0.0, 0.0, 0.0, 0.0]]])
    gt_l = jnp.asarray([[1, -1], [2, -1]], dtype=jnp.int32)
    losses = []
    for _ in range(25):
        st, m = step(st, (imgs, gt_b, gt_l))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]
