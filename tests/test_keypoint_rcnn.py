"""Keypoint R-CNN: model contract, grid targets, heatmap loss, flip
augmentation with channel permutation, OKS evaluators, recipe
round-trip on the CPU-runnable tinykp."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.detection import (COCOKeypointMeanAPEvaluator,
                                          KeypointMeanAPEvaluator)
from myconvnet_tpu.models.keypoint_rcnn import tinykp
from myconvnet_tpu.subsets.coco import (COCO_KP_FLIP_PERM,
                                        make_keypoint_source,
                                        synthetic_keypoint_subset)
from myconvnet_tpu.train import rcnn as rcnn_lib
from myconvnet_tpu.train.detection import DetAugment

TINY_CFG = dict(
    task="detection",
    model="tinykp",
    dataset="coco",
    data_dir=None,
    num_classes=2,
    max_boxes=8,
    batch_size=4,
    total_steps=10,
    model_kwargs=dict(num_keypoints=4),
    optimizer=dict(name="momentum", momentum_coef=0.9,
                   lr=dict(kind="constant", lr=0.02)),
    augment=dict(flip=True),
    seed=0,
)


def _gt(b=2):
    gt_b = jnp.asarray([[[0.1, 0.1, 0.4, 0.4],
                         [0.5, 0.5, 0.9, 0.9]]] * b)
    gt_l = jnp.asarray([[1, 1]] * b, jnp.int32)
    return gt_b, gt_l


def test_model_contract_modes():
    net = transform(lambda x, n, train=False, **kw: tinykp(
        x, n, train=train, **kw))
    x = jnp.zeros((2, 128, 128, 3))
    gt_b, gt_l = _gt()
    params, state = net.init(jax.random.key(0), x, 2, train=True,
                             gt_boxes=gt_b, gt_labels=gt_l)
    out, _ = net.apply(params, state, jax.random.key(1), x, 2,
                       train=True, gt_boxes=gt_b, gt_labels=gt_l)
    # kp branch: kp_samples=16 RoIs at 4*kp_pool=20 heatmap resolution
    assert out.kp_logits.shape == (2, 16, 20, 20, 4)
    assert out.kp_rois.shape == (2, 16, 4)
    assert int(out.kp_valid.sum()) == min(16, int(out.roi_pos.sum()))
    # detection-time mode: heatmaps for exactly the given boxes
    rois = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]), (2, 5, 1))
    logits, _ = net.apply(params, state, None, x, 2, kp_rois=rois)
    assert logits.shape == (2, 5, 20, 20, 4)


def test_keypoint_targets_geometry():
    # one RoI [0.2,0.2,0.6,0.6], gt row 0 has a keypoint at the RoI
    # center and one outside; row 1 exists but is not matched
    gt_kps = jnp.asarray([[
        [[0.43, 0.33, 2.0], [0.9, 0.9, 2.0], [0.3, 0.5, 0.0]],
        [[0.0, 0.0, 2.0], [0.0, 0.0, 2.0], [0.0, 0.0, 2.0]],
    ]])
    rois = jnp.asarray([[[0.2, 0.2, 0.6, 0.6]]])
    kp_gt = jnp.zeros((1, 1), jnp.int32)
    uv, valid = rcnn_lib.keypoint_targets(gt_kps, rois, kp_gt,
                                          heat_size=8)
    assert valid.shape == (1, 1, 3)
    # kp 0: fx = 0.575 -> u 4, fy = 0.325 -> v 2 -> flat 2*8+4
    assert bool(valid[0, 0, 0]) and int(uv[0, 0, 0]) == 2 * 8 + 4
    assert not bool(valid[0, 0, 1])  # outside the RoI
    assert not bool(valid[0, 0, 2])  # unlabeled (vis 0)


def test_keypoint_head_loss_targets_grid_cell():
    B, S, p, K = 1, 2, 4, 3
    uv = jnp.asarray([[[5, 0, 10], [0, 0, 0]]], jnp.int32)
    pt_valid = jnp.asarray([[[True, True, False],
                             [True, True, True]]])
    kp_valid = jnp.asarray([[True, False]])  # roi 1 carries no loss
    z = jnp.zeros((B, S, p, p, K))
    # perfect: +10 logits at the target cells of roi 0's valid kps
    z = z.at[0, 0, 1, 1, 0].set(10.0)   # flat 5 = (1,1)
    z = z.at[0, 0, 0, 0, 1].set(10.0)   # flat 0
    l0, m = rcnn_lib.keypoint_head_loss(z, uv, pt_valid, kp_valid)
    assert float(l0) < 0.01 and int(m["kp_vis"]) == 2
    # corrupting an invalid keypoint's map changes nothing
    z_inv = z.at[0, 0, :, :, 2].set(33.0)
    l1, _ = rcnn_lib.keypoint_head_loss(z_inv, uv, pt_valid, kp_valid)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    # corrupting an invalid ROI's maps changes nothing
    z_roi = z.at[0, 1].set(-7.0)
    l2, _ = rcnn_lib.keypoint_head_loss(z_roi, uv, pt_valid, kp_valid)
    np.testing.assert_allclose(float(l2), float(l0), atol=1e-6)
    # moving the peak off the target cell raises the loss
    z_bad = z.at[0, 0, 1, 1, 0].set(0.0).at[0, 0, 3, 3, 0].set(10.0)
    l3, _ = rcnn_lib.keypoint_head_loss(z_bad, uv, pt_valid, kp_valid)
    assert float(l3) > float(l0) + 1.0


def test_flip_augmentation_permutes_channels():
    imgs = jnp.zeros((4, 16, 16, 3), jnp.uint8)
    boxes = jnp.tile(jnp.asarray([[[0.1, 0.2, 0.5, 0.8]]]), (4, 1, 1))
    labels = jnp.ones((4, 1), jnp.int32)
    kps = jnp.tile(jnp.asarray(
        [[[[0.1, 0.2, 2.0], [0.5, 0.2, 2.0],
           [0.1, 0.8, 1.0], [0.5, 0.8, 0.0]]]]), (4, 1, 1, 1))
    cfg = DetAugment(hflip=True, mean=None, std=None)
    # find a key under which at least one image flips and one doesn't
    for s in range(20):
        _, b2, _, k2 = rcnn_lib.augment_keypoint_batch(
            imgs, boxes, labels, kps, jax.random.key(s), cfg,
            flip_perm=(1, 0, 3, 2))
        b2, k2 = np.asarray(b2), np.asarray(k2)
        flipped = ~np.isclose(b2[:, 0, 0], 0.1)
        if flipped.any() and (~flipped).any():
            break
    i = int(np.argmax(flipped))
    j = int(np.argmax(~flipped))
    # unflipped image: untouched rows
    np.testing.assert_allclose(k2[j], np.asarray(kps[j]), atol=1e-6)
    # flipped: channel 0 now holds old channel 1 mirrored
    np.testing.assert_allclose(k2[i, 0, 0], [1.0 - 0.5, 0.2, 2.0],
                               atol=1e-6)
    np.testing.assert_allclose(k2[i, 0, 1], [1.0 - 0.1, 0.2, 2.0],
                               atol=1e-6)
    # visibility rides the permutation (old ch3 vis=0 -> new ch2)
    assert k2[i, 0, 2, 2] == 0.0 and k2[i, 0, 3, 2] == 1.0
    # box mirrored consistently
    np.testing.assert_allclose(b2[i, 0], [0.5, 0.2, 0.9, 0.8],
                               atol=1e-6)


def test_decode_keypoints_inverts_targets():
    # put a peak at a known cell; decode must land inside that cell
    boxes = jnp.asarray([[[0.2, 0.4, 0.6, 0.8]]])
    p, K = 8, 2
    z = jnp.full((1, 1, p, p, K), -5.0)
    z = z.at[0, 0, 2, 5, 0].set(5.0)    # v=2, u=5
    z = z.at[0, 0, 7, 0, 1].set(5.0)
    kps = np.asarray(rcnn_lib.decode_keypoints(z, boxes))
    x, y, c = kps[0, 0, 0]
    np.testing.assert_allclose(x, 0.2 + (5.5 / 8) * 0.4, atol=1e-6)
    np.testing.assert_allclose(y, 0.4 + (2.5 / 8) * 0.4, atol=1e-6)
    assert c > 0.9
    x, y, _ = kps[0, 0, 1]
    np.testing.assert_allclose(x, 0.2 + (0.5 / 8) * 0.4, atol=1e-6)
    np.testing.assert_allclose(y, 0.4 + (7.5 / 8) * 0.4, atol=1e-6)


def _one_kp_scene():
    kp = np.zeros((1, 1, 4, 3), np.float32)
    kp[0, 0, :, 0] = [0.3, 0.7, 0.3, 0.7]
    kp[0, 0, :, 1] = [0.3, 0.3, 0.7, 0.7]
    kp[0, 0, :, 2] = 2.0
    box = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    preds = (box, np.asarray([[0.9]], np.float32),
             np.asarray([[1]], np.int32), np.asarray([[True]]))
    targets = (box.copy(), np.asarray([[1]], np.int32), kp.copy())
    return preds, kp, targets


def test_oks_evaluator_scores_keypoints_not_boxes():
    preds, kp, targets = _one_kp_scene()
    good = KeypointMeanAPEvaluator(2)
    good.update(preds + (kp,), targets)
    assert good.score() == 1.0
    # same box, keypoints shoved to a corner -> OKS ~ 0 -> AP 0
    far = kp.copy()
    far[..., 0] = 0.01
    far[..., 1] = 0.99
    bad = KeypointMeanAPEvaluator(2)
    bad.update(preds + (far,), targets)
    assert bad.score() == 0.0
    # COCO sweep: perfect keypoints clear every threshold
    sweep = COCOKeypointMeanAPEvaluator(2)
    sweep.update(preds + (kp,), targets)
    assert sweep.score() == 1.0
    # zero-labeled-keypoint gt rows are ignore zones, not targets
    tgt_unlab = (targets[0], targets[1], np.zeros_like(kp))
    ign = KeypointMeanAPEvaluator(2)
    ign.update(preds + (kp,), tgt_unlab)
    assert ign.per_class_ap() == {}


def test_synthetic_source_and_recipe_roundtrip():
    imgs, boxes, labels, kps = synthetic_keypoint_subset(
        n=8, raw_hw=(64, 64), seed=0, max_boxes=8, num_keypoints=4)
    assert kps.shape == (8, 8, 4, 3)
    real = labels >= 1
    # every labeled instance carries its 4 corner keypoints
    assert (kps[real][:, :, 2] == 2.0).all()
    # corners sit on the box corners
    np.testing.assert_allclose(kps[real][:, 0, :2],
                               boxes[real][:, (0, 1)], atol=1e-6)
    np.testing.assert_allclose(kps[real][:, 3, :2],
                               boxes[real][:, (2, 3)], atol=1e-6)

    cfg = dict(TINY_CFG, total_steps=12)
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=True)
    losses, kp_losses = [], []
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        kp_losses.append(float(m["kp_loss"]))
        if i >= 11:
            break
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    assert np.isfinite(kp_losses).all()
    ev = recipes.build_evaluator(cfg)
    assert isinstance(ev, KeypointMeanAPEvaluator)
    mAP = recipes.evaluate_detection(state, predict, val_set, 4, ev)
    assert np.isfinite(mAP) and 0.0 <= mAP <= 1.0


def test_predict_and_inference_contract():
    cfg = dict(TINY_CFG, total_steps=2)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _ = step(state, batch)
        if i >= 1:
            break
    imgs = train_set.source.get_batch(np.arange(4))[0]
    boxes, scores, labels, valid, kps = (np.asarray(t)
                                         for t in predict(state, imgs))
    assert kps.shape == (4, 100, 4, 3)
    assert ((kps[..., 2] >= 0) & (kps[..., 2] <= 1)).all()
    # keypoints land inside their boxes
    v = valid.astype(bool)
    assert (kps[v][..., 0] >= boxes[v][:, None, 0] - 1e-5).all()
    assert (kps[v][..., 0] <= boxes[v][:, None, 2] + 1e-5).all()
    fn = recipes.make_detector_inference(cfg, state)
    got = fn(jnp.asarray(np.asarray(imgs), np.float32) / 255.0)
    assert len(got) == 5
    for w, g in zip((boxes, scores, labels, valid, kps), got):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-3)


def test_oks_matches_pycocotools_formula():
    """OKS exponent uses kappa_i = 2*sigma_i (the pycocotools vars)."""
    sig = np.asarray([0.05, 0.1], np.float64)
    gkp = np.asarray([[0.5, 0.5, 2.0], [0.6, 0.6, 2.0]], np.float32)
    kp = gkp.copy()
    kp[0, 0] += 0.03
    kp[1, 1] -= 0.04
    box = np.asarray([0.3, 0.3, 0.8, 0.8], np.float32)
    ev = KeypointMeanAPEvaluator(2, sigmas=sig)
    got = ev._candidate_ious((0, 1, 0.9, box, kp), [(box, False, gkp)])
    area = 0.5 * 0.5
    d2 = np.asarray([0.03 ** 2, 0.04 ** 2])
    want = np.exp(-d2 / (2.0 * area * (2.0 * sig) ** 2 + 1e-12)).mean()
    np.testing.assert_allclose(got[0], want, rtol=1e-6)


def test_ignore_rows_do_not_hijack_real_matches():
    """A zero-labeled gt whose box IoU beats the real gt's OKS must not
    steal the detection (pycocotools real-first matching)."""
    kp = np.zeros((1, 1, 4, 3), np.float32)
    kp[..., 0] = [0.32, 0.48, 0.32, 0.48]
    kp[..., 1] = [0.32, 0.32, 0.48, 0.48]
    kp[..., 2] = 1.0
    det_box = np.asarray([[[0.3, 0.3, 0.5, 0.5]]], np.float32)
    # real gt: same box, keypoints slightly off (OKS in (thr, 1));
    # ignore row: the det box EXACTLY (box IoU 1.0)
    gkp = kp.copy()
    gkp[..., 0] += 0.01
    gt_boxes = np.concatenate([det_box, det_box], axis=1)
    gt_labels = np.asarray([[1, 1]], np.int32)
    gt_kps = np.concatenate([gkp, np.zeros_like(gkp)], axis=1)
    ev = KeypointMeanAPEvaluator(2, iou_threshold=0.5)
    ev.update((det_box, np.asarray([[0.9]]), np.asarray([[1]]),
               np.asarray([[True]]), kp),
              (gt_boxes, gt_labels, gt_kps))
    # OKS vs the real row clears 0.5 -> must be a TP, not ignored
    assert ev.score() == 1.0


def test_coco_sweep_cache_invalidated_by_subclass_update():
    preds, kp, targets = _one_kp_scene()
    ev = COCOKeypointMeanAPEvaluator(2)
    ev.update(preds + (kp,), targets)
    assert ev.score() == 1.0
    # second image: a confident detection with garbage keypoints on a
    # fresh gt -> the sweep must change
    far = kp.copy()
    far[..., 0] = 0.99
    ev.update((preds[0], np.asarray([[0.95]], np.float32), preds[2],
               preds[3], far), targets)
    assert ev.score() < 1.0


def test_load_keypoints_marks_unlabeled_as_ignore(tmp_path):
    import json
    doc = dict(
        images=[dict(id=1, file_name="a.jpg", width=100, height=100)],
        annotations=[
            dict(image_id=1, bbox=[10, 10, 40, 40], iscrowd=0,
                 num_keypoints=2,
                 keypoints=[20, 20, 2, 40, 40, 1, 0, 0, 0]),
            dict(image_id=1, bbox=[50, 50, 30, 30], iscrowd=1,
                 num_keypoints=0, keypoints=[0] * 9),
        ],
        categories=[dict(id=1, name="person")])
    p = tmp_path / "kp.json"
    p.write_text(json.dumps(doc))
    from myconvnet_tpu.subsets.coco import load_keypoints
    names, annos = load_keypoints(str(p), keep_unlabeled=False)
    assert len(annos[0][0]) == 1          # crowd dropped for training
    names, annos = load_keypoints(str(p), keep_unlabeled=True)
    boxes, labels, kps = annos[0]
    assert len(boxes) == 2                # kept for eval...
    assert (kps[1][:, 2] == 0).all()      # ...as an ignore row


def test_flip_perm_required_for_odd_skeletons():
    import pytest
    cfg = dict(TINY_CFG, total_steps=1,
               model_kwargs=dict(num_keypoints=3))
    with pytest.raises(ValueError, match="flip_perm"):
        recipes.build_detector(cfg, synthetic=True)
    # explicit perm of the right length passes config validation
    cfg2 = dict(cfg, flip_perm=(0, 2, 1))
    state, *_ = recipes.build_detector(cfg2, synthetic=True)
    # wrong length is rejected
    with pytest.raises(ValueError, match="entries"):
        recipes.build_detector(dict(cfg, flip_perm=(1, 0)),
                               synthetic=True)
