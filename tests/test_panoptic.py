"""Panoptic FPN: model contract, semantic loss, merge heuristic, PQ
metric, recipe round-trip on the CPU-runnable tinypan."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.panoptic import (PanopticQualityEvaluator,
                                         merge_panoptic)
from myconvnet_tpu.models.panoptic import tinypan
from myconvnet_tpu.subsets.voc import (make_panoptic_source,
                                       synthetic_panoptic_subset)
from myconvnet_tpu.train import rcnn as rcnn_lib

TINY_CFG = dict(
    task="detection",
    model="tinypan",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    max_boxes=8,
    batch_size=4,
    total_steps=10,
    optimizer=dict(name="momentum", momentum_coef=0.9,
                   lr=dict(kind="constant", lr=0.005)),
    augment=dict(flip=True),
    seed=0,
)


def test_model_contract():
    net = transform(lambda x, n, train=False, **kw: tinypan(
        x, n, train=train, **kw))
    x = jnp.zeros((2, 128, 128, 3))
    gt_b = jnp.asarray([[[0.1, 0.1, 0.4, 0.4]]] * 2)
    gt_l = jnp.asarray([[3]] * 2, jnp.int32)
    params, state = net.init(jax.random.key(0), x, 21, train=True,
                             gt_boxes=gt_b, gt_labels=gt_l)
    out, _ = net.apply(params, state, jax.random.key(1), x, 21,
                       train=True, gt_boxes=gt_b, gt_labels=gt_l)
    # semantic branch at the finest pyramid level (128/8 = 16)
    assert out.sem_logits.shape == (2, 16, 16, 2)
    assert out.mask_logits.shape == (2, 16, 10, 10, 20)


def test_semantic_loss_subsamples_gt():
    B, h, S, H = 1, 4, 3, 16
    sem = jnp.full((B, h, h, S), -8.0)
    # gt: left half class 1, right half class 2
    gt = np.ones((B, H, H), np.int32)
    gt[:, :, H // 2:] = 2
    good = sem.at[:, :, :2, 1].set(8.0).at[:, :, 2:, 2].set(8.0)
    l0, m = rcnn_lib.semantic_loss(good, jnp.asarray(gt))
    assert float(l0) < 0.01 and float(m["sem_acc"]) == 1.0
    # ignore pixels drop out: corrupt gt under 255 -> loss unchanged
    gt2 = gt.copy()
    gt2[:, :8] = 255
    l1, _ = rcnn_lib.semantic_loss(good, jnp.asarray(gt2))
    assert np.isfinite(float(l1))
    bad = sem.at[:, :, :, 0].set(8.0)
    l2, m2 = rcnn_lib.semantic_loss(bad, jnp.asarray(gt))
    assert float(l2) > float(l0) + 1.0 and float(m2["sem_acc"]) == 0.0


def _det(box, score, label, mask=None):
    """Single-image, single-detection preds (batched [1,1,...])."""
    return (np.asarray([[box]], np.float32), np.asarray([[score]]),
            np.asarray([[label]], np.int32), np.asarray([[True]]),
            np.asarray([[mask if mask is not None
                         else np.ones((8, 8))]], np.float32))


def test_merge_prefers_higher_scores():
    sem = np.ones((32, 32), np.int32)  # all background stuff
    boxes = np.asarray([[0.25, 0.25, 0.75, 0.75],
                        [0.25, 0.25, 0.75, 0.75]], np.float32)
    scores = np.asarray([0.6, 0.9], np.float32)
    labels = np.asarray([3, 7], np.int32)
    valid = np.asarray([True, True])
    masks = np.ones((2, 8, 8), np.float32)
    seg, segments = merge_panoptic(boxes, scores, labels, valid, masks,
                                   sem)
    # identical boxes: the higher-scored instance wins, the other is
    # dropped (majority of its mask already claimed); stuff fills rest
    assert segments[0] == ("thing", 7)
    assert ("thing", 3) not in segments
    assert ("stuff", 1) in segments
    thing_id = 1 + segments.index(("thing", 7))
    assert (seg[8:24, 8:24] == thing_id).all()
    assert (seg[:8] == 1 + segments.index(("stuff", 1))).all()


def test_pq_perfect_and_partial():
    H = 32
    inst = np.zeros((1, H, H), np.int32)
    inst[0, 8:24, 8:24] = 1
    sem_gt = np.where(inst[0] > 0, 0, 1)[None].astype(np.int32)
    gt_boxes = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    gt_labels = np.asarray([[5]], np.int32)
    preds = _det([0.25, 0.25, 0.75, 0.75], 0.9, 5) + (sem_gt,)
    ev = PanopticQualityEvaluator(21, 2, stuff_min_area=16)
    ev.update(preds, (gt_boxes, gt_labels, inst, sem_gt))
    per = ev.per_class()
    assert per[("thing", 5)]["pq"] == 1.0
    assert per[("stuff", 1)]["pq"] == 1.0
    assert ev.score() == 1.0
    # wrong class -> FP for class 9 AND FN for class 5
    ev2 = PanopticQualityEvaluator(21, 2, stuff_min_area=16)
    wrong = _det([0.25, 0.25, 0.75, 0.75], 0.9, 9) + (sem_gt,)
    ev2.update(wrong, (gt_boxes, gt_labels, inst, sem_gt))
    per2 = ev2.per_class()
    assert per2[("thing", 5)]["pq"] == 0.0
    assert per2[("thing", 9)]["pq"] == 0.0
    assert per2[("stuff", 1)]["pq"] == 1.0


def test_pq_void_pixels_excluded():
    H = 32
    inst = np.zeros((1, H, H), np.int32)
    inst[0, 8:24, 8:24] = 1
    sem_gt = np.where(inst[0] > 0, 0, 1)[None].astype(np.int32)
    sem_gt[0, :4] = 255  # void band
    gt_boxes = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    gt_labels = np.asarray([[5]], np.int32)
    # predicted semantic claims the void band as stuff — must not hurt
    sem_pred = np.where(inst[0] > 0, 0, 1)[None].astype(np.int32)
    preds = _det([0.25, 0.25, 0.75, 0.75], 0.9, 5) + (sem_pred,)
    ev = PanopticQualityEvaluator(21, 2, stuff_min_area=16)
    ev.update(preds, (gt_boxes, gt_labels, inst, sem_gt))
    assert ev.score() == 1.0


def test_difficult_instances_become_void():
    H = 32
    inst = np.zeros((1, H, H), np.int32)
    inst[0, 2:14, 2:14] = 1     # difficult
    inst[0, 18:30, 18:30] = 2   # real
    sem_gt = np.where(inst[0] > 0, 0, 1)[None].astype(np.int32)
    gt_boxes = np.asarray([[[2 / 32, 2 / 32, 14 / 32, 14 / 32],
                            [18 / 32, 18 / 32, 30 / 32, 30 / 32]]],
                          np.float32)
    gt_labels = np.asarray([[-(5 + 1), 5]], np.int32)
    # detect ONLY the difficult one -> its segment lies on void ->
    # removed, not an FP; the real instance is the only FN
    preds = _det([2 / 32, 2 / 32, 14 / 32, 14 / 32], 0.9, 5) + (
        np.where(inst > 0, 0, 1).astype(np.int32),)
    ev = PanopticQualityEvaluator(21, 2, stuff_min_area=16)
    ev.update(preds, (gt_boxes, gt_labels, inst, sem_gt))
    row = ev._acc[("thing", 5)]
    assert row[1] == 0 and row[2] == 0 and row[3] == 1  # tp, fp, fn


def test_synthetic_source_and_recipe_roundtrip():
    imgs, boxes, labels, inst, sem = synthetic_panoptic_subset(
        n=8, raw_hw=(64, 64), seed=0)
    assert sem.shape == (8, 64, 64)
    assert set(np.unique(sem)) <= {0, 1}
    assert ((sem == 0) == (inst > 0)).all()

    cfg = dict(TINY_CFG, total_steps=12)
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=True)
    losses, sem_losses = [], []
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        sem_losses.append(float(m["sem_loss"]))
        if i >= 11:
            break
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # the semantic sub-task is easy on the synthetic scenes — it must
    # actually learn
    assert sem_losses[-1] < sem_losses[0]
    ev = recipes.build_evaluator(cfg)
    assert isinstance(ev, PanopticQualityEvaluator)
    pq = recipes.evaluate_detection(state, predict, val_set, 4, ev)
    assert np.isfinite(pq) and 0.0 <= pq <= 1.0


def test_predict_and_inference_contract():
    cfg = dict(TINY_CFG, total_steps=2)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _ = step(state, batch)
        if i >= 1:
            break
    imgs = train_set.source.get_batch(np.arange(4))[0]
    out = [np.asarray(t) for t in predict(state, imgs)]
    boxes, scores, labels, valid, masks, sem = out
    assert sem.shape == (4, 128, 128) and sem.dtype == np.int32
    assert masks.shape == (4, 100, 10, 10)
    fn = recipes.make_detector_inference(cfg, state)
    got = fn(jnp.asarray(np.asarray(imgs), np.float32) / 255.0)
    assert len(got) == 6
    for w, g in zip(out, got):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-3)


def test_export_reload_six_output_artifact(tmp_path):
    """The panoptic predict chain (6 outputs incl. the semantic map)
    exports to StableHLO and reloads with identical outputs — the
    serving path for the richest detection family."""
    from myconvnet_tpu import serving
    cfg = dict(TINY_CFG, total_steps=1)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    imgs = train_set.source.get_batch(np.arange(2))[0]
    x = np.asarray(imgs, np.float32) / 255.0
    fn = recipes.make_detector_inference(cfg, state)
    path = str(tmp_path / "pan.stablehlo")
    serving.export_detection(fn, None, x, path)
    loaded = serving.load_inference(path)
    want = fn(jnp.asarray(x))
    got = loaded(x)
    assert len(got) == 6
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5)
