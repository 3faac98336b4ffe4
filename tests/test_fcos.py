"""FCOS: point grids, target assignment, losses, decode, recipe
round-trip on the CPU-runnable tinyfcos."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import recipes
from myconvnet_tpu.models.fcos import (TINYFCOS_SPEC, fcos_points,
                                       tinyfcos)
from myconvnet_tpu.train import fcos as fcos_lib

TINY_CFG = dict(
    task="detection",
    model="tinyfcos",
    dataset="voc",
    data_dir=None,
    num_classes=21,
    max_boxes=8,
    batch_size=4,
    total_steps=10,
    optimizer=dict(name="momentum", momentum_coef=0.9,
                   lr=dict(kind="constant", lr=0.002)),
    augment=dict(flip=True),
    seed=0,
)


def test_points_cover_levels():
    pts, bands, strides = fcos_points(TINYFCOS_SPEC)
    assert pts.shape == (16 * 16 + 8 * 8 + 4 * 4, 2)
    # finest level owns the smallest band, last band is open
    assert bands[0, 0] == 0.0 and bands[0, 1] == 4.0 / 16
    # every band must be reachable: a normalized box distance is < 1
    assert (bands[:, 0] < 1.0).all()
    assert np.isinf(bands[-1, 1])
    # centers are inside (0, 1) and stride-spaced
    assert (pts > 0).all() and (pts < 1).all()
    np.testing.assert_allclose(pts[1, 0] - pts[0, 0], 1 / 16)


def test_target_assignment():
    pts, bands, _ = fcos_points(TINYFCOS_SPEC)
    pts, bands = jnp.asarray(pts), jnp.asarray(bands)
    # a small box (owned by the fine level) and a big one (coarse)
    gt_boxes = jnp.asarray([[0.4, 0.4, 0.6, 0.6],
                            [0.05, 0.05, 0.95, 0.95]])
    gt_labels = jnp.asarray([3, 7], jnp.int32)
    labels, d, ctr, pos = fcos_lib.fcos_targets(pts, bands, gt_boxes,
                                                gt_labels)
    labels, d, ctr, pos = (np.asarray(t) for t in (labels, d, ctr, pos))
    assert pos.any()
    # the small box's label appears (fine-level locations inside it);
    # locations inside BOTH boxes take the SMALLER area -> class 3
    # wherever the small box is a candidate
    got = set(np.unique(labels[pos]))
    assert 3 in got and 7 in got
    n_fine = 16 * 16
    inside_small = (np.abs(np.asarray(pts)[:n_fine] - 0.5) < 0.1).all(1)
    lab_fine = labels[:n_fine][inside_small & pos[:n_fine]]
    assert (lab_fine == 3).all() and len(lab_fine) > 0
    # distance targets reconstruct the gt box
    i = int(np.argmax((labels == 3) & pos))
    box = np.asarray(fcos_lib.decode_points(np.asarray(pts)[i], d[i]))
    np.testing.assert_allclose(box, [0.4, 0.4, 0.6, 0.6], atol=1e-6)
    # centerness decreases away from the box center
    fine_pos = pos[:n_fine] & (labels[:n_fine] == 3)
    dist_c = np.abs(np.asarray(pts)[:n_fine] - 0.5).sum(1)
    dist_c[~fine_pos] = np.nan
    best = int(np.nanargmin(dist_c))
    worst = int(np.nanargmax(dist_c))
    assert ctr[best] >= ctr[worst] - 1e-6
    assert 0.0 < ctr[:n_fine][fine_pos].max() <= 1.0
    # unmatched locations are background with zero centerness
    assert (labels[~pos] == 0).all() and (ctr[~pos] == 0).all()


def test_loss_prefers_correct_predictions():
    pts, bands, _ = fcos_points(TINYFCOS_SPEC)
    pts, bands = jnp.asarray(pts), jnp.asarray(bands)
    L = pts.shape[0]
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.7, 0.7]]])
    gt_labels = jnp.asarray([[5]], jnp.int32)
    labels, d_tgt, ctr_tgt, pos = jax.vmap(
        lambda gb, gl: fcos_lib.fcos_targets(pts, bands, gb, gl)
    )(gt_boxes, gt_labels)
    # oracle predictions: +8 logits on the right class, exact
    # distances, exact centerness
    cls = jnp.where(
        (jax.nn.one_hot(labels - 1, 20) * pos[..., None]) > 0, 8.0,
        -8.0)
    ctr_log = jnp.log(jnp.clip(ctr_tgt, 1e-6, 1 - 1e-6)
                      / (1 - jnp.clip(ctr_tgt, 1e-6, 1 - 1e-6)))
    l_good, m = fcos_lib.fcos_loss(cls, ctr_log, d_tgt, pts, bands,
                                   gt_boxes, gt_labels)
    l_bad, mb = fcos_lib.fcos_loss(-cls, ctr_log, d_tgt * 0.3, pts,
                                   bands, gt_boxes, gt_labels)
    # oracle: classification + regression vanish (centerness BCE
    # against its own soft target carries an entropy floor)
    assert float(m["cls_loss"]) < 0.05
    assert float(m["reg_loss"]) < 0.01
    assert float(l_bad) > float(l_good) + 0.5
    assert float(mb["reg_loss"]) > 0.2  # shrunken boxes giou-penalized
    assert int(m["n_pos"]) > 0


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


def test_postprocess_and_inference_contract():
    cfg = dict(TINY_CFG, total_steps=2)
    state, step, predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _ = step(state, batch)
        if i >= 1:
            break
    imgs = train_set.source.get_batch(np.arange(4))[0]
    boxes, scores, labels, valid, *_ = (np.asarray(t)
                                        for t in predict(state, imgs))
    assert boxes.shape == (4, 100, 4)
    v = valid.astype(bool)
    assert (labels[v] >= 1).all() and (labels[v] <= 20).all()
    assert (boxes >= 0).all() and (boxes <= 1).all()
    fn = recipes.make_detector_inference(cfg, state)
    got = fn(jnp.asarray(np.asarray(imgs), np.float32) / 255.0)
    for w, g in zip((boxes, scores, labels, valid), got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-3)
