"""Detection flip-TTA: box mirroring, duplicate collapse, score keep.

eval/det_tta.py merges the straight and mirrored predict passes with a
class-aware NMS; these tests pin the geometry and the merge semantics
with a hand-built fake predictor, then run the real chain on a trained
tinydet to show TTA preserves (or improves) the detections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.eval.det_tta import flip_boxes_x, make_flip_tta


def test_flip_boxes_roundtrip():
    b = jnp.asarray([[0.1, 0.2, 0.4, 0.8], [0.0, 0.0, 1.0, 1.0]])
    f = flip_boxes_x(b)
    np.testing.assert_allclose(np.asarray(f[0]), [0.6, 0.2, 0.9, 0.8],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(flip_boxes_x(f)),
                               np.asarray(b), atol=1e-6)


def test_flip_tta_merges_duplicates_and_keeps_best_score():
    # fake predictor: the straight pass sees the object at 0.8 score;
    # the mirrored pass sees the SAME object (in mirrored coords) at
    # 0.9 plus a spurious extra box elsewhere
    obj = np.array([0.2, 0.2, 0.5, 0.6], np.float32)
    spur = np.array([0.7, 0.7, 0.9, 0.9], np.float32)

    def predict(state, images):
        flipped = bool(np.asarray(images)[0, 0, 0, 0] < 0.5)
        if not flipped:
            boxes = np.stack([obj, np.zeros(4, np.float32)])[None]
            scores = np.array([[0.8, 0.0]], np.float32)
            labels = np.array([[3, 1]], np.int32)
            valid = np.array([[True, False]])
        else:
            boxes = np.stack([np.asarray(flip_boxes_x(jnp.asarray(obj))),
                              np.asarray(flip_boxes_x(
                                  jnp.asarray(spur)))])[None]
            scores = np.array([[0.9, 0.4]], np.float32)
            labels = np.array([[3, 5]], np.int32)
            valid = np.array([[True, True]])
        return (jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), jnp.asarray(valid))

    # marker input: straight pass sees 1.0 at [0,0,0,0]; the wrapper
    # mirrors the LAST axis-2 column into position 0
    images = np.zeros((1, 4, 4, 3), np.float32)
    images[0, :, 0, :] = 1.0
    tta = make_flip_tta(predict, iou_threshold=0.5, max_detections=4)
    b, s, l, v = (np.asarray(t) for t in tta(None, jnp.asarray(images)))
    kept = [(round(float(sc), 4), int(lb), tuple(np.round(bx, 4)))
            for bx, sc, lb, ok in zip(b[0], s[0], l[0], v[0]) if ok]
    # duplicate object collapsed to ONE detection at the better score
    assert (0.9, 3, tuple(np.round(obj, 4))) in kept
    assert sum(1 for _s, lb, _b in kept if lb == 3) == 1
    # the spurious mirrored box survives as its own (different class),
    # mapped BACK to straight coordinates
    assert (0.4, 5, tuple(np.round(spur, 4))) in kept


def test_flip_tta_real_chain_on_trained_tinydet():
    from myconvnet_tpu import recipes
    cfg = dict(task="detection", model="tinydet", dataset="voc",
               data_dir=None, num_classes=21, max_boxes=8, batch_size=4,
               total_steps=8,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.05)),
               augment=dict(flip=True), seed=0)
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=True)
    for i, batch in enumerate(train_set.train_iter(4, prefetch=0)):
        state, _m = step(state, batch)
        if i >= 7:
            break
    imgs = jnp.asarray(val_set.source.get_batch(np.arange(4))[0])
    tta = jax.jit(make_flip_tta(predict))
    b, s, l, v = tta(state, imgs)
    assert v.shape == (4, 100)
    assert bool(np.asarray(v).any())
    assert np.isfinite(np.asarray(s)[np.asarray(v)]).all()
    # scores only improve or match under flip averaging's max-merge
    _b0, s0, _l0, v0 = predict(state, imgs)
    top_tta = float(np.asarray(s).max())
    top_single = float(np.where(np.asarray(v0),
                                np.asarray(s0), 0.0).max())
    assert top_tta >= top_single - 1e-6
