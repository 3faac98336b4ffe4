"""Box ops vs independent numpy references: IoU, encode/decode, anchors,
NMS.

torchvision is not in this environment, so the goldens are plain-python
O(N^2) reference implementations of the published algorithms (scalar
loops, no vectorization tricks shared with the library code)."""

import jax.numpy as jnp
import numpy as np
import pytest  # noqa: F401  (slow-marker registry)

from myconvnet_tpu.ops import boxes as B


def _random_boxes(n, seed):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 0.8, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.4, size=(n, 2)).astype(np.float32)
    return np.concatenate([xy, np.minimum(xy + wh, 1.0)], axis=1)


def _iou_ref(a, b):
    """Scalar-loop IoU — the textbook formula, one pair at a time."""
    out = np.zeros((len(a), len(b)), np.float64)
    for i, (ax1, ay1, ax2, ay2) in enumerate(a):
        for j, (bx1, by1, bx2, by2) in enumerate(b):
            iw = min(ax2, bx2) - max(ax1, bx1)
            ih = min(ay2, by2) - max(ay1, by1)
            inter = max(iw, 0.0) * max(ih, 0.0)
            ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1)
            out[i, j] = inter / max(ua - inter, 1e-9)
    return out.astype(np.float32)


def _nms_ref(bx, sc, thr):
    """Greedy NMS, scalar: repeatedly keep the best survivor."""
    order = list(np.argsort(-sc, kind="stable"))
    keep = []
    while order:
        best = order.pop(0)
        keep.append(best)
        ious = _iou_ref(bx[best:best + 1], bx[order])[0] if order else []
        order = [o for o, v in zip(order, ious) if v <= thr]
    return np.array(keep)


def test_box_iou_matches_scalar_reference():
    a, b = _random_boxes(17, 0), _random_boxes(9, 1)
    ours = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, _iou_ref(a, b), atol=1e-5)


def test_encode_decode_roundtrip():
    anchors = jnp.asarray(_random_boxes(25, 2))
    gt = jnp.asarray(_random_boxes(25, 3))
    deltas = B.encode_boxes(gt, anchors)
    back = B.decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-5)
    # zero deltas decode to the anchors themselves
    ident = B.decode_boxes(jnp.zeros_like(deltas), anchors)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(anchors),
                               atol=1e-6)


def test_ssd300_anchor_count_and_range():
    a = B.ssd_anchors()
    # the published SSD300 anchor count
    assert a.shape == (8732, 4)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert (a[:, 2:] >= a[:, :2]).all()
    # per-layer counts: 4 or 6 anchors per cell
    counts = [fm * fm * (2 + 2 * len(r)) for fm, _, _, r in B.SSD300_SPEC]
    assert sum(counts) == 8732


def test_ssd_anchors_cell_major_order():
    """The first 4 anchors (38x38 map, 4 variants/cell) share the first
    cell's center; anchor 5 moves one column right — the layout a
    [H, W, a*k]-channel head flattens to."""
    a = B.ssd_anchors(clip=False)
    centers = (a[:, :2] + a[:, 2:]) / 2
    first = centers[0]
    np.testing.assert_allclose(centers[:4],
                               np.tile(first, (4, 1)), atol=1e-6)
    np.testing.assert_allclose(centers[4] - first,
                               [1.0 / 38, 0.0], atol=1e-6)


def test_nms_jacobi_matches_sequential_many_seeds():
    """The parallel fixpoint NMS must reproduce the greedy sweep's keep
    set AND emission order exactly — random scatters and dense clusters
    (deep suppression chains) alike."""
    for seed in range(8):
        rng = np.random.RandomState(seed)
        n = 80
        bx = _random_boxes(n, seed)
        if seed % 2:  # clustered: many overlaps, deeper chains
            base = _random_boxes(8, seed + 100)
            bx = np.clip(base[rng.randint(0, 8, n)]
                         + rng.uniform(-0.05, 0.05, (n, 4)).astype(
                             np.float32), 0, 1)
        sc = rng.uniform(0.05, 1.0, n).astype(np.float32)
        for thr in (0.3, 0.5, 0.7):
            ji, jv = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                           iou_threshold=thr, max_out=n)
            si, sv = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                           iou_threshold=thr, max_out=n,
                           method="sequential")
            np.testing.assert_array_equal(
                np.asarray(ji)[np.asarray(jv)],
                np.asarray(si)[np.asarray(sv)])


def test_nms_jacobi_exact_on_alternating_chain():
    """A left-to-right chain where each box only overlaps its neighbors:
    greedy keeps every other box (0, 2, 4, ...).  The one-pass 'fast
    NMS' relaxation over-suppresses here (box 2 is suppressed by the
    already-dead box 1); the fixpoint iteration must NOT."""
    n = 31
    # unit-height boxes of width 0.1 stepping 0.06: IoU(i, i+1) ~ 0.29,
    # IoU(i, i+2) = 0 -> with thr 0.2 neighbors suppress, skips don't
    x0 = np.arange(n, dtype=np.float32) * 0.018
    bx = np.stack([x0, np.zeros(n, np.float32),
                   x0 + 0.03, np.ones(n, np.float32)], axis=1)
    sc = np.linspace(1.0, 0.5, n).astype(np.float32)  # descending
    idxs, valid = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                        iou_threshold=0.2, max_out=n)
    kept = np.asarray(idxs)[np.asarray(valid)]
    np.testing.assert_array_equal(kept, np.arange(0, n, 2))


def test_nms_jacobi_score_ties_match_sequential():
    bx = _random_boxes(30, 3)
    sc = np.repeat(np.linspace(0.9, 0.3, 6), 5).astype(np.float32)
    ji, jv = B.nms(jnp.asarray(bx), jnp.asarray(sc), iou_threshold=0.5,
                   max_out=30)
    si, sv = B.nms(jnp.asarray(bx), jnp.asarray(sc), iou_threshold=0.5,
                   max_out=30, method="sequential")
    np.testing.assert_array_equal(np.asarray(ji)[np.asarray(jv)],
                                  np.asarray(si)[np.asarray(sv)])


def test_nms_jacobi_max_out_exceeds_n_pads():
    bx = _random_boxes(5, 11)
    sc = np.linspace(0.9, 0.5, 5).astype(np.float32)
    idxs, valid = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                        iou_threshold=1.1, max_out=12)
    assert idxs.shape == (12,) and valid.shape == (12,)
    assert int(np.asarray(valid).sum()) == 5
    assert not np.asarray(valid)[5:].any()


def test_nms_matches_scalar_reference():
    bx = _random_boxes(60, 4)
    rng = np.random.RandomState(5)
    sc = rng.uniform(0.1, 1.0, size=60).astype(np.float32)
    idxs, valid = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                        iou_threshold=0.5, max_out=60)
    kept = np.asarray(idxs)[np.asarray(valid)]
    np.testing.assert_array_equal(kept, _nms_ref(bx, sc, 0.5))


def test_nms_max_out_truncates_in_score_order():
    bx = _random_boxes(40, 6)
    sc = np.random.RandomState(7).uniform(size=40).astype(np.float32)
    full_idx, full_valid = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                                 iou_threshold=0.5, max_out=40)
    top3, v3 = B.nms(jnp.asarray(bx), jnp.asarray(sc),
                     iou_threshold=0.5, max_out=3)
    kept_full = np.asarray(full_idx)[np.asarray(full_valid)]
    np.testing.assert_array_equal(np.asarray(top3)[np.asarray(v3)],
                                  kept_full[:3])


def test_nms_score_threshold():
    bx = jnp.asarray(_random_boxes(10, 8))
    sc = jnp.asarray(np.linspace(0.05, 0.95, 10, dtype=np.float32))
    _, valid = B.nms(bx, sc, iou_threshold=1.1, max_out=10,
                     score_threshold=0.5)
    # iou_threshold > 1 disables suppression: survivors = scores > 0.5
    assert int(valid.sum()) == 5


def test_batched_nms_is_class_aware():
    # two identical boxes, different labels: both must survive
    bx = jnp.asarray(np.tile(np.array([[0.2, 0.2, 0.6, 0.6]],
                                      np.float32), (2, 1)))
    sc = jnp.asarray(np.array([0.9, 0.8], np.float32))
    lab = jnp.asarray(np.array([0, 1], np.int32))
    _, valid = B.batched_nms(bx, sc, lab, iou_threshold=0.5, max_out=2)
    assert int(valid.sum()) == 2
    # same label: one suppresses the other
    _, valid = B.batched_nms(bx, sc, jnp.zeros(2, jnp.int32),
                             iou_threshold=0.5, max_out=2)
    assert int(valid.sum()) == 1
