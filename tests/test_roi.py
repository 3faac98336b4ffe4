"""ops/roi.py vs scalar references: matmul RoIAlign against a plain
loop implementation of the torchvision aligned=True sampling, level
assignment, static-shape proposal generation, RoI subsampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest  # noqa: F401

from myconvnet_tpu.ops import roi as R


def _roi_align_ref(feats, rois, out_size=7, samples=2):
    """Scalar-loop RoIAlign, one image: bilinear taps at aligned=True
    positions, border-clamped, averaged per bin."""
    H, W, C = feats.shape
    P = len(rois)
    out = np.zeros((P, out_size, out_size, C), np.float64)

    def tap(py, px):
        py = min(max(py, 0.0), H - 1.0)
        px = min(max(px, 0.0), W - 1.0)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = py - y0, px - x0
        return ((1 - fy) * (1 - fx) * feats[y0, x0]
                + (1 - fy) * fx * feats[y0, x1]
                + fy * (1 - fx) * feats[y1, x0]
                + fy * fx * feats[y1, x1])

    for p, (x1, y1, x2, y2) in enumerate(rois):
        bh = (y2 - y1) * H / out_size
        bw = (x2 - x1) * W / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C, np.float64)
                for mi in range(samples):
                    for mj in range(samples):
                        py = y1 * H + (i + (mi + 0.5) / samples) * bh - 0.5
                        px = x1 * W + (j + (mj + 0.5) / samples) * bw - 0.5
                        acc += tap(py, px)
                out[p, i, j] = acc / (samples * samples)
    return out.astype(np.float32)


def test_roi_align_matches_scalar_reference():
    rng = np.random.RandomState(0)
    feats = rng.rand(1, 12, 10, 3).astype(np.float32)
    xy = rng.uniform(0, 0.6, (6, 2)).astype(np.float32)
    wh = rng.uniform(0.15, 0.4, (6, 2)).astype(np.float32)
    rois = np.concatenate([xy, np.minimum(xy + wh, 1.0)],
                          axis=1).astype(np.float32)[None]
    got = np.asarray(R.roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                 out_size=5, chunk=4))
    want = _roi_align_ref(feats[0], rois[0], out_size=5)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_roi_align_border_clamp_and_degenerate():
    feats = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    rois = jnp.asarray([[[-0.5, -0.5, 1.5, 1.5],   # overhangs all sides
                         [0.3, 0.3, 0.3, 0.3]]])   # degenerate point
    out = np.asarray(R.roi_align(feats, rois, out_size=2))
    assert np.isfinite(out).all()


def test_assign_levels_scale_rule():
    rois = jnp.asarray([
        [0.0, 0.0, 1.0, 1.0],      # whole image -> top level
        [0.0, 0.0, 0.5, 0.5],      # half -> middle
        [0.0, 0.0, 0.2, 0.2],      # small -> bottom
    ])
    lv = np.asarray(R.assign_levels(rois, 3))
    np.testing.assert_array_equal(lv, [2, 1, 0])


def test_multilevel_roi_align_selects_by_scale():
    # constant-valued levels: the crop's value identifies the level
    feats = [jnp.full((1, 8 * 2 ** (2 - i), 8 * 2 ** (2 - i), 1),
                      float(i)) for i in range(3)]
    rois = jnp.asarray([[[0.0, 0.0, 1.0, 1.0],
                         [0.1, 0.1, 0.3, 0.3]]])
    out = np.asarray(R.multilevel_roi_align(feats, rois, out_size=2,
                                            chunk=2))
    assert np.allclose(out[0, 0], 2.0)   # image-scale roi -> level 2
    assert np.allclose(out[0, 1], 0.0)   # small roi -> level 0


def test_generate_proposals_static_shapes_and_nms():
    A = 64
    rng = np.random.RandomState(1)
    anchors = np.concatenate([rng.uniform(0, 0.5, (A, 2)),
                              rng.uniform(0.5, 1.0, (A, 2))],
                             axis=1).astype(np.float32)
    logits = jnp.asarray(rng.randn(A).astype(np.float32))
    deltas = jnp.zeros((A, 4), jnp.float32)
    boxes, scores, valid = R.generate_proposals(
        logits, deltas, jnp.asarray(anchors), pre_topk=32, post_count=10,
        nms_iou=0.6)
    assert boxes.shape == (10, 4) and valid.shape == (10,)
    assert bool(valid[0])
    s = np.asarray(scores)[np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()   # emitted in score order
    assert (np.asarray(boxes) >= 0).all() and (np.asarray(boxes) <= 1).all()


def test_match_and_sample_rois_quota_and_targets():
    key = jax.random.key(0)
    # 2 gt boxes; proposals: exact copies (fg) + far boxes (bg)
    gt = jnp.asarray([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]])
    gt_labels = jnp.asarray([3, 7], jnp.int32)
    fg_props = jnp.tile(gt, (4, 1))                       # 8 fg
    bg_props = jnp.asarray([[0.0, 0.5, 0.1, 0.6]] * 24)   # 24 bg
    props = jnp.concatenate([fg_props, bg_props])
    valid = jnp.ones((32,), bool)
    rois, labels, targets, pos, ok, mgt = R.match_and_sample_rois(
        key, props, valid, gt, gt_labels, num_samples=16,
        fg_fraction=0.25)
    labels, pos, ok, mgt = (np.asarray(t) for t in (labels, pos, ok, mgt))
    assert rois.shape == (16, 4) and ok.all()
    assert pos.sum() == 4                       # fg quota = 16 * 0.25
    assert set(labels[pos]) <= {3, 7}
    assert (labels[~pos] == 0).all()
    # matched gt row agrees with the label each positive RoI carries
    assert (labels[pos] == np.asarray([3, 7])[mgt[pos]]).all()
    # exact-overlap fg rois encode to ~zero targets
    t = np.asarray(targets)[pos]
    np.testing.assert_allclose(t, 0.0, atol=1e-5)


def test_match_and_sample_rois_no_gt_is_all_background():
    key = jax.random.key(1)
    props = jnp.asarray(np.random.RandomState(2).uniform(
        0, 1, (16, 4)).astype(np.float32))
    props = props.at[:, 2:].set(props[:, :2] + 0.2)
    gt = jnp.zeros((4, 4))
    gt_labels = jnp.full((4,), -1, jnp.int32)
    _, labels, _, pos, ok, _ = R.match_and_sample_rois(
        key, props, jnp.ones((16,), bool), gt, gt_labels,
        num_samples=8)
    assert not np.asarray(pos).any()
    assert (np.asarray(labels) == 0).all()
    assert np.asarray(ok).any()


def test_crop_instance_masks_axis_aligned_rectangles():
    # instance 1 fills rows 4..11, cols 2..9 of a 16x16 map; cropping
    # exactly that box must give an (almost) all-ones 4x4 target, and
    # a background box all zeros
    inst = np.zeros((1, 16, 16), np.int32)
    inst[0, 4:12, 2:10] = 1
    inst[0, 0:2, 12:16] = 2
    rois = jnp.asarray([[[2 / 16, 4 / 16, 10 / 16, 12 / 16],
                         [12 / 16, 0 / 16, 16 / 16, 2 / 16],
                         [0.6, 0.6, 0.9, 0.9]]])
    idx = jnp.asarray([[0, 1, 0]], jnp.int32)
    out = np.asarray(R.crop_instance_masks(jnp.asarray(inst), rois, idx,
                                           out_size=4, chunk=2))
    assert out.shape == (1, 3, 4, 4)
    # bilinear sampling softens instance edges; the training loss
    # thresholds targets at 0.5, so assert at that operating point
    assert (out[0, 0] > 0.5).all()        # interior of instance 1
    assert (out[0, 1] > 0.5).all()        # interior of instance 2
    assert (out[0, 2] < 0.5).all()        # empty region, wrong id


def test_crop_instance_masks_selects_by_index():
    # two instances side by side; the same roi crops different content
    # depending on which instance index it carries
    inst = np.zeros((1, 8, 8), np.int32)
    inst[0, :, :4] = 1
    inst[0, :, 4:] = 2
    roi = jnp.asarray([[[0.0, 0.0, 1.0, 1.0],
                        [0.0, 0.0, 1.0, 1.0]]])
    idx = jnp.asarray([[0, 1]], jnp.int32)
    out = np.asarray(R.crop_instance_masks(jnp.asarray(inst), roi, idx,
                                           out_size=8))
    # left half hot for instance 1, right half hot for instance 2
    assert out[0, 0, :, :3].min() > 0.9 and out[0, 0, :, 5:].max() < 0.1
    assert out[0, 1, :, 5:].min() > 0.9 and out[0, 1, :, :3].max() < 0.1


def test_paste_masks_roundtrip_and_outside_zero():
    # paste a solid 4x4 mask into a box: inside ~1, outside exactly 0
    masks = jnp.ones((1, 1, 4, 4))
    boxes = jnp.asarray([[[0.25, 0.25, 0.75, 0.75]]])
    out = np.asarray(R.paste_masks(masks, boxes, (16, 16)))
    assert out.shape == (1, 1, 16, 16)
    assert out[0, 0, 8, 8] > 0.99                  # box interior
    assert out[0, 0, 0, 0] == 0.0                  # far outside
    assert out[0, 0, 2, 8] == 0.0                  # above the box
    # crop-then-paste of an axis-aligned rectangle roughly recovers it
    inst = np.zeros((1, 16, 16), np.int32)
    inst[0, 4:12, 4:12] = 1
    box = jnp.asarray([[[4 / 16, 4 / 16, 12 / 16, 12 / 16]]])
    crop = R.crop_instance_masks(jnp.asarray(inst), box,
                                 jnp.zeros((1, 1), jnp.int32), out_size=8)
    pasted = np.asarray(R.paste_masks(crop, box, (16, 16)))[0, 0]
    assert pasted[6:10, 6:10].min() > 0.9          # instance interior
    assert pasted[:3, :].max() < 0.1               # background stays off
