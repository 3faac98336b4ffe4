"""Detection test-time augmentation: horizontal-flip averaging.

The detection analogue of the classifier's ``--tta flip`` (ConvNet
.predict) and the segmenter's flip protocol (eval/seg_inference.py):
run the fused predict chain on the image AND its mirror, map the
mirrored detections back (x1' = 1 - x2, x2' = 1 - x1), then merge the
two padded detection sets with one more class-aware NMS pass so
duplicated hits collapse and flip-consistent objects keep their best
score.

Everything is static-shape: both passes emit the postprocessor's
padded [B, D] sets; the merge runs NMS over the fixed 2D candidates
with invalid rows score-masked to -inf.  Jittable end to end.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from myconvnet_tpu.ops import boxes as box_ops


def flip_boxes_x(boxes: jax.Array) -> jax.Array:
    """Mirror xyxy boxes horizontally in normalized coordinates."""
    return jnp.stack([1.0 - boxes[..., 2], boxes[..., 1],
                      1.0 - boxes[..., 0], boxes[..., 3]], axis=-1)


def make_flip_tta(predict: Callable, *, iou_threshold: float = 0.5,
                  max_detections: int | None = None) -> Callable:
    """Wrap a fused detection predict into its flip-TTA version.

    ``predict(state, images) -> (boxes [B,D,4], scores, labels, valid)``
    (recipes.build_detector's closure).  Returns ``tta(state, images)``
    with the same output signature (D' = ``max_detections`` or D).
    """

    def tta(state, images):
        b1, s1, l1, v1 = predict(state, images)
        b2, s2, l2, v2 = predict(state, images[:, :, ::-1, :])
        b2 = flip_boxes_x(b2)
        boxes = jnp.concatenate([b1, b2], axis=1)    # [B, 2D, 4]
        scores = jnp.concatenate([s1, s2], axis=1)
        labels = jnp.concatenate([l1, l2], axis=1)
        valid = jnp.concatenate([v1, v2], axis=1)
        # a finite sentinel, NOT -inf: the one-hot selection einsum
        # would turn 0 * -inf into NaN for every selected row
        scores = jnp.where(valid, scores, -1e9)
        d_out = max_detections or b1.shape[1]

        def one(bx, sc, lb):
            idx, ok = box_ops.batched_nms(
                bx, sc, lb, iou_threshold=iou_threshold,
                max_out=d_out, score_threshold=-1e8)
            oh = jax.nn.one_hot(idx, bx.shape[0], dtype=bx.dtype)
            sel = lambda v: jnp.einsum(  # noqa: E731
                "da,a...->d...", oh, v, precision="highest")
            out_s = sel(sc)
            return (sel(bx), jnp.where(ok, out_s, 0.0),
                    sel(lb.astype(bx.dtype)).astype(jnp.int32), ok)

        return jax.vmap(one)(boxes, scores, labels)

    return tta
