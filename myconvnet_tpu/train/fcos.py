"""FCOS training + postprocess: anchor-free target assignment as pure
broadcast arithmetic, one fused step, the standard decode+NMS chain.

Same discipline as train/detection.py: the uint8 batch augments
on-device inside the SAME XLA program as the model and all three
losses (focal classification, IoU regression, centerness BCE); every
shape is static.  Target assignment (Tian et al. 2019):

* a location is a candidate for a gt box when it lies INSIDE the box
  and the longest of its four regression distances falls in the
  level's band (models/fcos.fcos_points precomputes points + bands);
* among candidates the SMALLEST-AREA gt wins (the paper's ambiguity
  rule) — an argmin over a [L, M] cost matrix + one-hot matmul
  selection, no gathers;
* centerness targets are sqrt(min/max(l,r) * min/max(t,b)) of the
  ASSIGNED gt distances.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.ops import boxes as box_ops
from myconvnet_tpu.train.detection import (DetAugment, DetState,
                                           augment_detection_batch)
from myconvnet_tpu.train.optim import Optimizer

# ------------------------------------------------------------------ targets


def fcos_targets(points: jax.Array, ranges: jax.Array,
                 gt_boxes: jax.Array, gt_labels: jax.Array):
    """One image's assignment: (points [L,2], ranges [L,2],
    gt_boxes [M,4], gt_labels [M]) -> (labels [L] int32 0=bg,
    dist_targets [L,4], centerness [L], pos [L] bool)."""
    px, py = points[:, 0:1], points[:, 1:2]                  # [L,1]
    l = px - gt_boxes[None, :, 0]                            # [L,M]
    t = py - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - px
    b = gt_boxes[None, :, 3] - py
    dist = jnp.stack([l, t, r, b], axis=-1)                  # [L,M,4]
    inside = dist.min(axis=-1) > 0.0
    far = dist.max(axis=-1)
    in_band = (far > ranges[:, 0:1]) & (far <= ranges[:, 1:2])
    valid = (gt_labels >= 1)[None]
    cand = inside & in_band & valid
    area = ((gt_boxes[:, 2] - gt_boxes[:, 0])
            * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    cost = jnp.where(cand, area[None], jnp.inf)              # [L,M]
    pick = cost.argmin(axis=1)                               # [L]
    pos = cand.any(axis=1)
    oh = jax.nn.one_hot(pick, gt_boxes.shape[0],
                        dtype=dist.dtype)                    # [L,M]
    # coordinate/label selection dots must not round through bf16 on
    # TPU (same guard as train/detection.match_anchors_band)
    d = jnp.einsum("lm,lmk->lk", oh, dist,
                   precision="highest")                      # [L,4]
    labels = jnp.where(
        pos, jnp.einsum("lm,m->l", oh, gt_labels.astype(dist.dtype),
                        precision="highest").astype(jnp.int32), 0)
    lr = jnp.stack([d[:, 0], d[:, 2]], -1)
    tb = jnp.stack([d[:, 1], d[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-9))
        * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-9)), 0.0, 1.0))
    return labels, d, jnp.where(pos, ctr, 0.0), pos


def decode_points(points: jax.Array, dists: jax.Array) -> jax.Array:
    """(points [...,2], distances [...,4] l,t,r,b) -> xyxy boxes."""
    return jnp.stack(
        [points[..., 0] - dists[..., 0], points[..., 1] - dists[..., 1],
         points[..., 0] + dists[..., 2], points[..., 1] + dists[..., 3]],
        axis=-1)


# -------------------------------------------------------------------- loss


def _focal_bce(logits, onehot, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    a_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    return a_t * (1.0 - p_t) ** gamma * ce


def fcos_loss(cls_logits: jax.Array, ctr_logits: jax.Array,
              dists: jax.Array, points: jax.Array, ranges: jax.Array,
              gt_boxes: jax.Array, gt_labels: jax.Array, *,
              alpha: float = 0.25, gamma: float = 2.0,
              reg_weight: float = 1.0):
    """Batched FCOS objective: focal CE over all locations, GIoU
    regression + centerness BCE over positives, each normalized by the
    positive count (the paper's normalization).

    Computed in f32 regardless of the model policy: the focal term
    SUMS hundreds of thousands of per-location terms (L x C-1), which
    loses bf16 mantissa long before the mean — a bf16 recipe's heads
    stay bf16, only the loss tail upcasts."""
    cls_logits = cls_logits.astype(jnp.float32)
    ctr_logits = ctr_logits.astype(jnp.float32)
    dists = dists.astype(jnp.float32)
    labels, d_tgt, ctr_tgt, pos = jax.vmap(
        lambda gb, gl: fcos_targets(points, ranges, gb, gl)
    )(gt_boxes, gt_labels)
    B, L, F = cls_logits.shape
    onehot = jax.nn.one_hot(labels - 1, F,
                            dtype=cls_logits.dtype) * pos[..., None]
    n_pos = jnp.maximum(pos.sum(), 1).astype(cls_logits.dtype)
    cls_loss = _focal_bce(cls_logits, onehot, alpha, gamma).sum() / n_pos

    pred_boxes = decode_points(points[None], dists)
    tgt_boxes = decode_points(points[None], d_tgt)
    giou = box_ops.aligned_giou(pred_boxes, tgt_boxes)
    reg_loss = jnp.where(pos, 1.0 - giou, 0.0).sum() / n_pos

    ctr_ce = jnp.maximum(ctr_logits, 0) - ctr_logits * ctr_tgt \
        + jnp.log1p(jnp.exp(-jnp.abs(ctr_logits)))
    ctr_loss = jnp.where(pos, ctr_ce, 0.0).sum() / n_pos

    loss = cls_loss + reg_weight * reg_loss + ctr_loss
    return loss, {"cls_loss": cls_loss, "reg_loss": reg_loss,
                  "ctr_loss": ctr_loss, "n_pos": pos.sum()}


# -------------------------------------------------------------------- step


def make_fcos_step(net: Transformed, opt: Optimizer,
                   points: jax.Array, ranges: jax.Array,
                   num_classes: int, *,
                   augment: DetAugment | None = None,
                   alpha: float = 0.25, gamma: float = 2.0,
                   reg_weight: float = 1.0) -> Callable:
    """One fused anchor-free step:
    (state, (images, gt_boxes, gt_labels)) -> (state, metrics)."""

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        aug_key, model_key = jax.random.split(key)
        if augment is not None:
            images, gt_boxes, gt_labels = augment_detection_batch(
                images, gt_boxes, gt_labels, aug_key, augment)

        def objective(params):
            (cls_logits, ctr_logits, dists), new_state = net.apply(
                params, state.state, model_key, images, num_classes,
                train=True)
            loss, metrics = fcos_loss(
                cls_logits, ctr_logits, dists, points, ranges,
                gt_boxes, gt_labels, alpha=alpha, gamma=gamma,
                reg_weight=reg_weight)
            return loss, (new_state, {"loss": loss, **metrics})

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step


# ------------------------------------------------------------- postprocess


def make_fcos_postprocess(points: jax.Array, num_classes: int, *,
                          score_threshold: float = 0.05,
                          iou_threshold: float = 0.45,
                          max_detections: int = 100,
                          pre_nms_topk: int = 1000) -> Callable:
    """Jittable (cls_logits [B,L,C-1], ctr_logits [B,L], dists
    [B,L,4]) -> the padded (boxes, scores, labels, valid) contract.
    Scores are sqrt(sigmoid(cls) * sigmoid(ctr)) — the paper's
    centerness-weighted ranking."""

    def postprocess(cls_logits, ctr_logits, dists):
        probs = jax.nn.sigmoid(cls_logits)
        ctr = jax.nn.sigmoid(ctr_logits)[..., None]
        scored = jnp.sqrt(jnp.clip(probs * ctr, 1e-12, 1.0))
        scores = scored.max(axis=-1)
        labels = scored.argmax(axis=-1) + 1
        boxes = jnp.clip(decode_points(points[None], dists), 0.0, 1.0)
        if pre_nms_topk and pre_nms_topk < scores.shape[1]:
            scores, idx = jax.lax.top_k(scores, pre_nms_topk)
            boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
            labels = jnp.take_along_axis(labels, idx, axis=1)

        def one(b, s, l):
            sel, valid = box_ops.batched_nms(
                b, s, l, iou_threshold=iou_threshold,
                max_out=max_detections, score_threshold=score_threshold)
            oh = jax.nn.one_hot(sel, b.shape[0], dtype=b.dtype)
            pick = lambda m, v: jnp.einsum(  # noqa: E731
                "da,a...->d...", m, v, precision="highest")
            return (pick(oh, b), pick(oh, s),
                    pick(oh, l.astype(b.dtype)).astype(jnp.int32),
                    valid)

        return jax.vmap(one)(boxes, scores, labels)

    return postprocess
