"""Faster R-CNN training + eval: losses, ONE fused step, postprocess.

Same discipline as train/detection.py (the single-shot family): the
uint8 batch normalizes/augments on-device inside the SAME XLA program
as the model and both losses; every shape is static.  The two stages
train jointly (the paper's "approximate joint" scheme — proposals are
stop_gradient'ed in the model, so RPN gradients come only from its own
objectness/box losses).

Losses follow the torchvision normalization conventions:
* RPN: 256 sampled anchors/image (<=50% foreground) via the same
  top-k-of-boosted-priorities trick as the RoI subsample; binary
  cross-entropy mean over sampled, smooth-L1 summed over foreground /
  num sampled.  Matching is train/detection.match_anchors_band with
  the RPN's 0.7/0.3 band.
* RoI head: softmax cross-entropy mean over sampled RoIs; smooth-L1 on
  the TARGET class's deltas, summed over foreground / num sampled.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.ops import boxes as box_ops
from myconvnet_tpu.train import detection as det_lib
from myconvnet_tpu.train.detection import (DetAugment, DetState,
                                           _smooth_l1,
                                           augment_detection_batch,
                                           match_anchors_band)
from myconvnet_tpu.train.optim import Optimizer

# ------------------------------------------------------------------ losses


def _bce_logits(z, y):
    """Numerically-stable sigmoid binary cross-entropy."""
    return jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))


def rpn_loss(key: jax.Array, rpn_logits: jax.Array, rpn_loc: jax.Array,
             gt_boxes: jax.Array, gt_labels: jax.Array,
             anchors: jax.Array, *, num_samples: int = 256,
             fg_fraction: float = 0.5, pos_iou: float = 0.7,
             neg_iou: float = 0.3
             ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """RPN objectness + box loss over a batch.

    rpn_logits [B,A], rpn_loc [B,A,4], gt_boxes [B,M,4], gt_labels
    [B,M] (-1 padding), anchors [A,4].
    """
    B = rpn_logits.shape[0]
    m_boxes, _, positive, ignore = jax.vmap(
        lambda b, l: match_anchors_band(anchors, b, l, pos_iou, neg_iou)
    )(gt_boxes, gt_labels)
    negative = ~positive & ~ignore

    def sample(k, fg, bg):
        rand = jax.random.uniform(k, fg.shape)
        n_fg_max = int(round(num_samples * fg_fraction))
        fg_rand = jnp.where(fg, rand, -jnp.inf)
        fg_rank = jnp.argsort(jnp.argsort(-fg_rand))
        prio = jnp.where(fg & (fg_rank < n_fg_max), rand + 2.0,
                         jnp.where(bg, rand, -jnp.inf))
        vals, sel = jax.lax.top_k(prio, num_samples)
        return sel, vals > -jnp.inf

    sel, sel_valid = jax.vmap(sample)(jax.random.split(key, B),
                                      positive, negative)

    take = lambda t: jnp.take_along_axis(t, sel, axis=1)  # noqa: E731
    z = take(rpn_logits)
    is_pos = take(positive) & sel_valid
    y = is_pos.astype(z.dtype)
    obj = jnp.where(sel_valid, _bce_logits(z, y), 0.0)
    n_sampled = jnp.maximum(sel_valid.sum(), 1).astype(z.dtype)
    obj_loss = obj.sum() / n_sampled

    targets = box_ops.encode_boxes(m_boxes, anchors[None],
                                   variances=(1.0, 1.0))
    t_sel = jnp.take_along_axis(targets, sel[..., None], axis=1)
    l_sel = jnp.take_along_axis(rpn_loc, sel[..., None], axis=1)
    reg = _smooth_l1(l_sel - jax.lax.stop_gradient(t_sel)).sum(-1)
    reg_loss = jnp.where(is_pos, reg, 0.0).sum() / n_sampled

    loss = obj_loss + reg_loss
    return loss, {"rpn_obj": obj_loss, "rpn_reg": reg_loss,
                  "rpn_pos": is_pos.sum()}


def roi_head_loss(roi_cls: jax.Array, roi_reg: jax.Array,
                  labels: jax.Array, targets: jax.Array,
                  pos: jax.Array, valid: jax.Array
                  ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Second-stage loss: roi_cls [B,S,C], roi_reg [B,S,C,4],
    labels/targets/pos/valid from the model's in-forward sampling."""
    ce = -jnp.take_along_axis(jax.nn.log_softmax(roi_cls),
                              labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1).astype(roi_cls.dtype)
    cls_loss = jnp.where(valid, ce, 0.0).sum() / n

    # deltas of the TARGET class only (per-class regression)
    reg_t = jnp.take_along_axis(
        roi_reg, labels[..., None, None].astype(jnp.int32)
        .repeat(4, axis=-1), axis=2)[:, :, 0]          # [B,S,4]
    reg = _smooth_l1(reg_t - jax.lax.stop_gradient(targets)).sum(-1)
    reg_loss = jnp.where(pos, reg, 0.0).sum() / n

    acc = jnp.where(valid, (roi_cls.argmax(-1) == labels), False)
    metrics = {"roi_cls": cls_loss, "roi_reg": reg_loss,
               "roi_acc": acc.sum() / n, "roi_pos": pos.sum()}
    return cls_loss + reg_loss, metrics

def mask_head_loss(mask_logits: jax.Array, mask_labels: jax.Array,
                   mask_valid: jax.Array, mask_targets: jax.Array
                   ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Mask R-CNN mask loss: binary cross-entropy on the TARGET class's
    channel only (He et al. 2017 — no inter-class mask competition),
    mean over pixels, mean over positive mask RoIs.

    mask_logits [B,Sm,p,p,F] (F = num_classes - 1, class c reads
    channel c-1), mask_labels [B,Sm] in 1..C-1 where valid,
    mask_valid [B,Sm], mask_targets [B,Sm,p,p] in [0,1].
    """
    ch = jnp.clip(mask_labels - 1, 0, mask_logits.shape[-1] - 1)
    z = jnp.take_along_axis(
        mask_logits, ch[:, :, None, None, None], axis=-1)[..., 0]
    bce = _bce_logits(z, jax.lax.stop_gradient(mask_targets))
    per_roi = bce.mean(axis=(-2, -1))                     # [B,Sm]
    n = jnp.maximum(mask_valid.sum(), 1).astype(z.dtype)
    loss = jnp.where(mask_valid, per_roi, 0.0).sum() / n
    return loss, {"mask_loss": loss, "mask_pos": mask_valid.sum()}

# -------------------------------------------------------------------- step


def make_rcnn_step(net: Transformed, opt: Optimizer,
                   rpn_anchors: jax.Array, num_classes: int, *,
                   augment: DetAugment | None = None,
                   rpn_pos_iou: float = 0.7, rpn_neg_iou: float = 0.3,
                   rpn_samples: int = 256) -> Callable:
    """One fused two-stage step:
    (state, (images, gt_boxes, gt_labels)) -> (state, metrics).

    ``net`` is a transform of models/faster_rcnn.* — its apply takes
    (x, num_classes, train=, gt_boxes=, gt_labels=) and returns
    FRCNNOut with the RoI targets sampled in-forward.
    """

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        aug_key, rpn_key, model_key = jax.random.split(key, 3)
        if augment is not None:
            images, gt_boxes, gt_labels = augment_detection_batch(
                images, gt_boxes, gt_labels, aug_key, augment)

        def objective(params):
            out, new_state = net.apply(
                params, state.state, model_key, images, num_classes,
                train=True, gt_boxes=gt_boxes, gt_labels=gt_labels)
            l_rpn, m_rpn = rpn_loss(
                rpn_key, out.rpn_logits, out.rpn_loc, gt_boxes,
                gt_labels, rpn_anchors, num_samples=rpn_samples,
                pos_iou=rpn_pos_iou, neg_iou=rpn_neg_iou)
            l_roi, m_roi = roi_head_loss(
                out.roi_cls, out.roi_reg, out.roi_labels,
                out.roi_targets, out.roi_pos, out.roi_valid)
            loss = l_rpn + l_roi
            metrics = {"loss": loss, **m_rpn, **m_roi}
            return loss, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step

# ------------------------------------------------------------ mask branch


def _augment_with_payload(images: jax.Array, boxes: jax.Array,
                          labels: jax.Array, payload, key: jax.Array,
                          cfg: DetAugment, flip_payload, what: str):
    """Shared flips-only augmentation chain for the R-CNN branches:
    photometric distortion + box-aware hflip + normalize, with a
    per-task ``flip_payload(flip_mask, payload)`` hook mirroring the
    extra target (instance map / keypoints) alongside the boxes.

    The window-warp/mosaic options are box-only transforms — they would
    need payload-aware warps, so they are rejected explicitly rather
    than silently desynchronizing boxes from the payload.
    """
    if cfg.has_geometry or cfg.mosaic_prob > 0.0:
        raise ValueError(f"expand/IoU-crop/mosaic are box-only; the "
                         f"{what} chain supports hflip + photometric "
                         "(set expand_prob=0, iou_crop=False, "
                         "mosaic_prob=0)")
    from myconvnet_tpu.data import augment as aug

    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    k_col, k_flip = jax.random.split(key)
    if cfg.has_photometric:
        x = aug.color_jitter(k_col, x, brightness=cfg.brightness,
                             contrast=cfg.contrast,
                             saturation=cfg.saturation, hue=cfg.hue)
    if cfg.hflip:
        flip = jax.random.bernoulli(k_flip, 0.5, (x.shape[0],))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        fboxes = jnp.stack([1.0 - boxes[..., 2], boxes[..., 1],
                            1.0 - boxes[..., 0], boxes[..., 3]],
                           axis=-1)
        boxes = jnp.where(flip[:, None, None], fboxes, boxes)
        payload = flip_payload(flip, payload)
    if cfg.mean is not None:
        x = (x - jnp.asarray(cfg.mean, x.dtype)) / jnp.asarray(
            cfg.std, x.dtype)
    return x, boxes, labels, payload


def augment_instance_batch(images: jax.Array, boxes: jax.Array,
                           labels: jax.Array, inst: jax.Array,
                           key: jax.Array, cfg: DetAugment):
    """Instance-segmentation augmentation: the detection chain with the
    instance-id map [B,H,W] carried through geometry (the Mask R-CNN
    paper's train-time augmentation is flips only)."""
    return _augment_with_payload(
        images, boxes, labels, inst, key, cfg,
        lambda flip, m: jnp.where(flip[:, None, None], m[:, :, ::-1], m),
        "instance-mask")


def make_mask_rcnn_step(net: Transformed, opt: Optimizer,
                        rpn_anchors: jax.Array, num_classes: int, *,
                        augment: DetAugment | None = None,
                        rpn_pos_iou: float = 0.7,
                        rpn_neg_iou: float = 0.3,
                        rpn_samples: int = 256) -> Callable:
    """One fused Mask R-CNN step:
    (state, (images, gt_boxes, gt_labels, gt_inst)) -> (state, metrics).

    ``gt_inst`` is the instance-id map [B,H,W] (0 background, gt row k
    stored as k+1 — subsets/voc.py instance sources).  Mask targets
    crop inside the program (ops/roi.crop_instance_masks) from the
    instances the in-forward RoI sampling matched; all three losses
    (RPN, box head, mask head) backprop in ONE XLA program.
    """
    from myconvnet_tpu.ops import roi as roi_ops

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels, gt_inst = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        aug_key, rpn_key, model_key = jax.random.split(key, 3)
        if augment is not None:
            images, gt_boxes, gt_labels, gt_inst = augment_instance_batch(
                images, gt_boxes, gt_labels, gt_inst, aug_key, augment)

        def objective(params):
            out, new_state = net.apply(
                params, state.state, model_key, images, num_classes,
                train=True, gt_boxes=gt_boxes, gt_labels=gt_labels)
            l_rpn, m_rpn = rpn_loss(
                rpn_key, out.rpn_logits, out.rpn_loc, gt_boxes,
                gt_labels, rpn_anchors, num_samples=rpn_samples,
                pos_iou=rpn_pos_iou, neg_iou=rpn_neg_iou)
            l_roi, m_roi = roi_head_loss(
                out.roi_cls, out.roi_reg, out.roi_labels,
                out.roi_targets, out.roi_pos, out.roi_valid)
            soft = roi_ops.crop_instance_masks(
                gt_inst, jax.lax.stop_gradient(out.mask_rois),
                out.mask_gt, out_size=out.mask_logits.shape[2])
            targets = (soft >= 0.5).astype(out.mask_logits.dtype)
            l_mask, m_mask = mask_head_loss(
                out.mask_logits, out.mask_labels, out.mask_valid,
                targets)
            loss = l_rpn + l_roi + l_mask
            metrics = {"loss": loss, **m_rpn, **m_roi, **m_mask}
            return loss, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step


# ---------------------------------------------------------- semantic branch


def semantic_loss(sem_logits: jax.Array, sem_labels: jax.Array,
                  ignore_label: int = 255
                  ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Panoptic FPN's semantic cross-entropy at the LOGITS' resolution:
    the full-res gt [B,H,W] int is nearest-subsampled to the semantic
    grid (cheaper than upsampling logits; same gradient signal at the
    1/8 scale the head predicts).  ``ignore_label`` pixels drop out.
    """
    B, h, w, S = sem_logits.shape
    H, W = sem_labels.shape[1:3]
    ry = (jnp.arange(h) * H) // h + H // (2 * h)
    rx = (jnp.arange(w) * W) // w + W // (2 * w)
    small = sem_labels[:, ry][:, :, rx]                    # [B,h,w]
    valid = small != ignore_label
    cls = jnp.clip(small, 0, S - 1)
    logz = jax.nn.log_softmax(sem_logits, axis=-1)
    oh = jax.nn.one_hot(cls, S, dtype=logz.dtype)
    ce = -jnp.einsum("bhwc,bhwc->bhw", oh, logz)
    n = jnp.maximum(valid.sum(), 1).astype(ce.dtype)
    loss = jnp.where(valid, ce, 0.0).sum() / n
    acc = jnp.where(valid, sem_logits.argmax(-1) == cls, False)
    return loss, {"sem_loss": loss, "sem_acc": acc.sum() / n}


def make_panoptic_step(net: Transformed, opt: Optimizer,
                       rpn_anchors: jax.Array, num_classes: int, *,
                       augment: DetAugment | None = None,
                       sem_weight: float = 0.5,
                       rpn_pos_iou: float = 0.7,
                       rpn_neg_iou: float = 0.3,
                       rpn_samples: int = 256) -> Callable:
    """One fused Panoptic FPN step: (state, (images, gt_boxes,
    gt_labels, gt_inst, gt_sem)) -> (state, metrics).

    ``gt_sem`` [B,H,W] int semantic classes (channel convention in
    models/panoptic.py; 255 = ignore).  The paper's joint objective:
    instance losses + ``sem_weight`` x semantic CE (lambda = 0.5), all
    four in ONE XLA program.
    """
    from myconvnet_tpu.ops import roi as roi_ops

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels, gt_inst, gt_sem = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        aug_key, rpn_key, model_key = jax.random.split(key, 3)
        if augment is not None:
            images, gt_boxes, gt_labels, (gt_inst, gt_sem) = \
                _augment_with_payload(
                    images, gt_boxes, gt_labels, (gt_inst, gt_sem),
                    aug_key, augment,
                    lambda flip, ms: tuple(
                        jnp.where(flip[:, None, None], m[:, :, ::-1], m)
                        for m in ms),
                    "panoptic")

        def objective(params):
            out, new_state = net.apply(
                params, state.state, model_key, images, num_classes,
                train=True, gt_boxes=gt_boxes, gt_labels=gt_labels)
            l_rpn, m_rpn = rpn_loss(
                rpn_key, out.rpn_logits, out.rpn_loc, gt_boxes,
                gt_labels, rpn_anchors, num_samples=rpn_samples,
                pos_iou=rpn_pos_iou, neg_iou=rpn_neg_iou)
            l_roi, m_roi = roi_head_loss(
                out.roi_cls, out.roi_reg, out.roi_labels,
                out.roi_targets, out.roi_pos, out.roi_valid)
            soft = roi_ops.crop_instance_masks(
                gt_inst, jax.lax.stop_gradient(out.mask_rois),
                out.mask_gt, out_size=out.mask_logits.shape[2])
            targets = (soft >= 0.5).astype(out.mask_logits.dtype)
            l_mask, m_mask = mask_head_loss(
                out.mask_logits, out.mask_labels, out.mask_valid,
                targets)
            l_sem, m_sem = semantic_loss(out.sem_logits, gt_sem)
            loss = l_rpn + l_roi + l_mask + sem_weight * l_sem
            metrics = {"loss": loss, **m_rpn, **m_roi, **m_mask,
                       **m_sem}
            return loss, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step


# ---------------------------------------------------------- keypoint branch


def keypoint_targets(gt_kps: jax.Array, rois: jax.Array,
                     kp_gt: jax.Array, heat_size: int
                     ) -> tuple[jax.Array, jax.Array]:
    """Grid targets for the keypoint head, pure arithmetic.

    gt_kps [B,M,K,3] (x, y in normalized image coords, visibility —
    COCO convention: 0 unlabeled, 1 occluded, 2 visible; >0 trains),
    rois [B,Sk,4], kp_gt [B,Sk] matched gt row -> (uv [B,Sk,K] int32
    flat grid index, valid [B,Sk,K] bool).  A keypoint is a target only
    if labeled AND inside its RoI (the paper drops outside keypoints).
    Row selection is a one-hot matmul — no gathers.
    """
    B, M = gt_kps.shape[:2]
    sel = jax.nn.one_hot(kp_gt, M, dtype=gt_kps.dtype)      # [B,Sk,M]
    kps = jnp.einsum("bsm,bmkc->bskc", sel, gt_kps)          # [B,Sk,K,3]
    x1, y1 = rois[..., 0], rois[..., 1]
    w = jnp.maximum(rois[..., 2] - x1, 1e-9)
    h = jnp.maximum(rois[..., 3] - y1, 1e-9)
    fx = (kps[..., 0] - x1[..., None]) / w[..., None]
    fy = (kps[..., 1] - y1[..., None]) / h[..., None]
    inside = (fx >= 0.0) & (fx < 1.0) & (fy >= 0.0) & (fy < 1.0)
    u = jnp.clip((fx * heat_size).astype(jnp.int32), 0, heat_size - 1)
    v = jnp.clip((fy * heat_size).astype(jnp.int32), 0, heat_size - 1)
    valid = inside & (kps[..., 2] > 0.0)
    return v * heat_size + u, valid


def keypoint_head_loss(kp_logits: jax.Array, uv: jax.Array,
                       kp_point_valid: jax.Array, kp_valid: jax.Array
                       ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Keypoint R-CNN loss: softmax cross-entropy over the p*p GRID
    POSITIONS, one distribution per keypoint channel (He et al. 2017),
    mean over visible keypoints of positive RoIs.

    kp_logits [B,Sk,p,p,K], uv [B,Sk,K] flat target index,
    kp_point_valid [B,Sk,K], kp_valid [B,Sk].
    """
    B, S, p, _, K = kp_logits.shape
    flat = kp_logits.reshape(B, S, p * p, K)
    logz = jax.nn.log_softmax(flat, axis=2)
    oh = jax.nn.one_hot(uv, p * p, dtype=logz.dtype)         # [B,Sk,K,pp]
    ce = -jnp.einsum("bskp,bspk->bsk", oh, logz)
    valid = kp_point_valid & kp_valid[..., None]
    n = jnp.maximum(valid.sum(), 1).astype(ce.dtype)
    loss = jnp.where(valid, ce, 0.0).sum() / n
    return loss, {"kp_loss": loss, "kp_vis": valid.sum()}


def augment_keypoint_batch(images: jax.Array, boxes: jax.Array,
                           labels: jax.Array, kps: jax.Array,
                           key: jax.Array, cfg: DetAugment,
                           flip_perm=None):
    """Keypoint augmentation: the detection chain with keypoints
    carried through geometry.  ``flip_perm`` is the left<->right
    channel permutation applied when an image flips (COCO_KP_FLIP_PERM
    for the 17-keypoint person skeleton); identity when None —
    correct only for skeletons with no left/right pairs."""

    def flip_kps(flip, kp):
        fkps = jnp.stack([1.0 - kp[..., 0], kp[..., 1], kp[..., 2]],
                         axis=-1)
        if flip_perm is not None:
            fkps = fkps[:, :, jnp.asarray(flip_perm)]
        return jnp.where(flip[:, None, None, None], fkps, kp)

    return _augment_with_payload(images, boxes, labels, kps, key, cfg,
                                 flip_kps, "keypoint")


def make_keypoint_rcnn_step(net: Transformed, opt: Optimizer,
                            rpn_anchors: jax.Array, num_classes: int, *,
                            augment: DetAugment | None = None,
                            flip_perm=None, rpn_pos_iou: float = 0.7,
                            rpn_neg_iou: float = 0.3,
                            rpn_samples: int = 256) -> Callable:
    """One fused Keypoint R-CNN step:
    (state, (images, gt_boxes, gt_labels, gt_kps)) -> (state, metrics).

    ``gt_kps`` [B,M,K,3] normalized (x, y, visibility) rows aligned
    with gt_boxes.  All three losses (RPN, box head, keypoint head)
    backprop in ONE XLA program; keypoint grid targets are computed
    in-program from the RoIs the in-forward sampling matched.
    """

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels, gt_kps = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        aug_key, rpn_key, model_key = jax.random.split(key, 3)
        if augment is not None:
            images, gt_boxes, gt_labels, gt_kps = augment_keypoint_batch(
                images, gt_boxes, gt_labels, gt_kps, aug_key, augment,
                flip_perm=flip_perm)

        def objective(params):
            out, new_state = net.apply(
                params, state.state, model_key, images, num_classes,
                train=True, gt_boxes=gt_boxes, gt_labels=gt_labels)
            l_rpn, m_rpn = rpn_loss(
                rpn_key, out.rpn_logits, out.rpn_loc, gt_boxes,
                gt_labels, rpn_anchors, num_samples=rpn_samples,
                pos_iou=rpn_pos_iou, neg_iou=rpn_neg_iou)
            l_roi, m_roi = roi_head_loss(
                out.roi_cls, out.roi_reg, out.roi_labels,
                out.roi_targets, out.roi_pos, out.roi_valid)
            uv, pt_valid = keypoint_targets(
                gt_kps, jax.lax.stop_gradient(out.kp_rois), out.kp_gt,
                out.kp_logits.shape[2])
            l_kp, m_kp = keypoint_head_loss(out.kp_logits, uv, pt_valid,
                                            out.kp_valid)
            loss = l_rpn + l_roi + l_kp
            metrics = {"loss": loss, **m_rpn, **m_roi, **m_kp}
            return loss, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step


def decode_keypoints(kp_logits: jax.Array, boxes: jax.Array
                     ) -> jax.Array:
    """Heatmap logits [B,D,p,p,K] + boxes [B,D,4] -> keypoints
    [B,D,K,3] (x, y in normalized image coords, confidence = softmax
    peak probability).  Argmax decode — the paper's inference rule —
    as pure arithmetic (argmax + index math, no gathers)."""
    B, D, p, _, K = kp_logits.shape
    flat = kp_logits.reshape(B, D, p * p, K)
    probs = jax.nn.softmax(flat, axis=2)
    idx = jnp.argmax(flat, axis=2)                           # [B,D,K]
    conf = jnp.max(probs, axis=2)
    u = (idx % p).astype(jnp.float32) + 0.5
    v = (idx // p).astype(jnp.float32) + 0.5
    x1, y1 = boxes[..., 0], boxes[..., 1]
    w = jnp.maximum(boxes[..., 2] - x1, 1e-9)
    h = jnp.maximum(boxes[..., 3] - y1, 1e-9)
    kx = x1[..., None] + u / p * w[..., None]
    ky = y1[..., None] + v / p * h[..., None]
    return jnp.stack([kx, ky, conf], axis=-1)


def make_mask_predict(net: Transformed, num_classes: int) -> Callable:
    """Jittable detection-time mask pass: (params, state, key, images,
    det_boxes [B,D,4], det_labels [B,D]) -> masks [B,D,p,p] in [0,1]
    — the model's ``mask_rois=`` mode on the POST-NMS boxes, reading
    each detection's own class channel.  Paste to the frame with
    ops/roi.paste_masks."""

    def predict(params, state, key, images, det_boxes, det_labels):
        logits, _ = net.apply(params, state, key, images, num_classes,
                              mask_rois=det_boxes)
        ch = jnp.clip(det_labels.astype(jnp.int32) - 1, 0,
                      logits.shape[-1] - 1)
        z = jnp.take_along_axis(
            logits, ch[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(z)

    return predict

# ------------------------------------------------------------- postprocess


def make_rcnn_postprocess(num_classes: int, *,
                          score_threshold: float = 0.05,
                          iou_threshold: float = 0.5,
                          max_detections: int = 100,
                          pre_nms_topk: int = 1000) -> Callable:
    """Jittable FRCNNOut (eval mode) -> (boxes [B,D,4], scores [B,D],
    labels [B,D], valid [B,D]) — the same contract as
    train.detection.make_postprocess, so every evaluator, TTA merge and
    serving surface downstream works unchanged.

    Per image: softmax over the head, per-class decode against the
    proposals, flatten [S, C-1] candidates, top-k, class-aware NMS.
    """

    def postprocess(out):
        rois, roi_valid = out.rois, out.roi_valid
        probs = jax.nn.softmax(out.roi_cls, axis=-1)[..., 1:]  # [B,S,F]
        deltas = out.roi_reg[..., 1:, :]                       # [B,S,F,4]
        boxes = box_ops.decode_boxes(deltas, rois[:, :, None, :])
        boxes = jnp.clip(boxes, 0.0, 1.0)
        B, S, F = probs.shape
        scores = jnp.where(roi_valid[..., None], probs, 0.0)
        flat_scores = scores.reshape(B, S * F)
        flat_boxes = boxes.reshape(B, S * F, 4)
        flat_labels = jnp.broadcast_to(
            jnp.arange(1, F + 1, dtype=jnp.int32)[None, None, :],
            (B, S, F)).reshape(B, S * F)
        k = min(pre_nms_topk, S * F)
        top_scores, idx = jax.lax.top_k(flat_scores, k)
        top_boxes = jnp.take_along_axis(flat_boxes, idx[..., None],
                                        axis=1)
        top_labels = jnp.take_along_axis(flat_labels, idx, axis=1)

        def one(b, s, l):
            sel, valid = box_ops.batched_nms(
                b, s, l, iou_threshold=iou_threshold,
                max_out=max_detections, score_threshold=score_threshold)
            oh = jax.nn.one_hot(sel, b.shape[0], dtype=b.dtype)
            pick = lambda m, v: jnp.einsum(  # noqa: E731
                "da,a...->d...", m, v, precision="highest")
            return (pick(oh, b), pick(oh, s),
                    pick(oh, l.astype(b.dtype)).astype(jnp.int32), valid)

        return jax.vmap(one)(top_boxes, top_scores, top_labels)

    return postprocess
