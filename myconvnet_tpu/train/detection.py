"""Detection training: anchor matching, multibox loss, one fused step.

Beyond the reference inventory (SURVEY.md §2 has no detection family) —
the fourth task family, built the same way as the GAN path
(train/gan.py): a self-contained state NamedTuple + ONE jitted step
program containing matching, loss, backward, and the optimizer update.

TPU formulation notes:
* Ground truth arrives PADDED to a fixed ``max_boxes`` per image
  (label column == -1 marks padding) so every step has static shapes.
* Anchor matching is gather-free: the per-anchor best ground-truth row
  is materialized with a one-hot [A, M] matmul (M <= 64 — the matmul is
  noise next to the backbone), and the SSD "force-match the best anchor
  of every gt" rule is a broadcasted [M, A] compare + argmax, not a
  scatter.
* Hard-negative mining (3:1 neg:pos, per image) needs top-k with a
  *data-dependent* k — done branch-free via the double-argsort rank
  trick: rank = argsort(argsort(-loss)); keep rank < k.  Shapes stay
  static; only values depend on data.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.ops import boxes as box_ops
from myconvnet_tpu.train.optim import Optimizer


def match_anchors(anchors: jax.Array, gt_boxes: jax.Array,
                  gt_labels: jax.Array, iou_threshold: float = 0.5
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SSD matching for ONE image.

    anchors [A, 4]; gt_boxes [M, 4]; gt_labels [M] int with -1 padding.
    Returns (matched_boxes [A, 4], matched_labels [A] — 0 is background,
    positives) where positives = IoU >= threshold, plus every gt's
    single best anchor (so no ground truth goes unmatched).

    The degenerate band [t, t) makes this :func:`match_anchors_band`
    with an empty ignore zone — one matching implementation serves both
    detector families.
    """
    mb, ml, pos, _ = match_anchors_band(anchors, gt_boxes, gt_labels,
                                        iou_threshold, iou_threshold)
    return mb, ml, pos


def _smooth_l1(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_loss(cls_logits: jax.Array, loc: jax.Array,
                  gt_boxes: jax.Array, gt_labels: jax.Array,
                  anchors: jax.Array, *, iou_threshold: float = 0.5,
                  neg_pos_ratio: float = 3.0
                  ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """SSD loss over a batch.

    cls_logits [B, A, C] (class 0 = background), loc [B, A, 4],
    gt_boxes [B, M, 4], gt_labels [B, M] (-1 padding), anchors [A, 4].
    Computed in f32 regardless of the model policy — the class term
    sums tens of thousands of per-anchor values, which loses bf16
    mantissa (the FCOS bf16 recipe measurably diverged from this).
    Returns (scalar loss, metrics).  Normalized by the number of
    positive anchors, per the paper.
    """
    cls_logits = cls_logits.astype(jnp.float32)
    loc = loc.astype(jnp.float32)
    m_boxes, m_labels, positive = jax.vmap(
        lambda b, l: match_anchors(anchors, b, l, iou_threshold)
    )(gt_boxes, gt_labels)  # [B,A,4], [B,A], [B,A]

    loc_t = box_ops.encode_boxes(m_boxes, anchors[None])
    loc_err = _smooth_l1(loc - jax.lax.stop_gradient(loc_t)).sum(-1)
    loc_loss = jnp.where(positive, loc_err, 0.0).sum()

    ce = -jnp.take_along_axis(jax.nn.log_softmax(cls_logits),
                              m_labels[..., None], axis=-1)[..., 0]
    pos_ce = jnp.where(positive, ce, 0.0).sum()
    # hard-negative mining, per image: keep the top (ratio * n_pos)
    # background anchors by loss.  double-argsort rank, static shapes.
    neg_ce = jnp.where(positive, -jnp.inf, ce)  # [B, A]
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank 0 = hardest negative
    n_pos = positive.sum(axis=1, keepdims=True)  # [B, 1]
    n_neg = jnp.minimum((neg_pos_ratio * n_pos).astype(jnp.int32),
                        (~positive).sum(axis=1, keepdims=True))
    mined = (rank < n_neg) & ~positive
    neg_loss = jnp.where(mined, ce, 0.0).sum()

    denom = jnp.maximum(n_pos.sum(), 1).astype(cls_logits.dtype)
    loss = (loc_loss + pos_ce + neg_loss) / denom
    metrics = {"loss": loss, "loc_loss": loc_loss / denom,
               "cls_loss": (pos_ce + neg_loss) / denom,
               "n_pos": n_pos.sum()}
    return loss, metrics


def match_anchors_band(anchors: jax.Array, gt_boxes: jax.Array,
                       gt_labels: jax.Array, pos_threshold: float = 0.5,
                       neg_threshold: float = 0.4
                       ) -> tuple[jax.Array, jax.Array, jax.Array,
                                  jax.Array]:
    """RetinaNet matching for ONE image: like :func:`match_anchors` but
    with an ignore band — anchors whose best IoU lands in
    [neg_threshold, pos_threshold) are neither positive nor negative and
    must not contribute classification loss.

    Returns (matched_boxes [A,4], matched_labels [A], positive [A],
    ignore [A]).
    """
    valid = gt_labels >= 0
    iou = box_ops.box_iou(anchors, gt_boxes)  # [A, M]
    iou = jnp.where(valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    best_anchor = jnp.argmax(iou, axis=0)  # [M]
    a_range = jnp.arange(anchors.shape[0])
    forced_oh = (best_anchor[:, None] == a_range[None, :]) & valid[:, None]
    forced = forced_oh.any(axis=0)
    forced_gt = jnp.argmax(forced_oh, axis=0)
    positive = (best_iou >= pos_threshold) | forced
    ignore = (best_iou >= neg_threshold) & ~positive
    gt_idx = jnp.where(forced, forced_gt, best_gt)
    one_hot = jax.nn.one_hot(gt_idx, gt_boxes.shape[0],
                             dtype=gt_boxes.dtype)
    # true-f32 row selection: these matmuls carry box COORDINATES, and
    # some backends lower default-precision f32 dots through bf16
    # passes — which rounds the regression targets to ~3 digits and
    # makes numerics depend on fusion layout (sharded vs unsharded
    # programs then disagree at 1e-4)
    matched_boxes = jnp.einsum("am,mk->ak", one_hot, gt_boxes,
                               precision="highest")
    labels_f = jnp.maximum(gt_labels, 0).astype(gt_boxes.dtype)
    matched_labels = jnp.where(
        positive,
        jnp.einsum("am,m->a", one_hot, labels_f,
                   precision="highest").astype(jnp.int32), 0)
    return matched_boxes, matched_labels, positive, ignore


def focal_det_loss(cls_logits: jax.Array, loc: jax.Array,
                   gt_boxes: jax.Array, gt_labels: jax.Array,
                   anchors: jax.Array, *, alpha: float = 0.25,
                   gamma: float = 2.0, pos_threshold: float = 0.5,
                   neg_threshold: float = 0.4,
                   loc_loss_kind: str = "smooth_l1",
                   giou_weight: float = 2.0
                   ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """RetinaNet loss (Lin et al. 2017): sigmoid focal classification
    over FOREGROUND classes + box regression on positives.

    cls_logits [B, A, C-1] — per-foreground-class sigmoid logits, NO
    background column (background = all-zero targets); gt id space is
    still 1..C-1.  Focal loss needs no hard-negative mining — that is
    its point — so every non-ignored anchor contributes.  Normalized by
    the number of positive anchors.

    ``loc_loss_kind``: "smooth_l1" on encoded deltas (the paper), or
    "giou" — ``giou_weight * (1 - GIoU)`` on DECODED boxes
    (ops.boxes.aligned_giou; the modern choice — scale-invariant, and
    the gradient survives disjoint predictions).
    """
    # f32 for the same reason as multibox_loss: the focal term sums
    # A x (C-1) (up to ~1M) values — bf16 accumulation loses mantissa
    cls_logits = cls_logits.astype(jnp.float32)
    loc = loc.astype(jnp.float32)
    m_boxes, m_labels, positive, ignore = jax.vmap(
        lambda b, l: match_anchors_band(anchors, b, l, pos_threshold,
                                        neg_threshold))(gt_boxes, gt_labels)

    if loc_loss_kind == "giou":
        # double-where guard: decode applies exp() to every anchor's
        # deltas BEFORE the positive mask, and grad(where(mask, f, 0))
        # propagates 0 * inf = NaN from masked-out anchors — so mask
        # (and clamp) the inputs first, not just the output
        safe_loc = jnp.where(positive[..., None],
                             jnp.clip(loc, -40.0, 40.0), 0.0)
        pred = box_ops.decode_boxes(safe_loc, anchors[None])
        loc_err = giou_weight * (1.0 - box_ops.aligned_giou(
            pred, jax.lax.stop_gradient(m_boxes)))
    elif loc_loss_kind == "smooth_l1":
        loc_t = box_ops.encode_boxes(m_boxes, anchors[None])
        loc_err = _smooth_l1(loc - jax.lax.stop_gradient(loc_t)).sum(-1)
    else:
        raise ValueError(f"unknown loc_loss_kind {loc_loss_kind!r}")
    loc_loss = jnp.where(positive, loc_err, 0.0).sum()

    k = cls_logits.shape[-1]
    # targets: one-hot over foreground classes for positives, zeros else
    targets = jnp.where(positive[..., None],
                        jax.nn.one_hot(m_labels - 1, k,
                                       dtype=cls_logits.dtype), 0.0)
    p = jax.nn.sigmoid(cls_logits)
    # numerically-stable BCE with logits
    bce = jnp.maximum(cls_logits, 0.0) - cls_logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    focal = alpha_t * (1.0 - p_t) ** gamma * bce  # [B, A, K]
    cls_loss = jnp.where(ignore[..., None], 0.0, focal).sum()

    n_pos = positive.sum()
    denom = jnp.maximum(n_pos, 1).astype(cls_logits.dtype)
    loss = (cls_loss + loc_loss) / denom
    metrics = {"loss": loss, "loc_loss": loc_loss / denom,
               "cls_loss": cls_loss / denom, "n_pos": n_pos}
    return loss, metrics


def _hflip_batch(key: jax.Array, x: jax.Array, boxes: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """Per-image random horizontal flip of pixels AND boxes together
    (x1' = 1-x2, x2' = 1-x1; padded all-zero rows become (1,0,1,0)
    degenerate boxes, which stay inert — their label is -1 and the
    matchers mask on labels, not geometry).  Branch-free: where(), not
    cond."""
    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    flipped = jnp.stack([1.0 - boxes[..., 2], boxes[..., 1],
                         1.0 - boxes[..., 0], boxes[..., 3]], axis=-1)
    boxes = jnp.where(flip[:, None, None], flipped, boxes)
    return x, boxes


def preprocess_batch(images: jax.Array, boxes: jax.Array,
                     key: jax.Array | None, *,
                     mean: tuple | None = None, std: tuple | None = None,
                     hflip: bool = False) -> tuple[jax.Array, jax.Array]:
    """On-device detection preprocessing (the framework's augmentation
    stance — data/pipeline.py ships uint8, the step owns the math).

    uint8 [B,H,W,3] -> normalized float; optional box-aware random
    horizontal flip (:func:`_hflip_batch`).
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    if mean is not None:
        x = (x - jnp.asarray(mean, x.dtype)) / jnp.asarray(std, x.dtype)
    if hflip and key is not None:
        x, boxes = _hflip_batch(key, x, boxes)
    return x, boxes


class DetAugment(NamedTuple):
    """On-device SSD augmentation policy (Liu et al. 2016 §2.2 "data
    augmentation", torchvision option-menu semantics).

    Zoom-out (random expand) and zoom-in (IoU-constrained crop) compose
    into ONE per-image sampling window in original-image coordinates —
    possibly extending outside the frame — applied by the framework's
    gather-free matmul warp (data/augment.batched_crop_resize) with the
    dataset mean filling out-of-frame samples.  Everything is
    static-shape and branch-free: candidate patches are scored in
    parallel and the first acceptable one is selected with a one-hot
    matmul, with the whole (expanded) canvas as the fallback.
    """
    hflip: bool = True
    # 4-image mosaic (YOLO-style, :func:`mosaic_batch`) applied FIRST;
    # grows the target axis to 4*max_boxes
    mosaic_prob: float = 0.0
    # zoom-out: with prob expand_prob place the image on a canvas of
    # ratio r ~ U[1, expand_max] at a uniform offset, mean-filled
    expand_prob: float = 0.0
    expand_max: float = 4.0
    # zoom-in: per image pick uniformly from {keep} + iou_menu; for a
    # threshold t, sample crop_candidates patches and take the first
    # whose best-gt IoU >= t AND which contains >= 1 gt center
    iou_crop: bool = False
    iou_menu: tuple = (0.0, 0.1, 0.3, 0.5, 0.7, 0.9)
    crop_candidates: int = 8
    scale_range: tuple = (0.3, 1.0)
    aspect_range: tuple = (0.5, 2.0)
    # photometric distortion (data/augment.color_jitter conventions)
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    mean: tuple | None = None
    std: tuple | None = None

    @property
    def has_geometry(self) -> bool:
        return self.expand_prob > 0.0 or self.iou_crop

    @property
    def has_photometric(self) -> bool:
        return (self.brightness > 0.0 or self.contrast > 0.0
                or self.saturation > 0.0 or self.hue > 0.0)


def sample_detection_windows(key: jax.Array, gt_boxes: jax.Array,
                             gt_labels: jax.Array, cfg: DetAugment
                             ) -> jax.Array:
    """Draw one sampling window per image -> [B, 4] xyxy in normalized
    original-image coordinates (may extend outside [0, 1]).

    expand-only images get the canvas window; iou-crop images get the
    first of ``crop_candidates`` random patches (of the canvas) passing
    the per-image IoU threshold + center containment + aspect limits,
    falling back to the full canvas when none passes (the paper's
    max-trials fallback).
    """
    b, m = gt_labels.shape
    k_exp, k_r, k_off, k_opt, k_wh, k_xy = jax.random.split(key, 6)

    # ---- zoom-out canvas: ratio r, image offset (a, b) in [0, r-1]
    if cfg.expand_prob > 0.0:
        do_exp = jax.random.bernoulli(k_exp, cfg.expand_prob, (b,))
        r = jnp.where(do_exp,
                      jax.random.uniform(k_r, (b,), minval=1.0,
                                         maxval=cfg.expand_max), 1.0)
        off = jax.random.uniform(k_off, (b, 2)) * (r[:, None] - 1.0)
    else:
        r = jnp.ones((b,))
        off = jnp.zeros((b, 2))
    off4 = jnp.concatenate([off, off], axis=-1)  # (ax, ay, ax, ay)
    canvas = jnp.concatenate([-off, r[:, None] - off], axis=-1)  # [B,4]

    if not cfg.iou_crop:
        return canvas

    # ---- zoom-in: candidate patches in canvas-normalized coordinates
    k = cfg.crop_candidates
    menu = jnp.asarray(cfg.iou_menu, jnp.float32)
    opt = jax.random.randint(k_opt, (b,), 0, len(cfg.iou_menu) + 1)
    thresh = menu[jnp.maximum(opt - 1, 0)]  # [B]
    lo, hi = cfg.scale_range
    wh = jax.random.uniform(k_wh, (b, k, 2), minval=lo, maxval=hi)
    aspect = wh[..., 0] / wh[..., 1]
    aspect_ok = ((aspect >= cfg.aspect_range[0])
                 & (aspect <= cfg.aspect_range[1]))  # [B,K]
    xy0 = jax.random.uniform(k_xy, (b, k, 2)) * (1.0 - wh)
    patch = jnp.concatenate([xy0, xy0 + wh], axis=-1)  # [B,K,4]

    # ground truth in canvas coordinates
    valid = gt_labels >= 0  # [B,M]
    gtc = (gt_boxes + off4[:, None, :]) / r[:, None, None]
    iou = jax.vmap(box_ops.box_iou)(patch, gtc)  # [B,K,M]
    best_iou = jnp.where(valid[:, None, :], iou, -1.0).max(-1)  # [B,K]
    centers = 0.5 * (gtc[..., :2] + gtc[..., 2:])  # [B,M,2]
    inside = ((centers[:, None, :, :] > patch[:, :, None, :2])
              & (centers[:, None, :, :] < patch[:, :, None, 2:])
              ).all(-1)  # [B,K,M]
    has_center = (inside & valid[:, None, :]).any(-1)  # [B,K]
    ok = aspect_ok & (best_iou >= thresh[:, None]) & has_center
    first = jnp.argmax(ok, axis=1)  # first True (argmax of bools)
    oh = jax.nn.one_hot(first, k, dtype=patch.dtype)  # [B,K]
    chosen = jnp.einsum("bk,bkc->bc", oh, patch)
    use_patch = (opt > 0) & ok.any(axis=1)
    full = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    patch = jnp.where(use_patch[:, None], chosen, full[None, :])
    # compose patch-of-canvas with the canvas window -> image coords
    return patch * r[:, None] - off4


def apply_detection_window(images01: jax.Array, boxes: jax.Array,
                           labels: jax.Array, window: jax.Array,
                           fill) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Resample each [0,1]-float image to its window (out-of-frame reads
    ``fill``) and move the boxes into window coordinates.

    A ground truth survives iff its center lies strictly inside the
    window (the paper's keep rule); surviving boxes are clipped to the
    window, dropped ones get label -1 (shapes stay static).
    """
    from myconvnet_tpu.data.augment import batched_crop_resize

    bsz, h, w, _ = images01.shape
    wx0, wy0, wx1, wy1 = (window[:, i] for i in range(4))
    crop = jnp.stack([wy0 * h, wx0 * w, (wy1 - wy0) * h,
                      (wx1 - wx0) * w], axis=1)
    out = batched_crop_resize(images01, crop, (h, w),
                              fill=jnp.asarray(fill, jnp.float32))
    origin = jnp.stack([wx0, wy0, wx0, wy0], axis=1)[:, None, :]
    size = jnp.stack([wx1 - wx0, wy1 - wy0], axis=1)
    size = jnp.concatenate([size, size], axis=1)[:, None, :]
    new_boxes = (boxes - origin) / jnp.maximum(size, 1e-9)
    centers = 0.5 * (new_boxes[..., :2] + new_boxes[..., 2:])
    inside = ((centers > 0.0) & (centers < 1.0)).all(-1)  # [B,M]
    new_labels = jnp.where(inside & (labels >= 0), labels, -1)
    return out, jnp.clip(new_boxes, 0.0, 1.0), new_labels


def augment_detection_batch(images: jax.Array, boxes: jax.Array,
                            labels: jax.Array, key: jax.Array,
                            cfg: DetAugment
                            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full on-device SSD train-time chain: uint8 -> [0,1] float ->
    expand/IoU-crop window warp -> photometric distortion -> box-aware
    hflip -> per-channel normalize.  One traced program, no host work.
    """
    from myconvnet_tpu.data import augment as aug

    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    k_mos, k_geo, k_col, k_flip = jax.random.split(key, 4)
    if cfg.mosaic_prob > 0.0:
        x, boxes, labels = mosaic_batch(k_mos, x, boxes, labels,
                                        cfg.mosaic_prob)
    if cfg.has_geometry:
        window = sample_detection_windows(k_geo, boxes, labels, cfg)
        fill = cfg.mean if cfg.mean is not None else (0.5, 0.5, 0.5)
        x, boxes, labels = apply_detection_window(x, boxes, labels,
                                                  window, fill)
    if cfg.has_photometric:
        x = aug.color_jitter(k_col, x, brightness=cfg.brightness,
                             contrast=cfg.contrast,
                             saturation=cfg.saturation, hue=cfg.hue)
    if cfg.hflip:
        x, boxes = _hflip_batch(k_flip, x, boxes)
    if cfg.mean is not None:
        x = (x - jnp.asarray(cfg.mean, x.dtype)) / jnp.asarray(
            cfg.std, x.dtype)
    return x, boxes, labels


def mosaic_batch(key: jax.Array, images01: jax.Array, boxes: jax.Array,
                 labels: jax.Array, prob: float = 1.0
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """YOLO-style 4-image mosaic, TPU-formulated (static shapes).

    Each output image composites four batch neighbors (batch rolls — no
    gathers) into quadrants split at a random center (cx, cy) ~
    U[0.25, 0.75]²: every quadrant is the full source image warped into
    it by the gather-free matmul resampler (out-of-quadrant rows are
    masked, so the four warps sum disjointly).  Boxes map affinely into
    their quadrant; the target axis grows to 4M so every source object
    survives (padding label -1 as usual).  With probability ``1 -
    prob`` per image the original image/boxes pass through in the
    first M slots.

    images01 [B,H,W,3] float in [0,1] -> (images [B,H,W,3],
    boxes [B,4M,4], labels [B,4M]).
    """
    from myconvnet_tpu.data.augment import _axis_matrix

    b, h, w, _ = images01.shape
    m = boxes.shape[1]
    k_c, k_p = jax.random.split(key)
    c = jax.random.uniform(k_c, (b, 2), minval=0.25, maxval=0.75)
    cx, cy = c[:, 0], c[:, 1]
    use = jax.random.bernoulli(k_p, prob, (b,))

    srcs = [(jnp.roll(images01, -q, axis=0), jnp.roll(boxes, -q, axis=0),
             jnp.roll(labels, -q, axis=0)) for q in range(4)]

    xg = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w  # [W]
    yg = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h  # [H]
    out = jnp.zeros_like(images01)
    out_boxes, out_labels = [], []
    for q, (img, bx, lb) in enumerate(srcs):
        left = q % 2 == 0     # TL, BL fill x in [0, cx)
        top = q < 2           # TL, TR fill y in [0, cy)
        # horizontal span of the quadrant in output coords
        fx0 = jnp.zeros_like(cx) if left else cx
        fx1 = cx if left else jnp.ones_like(cx)
        fy0 = jnp.zeros_like(cy) if top else cy
        fy1 = cy if top else jnp.ones_like(cy)
        # warp the FULL source into that span: output pixel x maps to
        # source coord (x - fx0) / (fx1 - fx0); as an _axis_matrix
        # (start, extent) pair over the whole output axis this is
        # extent = W / span, start = -fx0 * extent
        ex = w / jnp.maximum(fx1 - fx0, 1e-6)
        ey = h / jnp.maximum(fy1 - fy0, 1e-6)
        mh = _axis_matrix(-fy0 * ey, ey, h, h, clamp=False)  # [B,H,H]
        mw = _axis_matrix(-fx0 * ex, ex, w, w, clamp=False)  # [B,W,W]
        warped = jnp.einsum("nih,nhwc->niwc", mh, img,
                            preferred_element_type=jnp.float32,
                            precision="highest")
        warped = jnp.einsum("njw,niwc->nijc", mw, warped,
                            preferred_element_type=jnp.float32,
                            precision="highest")
        mask = ((xg[None, :] >= fx0[:, None])
                & (xg[None, :] < fx1[:, None]))[:, None, :] \
            & ((yg[None, :] >= fy0[:, None])
               & (yg[None, :] < fy1[:, None]))[:, :, None]  # [B,H,W]
        out = out + warped * mask[..., None]
        # boxes: affine into the quadrant
        sx = (fx1 - fx0)[:, None]
        sy = (fy1 - fy0)[:, None]
        nb = jnp.stack([fx0[:, None] + bx[..., 0] * sx,
                        fy0[:, None] + bx[..., 1] * sy,
                        fx0[:, None] + bx[..., 2] * sx,
                        fy0[:, None] + bx[..., 3] * sy], axis=-1)
        out_boxes.append(nb)
        out_labels.append(lb)
    mos_boxes = jnp.concatenate(out_boxes, axis=1)    # [B, 4M, 4]
    mos_labels = jnp.concatenate(out_labels, axis=1)  # [B, 4M]

    # pass-through slots for non-mosaic images: original boxes in the
    # first M rows, padding elsewhere
    pad_boxes = jnp.concatenate(
        [boxes, jnp.zeros((b, 3 * m, 4), boxes.dtype)], axis=1)
    pad_labels = jnp.concatenate(
        [labels, -jnp.ones((b, 3 * m), labels.dtype)], axis=1)
    images_out = jnp.where(use[:, None, None, None], out, images01)
    boxes_out = jnp.where(use[:, None, None], mos_boxes, pad_boxes)
    labels_out = jnp.where(use[:, None], mos_labels, pad_labels)
    return images_out, boxes_out, labels_out


class DetState(NamedTuple):
    params: Any
    state: Any
    opt: Any
    step: jax.Array
    rng: jax.Array  # key data


def init_det_state(net: Transformed, opt: Optimizer, rng: jax.Array,
                   sample_images: jax.Array, num_classes: int) -> DetState:
    params, state = net.init(rng, sample_images, num_classes, train=True)
    return DetState(params, state, opt.init(params),
                    jnp.zeros((), jnp.int32), jax.random.key_data(rng))


def make_detection_step(net: Transformed, opt: Optimizer,
                        anchors: jax.Array, num_classes: int, *,
                        iou_threshold: float = 0.5,
                        neg_pos_ratio: float = 3.0,
                        mean: tuple | None = None,
                        std: tuple | None = None,
                        hflip: bool = False,
                        augment: DetAugment | None = None,
                        loss_fn: Callable | None = None) -> Callable:
    """One fused detection step:
    (state, (images, gt_boxes, gt_labels)) -> (state, metrics).

    ``augment`` folds the full SSD chain (expand/IoU-crop/photometric/
    hflip/normalize — augment_detection_batch) into the program; the
    ``mean``/``std``/``hflip`` kwargs remain as the simple legacy subset
    and are ignored when ``augment`` is given.  Either way uint8
    pipeline batches normalize + augment on-device inside the same XLA
    program as the model (no extra dispatch, SURVEY.md §7).

    ``loss_fn(cls_logits, loc, gt_boxes, gt_labels, anchors) -> (loss,
    metrics)`` swaps the objective (default: SSD multibox; pass a
    :func:`focal_det_loss` closure for RetinaNet-style heads)."""
    if augment is None and (mean is not None or hflip):
        augment = DetAugment(hflip=hflip, mean=mean, std=std)
    if loss_fn is None:
        def loss_fn(cls_logits, loc, gt_b, gt_l, anc):
            return multibox_loss(cls_logits, loc, gt_b, gt_l, anc,
                                 iou_threshold=iou_threshold,
                                 neg_pos_ratio=neg_pos_ratio)

    def step(state: DetState, batch):
        images, gt_boxes, gt_labels = batch
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        if augment is not None:
            aug_key, key = jax.random.split(key)
            images, gt_boxes, gt_labels = augment_detection_batch(
                images, gt_boxes, gt_labels, aug_key, augment)

        def objective(params):
            (cls_logits, loc), new_state = net.apply(
                params, state.state, key, images, num_classes, train=True)
            loss, metrics = loss_fn(cls_logits, loc, gt_boxes, gt_labels,
                                    anchors)
            return loss, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        new_params, new_opt = opt.update(grads, state.opt, state.params,
                                         state.step)
        return DetState(new_params, new_state, new_opt, state.step + 1,
                        state.rng), metrics

    return step


def make_postprocess(anchors: jax.Array, num_classes: int, *,
                     score_threshold: float = 0.05,
                     iou_threshold: float = 0.45,
                     max_detections: int = 100,
                     score_activation: str = "softmax",
                     pre_nms_topk: int = 1000) -> Callable:
    """Jittable (cls_logits [B,A,C], loc [B,A,4]) ->
    (boxes [B,D,4], scores [B,D], labels [B,D], valid [B,D]).

    Class scores, best non-background class per anchor, top-k candidate
    pre-selection, then class-aware NMS.  ``score_activation``:
    "softmax" for SSD heads ([B,A,C] with background column 0,
    dropped); "sigmoid" for RetinaNet heads ([B,A,C-1] foreground-only
    logits).  Static output size D = max_detections; mask on ``valid``
    before use.  Labels use the ground-truth id space: 1..C-1 (0 is
    background and never emitted).

    ``pre_nms_topk`` bounds NMS's [N, N] IoU matrix: at SSD300's
    A=8732 the full matrix is ~305 MB/image (19 GB for a b32 eval
    batch — exceeds HBM); keeping the usual top 1000 candidates (the
    torchvision/Detectron convention) makes it 4 MB/image with no
    effect on mAP (anchors past rank 1000 are sub-threshold noise).
    The selection is lax.top_k + a [K]-row gather — small, eval-only.
    """
    if score_activation not in ("softmax", "sigmoid"):
        raise ValueError(f"unknown score_activation {score_activation!r}")

    def postprocess(cls_logits, loc):
        if score_activation == "softmax":
            probs = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # drop bg
        else:
            probs = jax.nn.sigmoid(cls_logits)  # already foreground-only
        scores = probs.max(axis=-1)  # [B, A]
        labels = probs.argmax(axis=-1) + 1  # [B, A] gt id space
        decoded = box_ops.decode_boxes(loc, anchors[None])
        decoded = jnp.clip(decoded, 0.0, 1.0)
        if pre_nms_topk and pre_nms_topk < scores.shape[1]:
            scores, idx = jax.lax.top_k(scores, pre_nms_topk)  # [B,K]
            decoded = jnp.take_along_axis(decoded, idx[..., None], axis=1)
            labels = jnp.take_along_axis(labels, idx, axis=1)

        def one(b, s, l):
            idx, valid = box_ops.batched_nms(
                b, s, l, iou_threshold=iou_threshold,
                max_out=max_detections, score_threshold=score_threshold)
            oh = jax.nn.one_hot(idx, b.shape[0], dtype=b.dtype)  # [D, K]
            # true-f32 row selection (box coordinates; see
            # match_anchors_band on bf16-lowered default dots)
            sel = lambda m, v: jnp.einsum(  # noqa: E731
                "da,a...->d...", m, v, precision="highest")
            return (sel(oh, b), sel(oh, s),
                    sel(oh, l.astype(b.dtype)).astype(jnp.int32), valid)

        return jax.vmap(one)(decoded, scores, labels)

    return postprocess
