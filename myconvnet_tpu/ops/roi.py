"""Region-of-interest primitives for two-stage detection, TPU-form.

The reference framework has no two-stage detector (SURVEY.md §2 lists
cls/seg/GAN); this extends the rebuild's detection family (fourth task
family) with the Faster R-CNN building blocks, designed static-shape
first:

* **RoIAlign as matmuls** — no gathers.  Bilinear sampling along an
  axis is a linear map, so each RoI's pooled crop is two small einsums
  against per-RoI interpolation-weight matrices (the same design as
  ops/resize's matmul-form bilinear and the detection window warp).
  The 2x2 average pool inside each bin folds INTO the weights (pooling
  is linear too), so a 7x7 output contracts [P,7,H] @ [H,W,C] @ [W,7,P]
  directly.  RoIs chunk through ``lax.map`` to bound the [chunk,7,H,C]
  intermediate.
* **Proposals with static shapes** — top-k pre-selection + the blocked
  fixpoint NMS (ops/boxes.nms) emit a FIXED number of proposals with a
  validity mask; no data-dependent shapes ever reach XLA.
* **RoI sampling via top-k on random priorities** — the classic
  take-256-with-25%-foreground subsample becomes one ``lax.top_k`` over
  a priority vector (foreground ranks boosted, capped by a double-
  argsort rank), keeping shapes static and the whole step one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu.ops import boxes as box_ops

# --------------------------------------------------------------- RoIAlign


def _pooled_axis_weights(lo: jax.Array, hi: jax.Array, size: int,
                         bins: int, samples: int = 2) -> jax.Array:
    """Interpolation-weight matrix [P, bins, size] for one axis.

    lo/hi: [P] normalized RoI extents.  Each output bin averages
    ``samples`` bilinear taps at the torchvision ``aligned=True``
    positions (continuous coord of pixel center h is h, so the
    normalized->pixel map subtracts 0.5).  Sample coords clamp to the
    border (replicate padding), keeping every row a convex weight
    combination.  Degenerate (hi <= lo, e.g. padded) RoIs collapse to a
    point — harmless, downstream masks carry validity.
    """
    span = (hi - lo) * size                       # [P] pixels
    bw = span / bins
    # sample m of bin i sits at fraction (i + (m+0.5)/samples) of a bin
    offs = (jnp.arange(bins)[:, None]
            + (jnp.arange(samples)[None, :] + 0.5) / samples)  # [bins,S]
    pos = lo[:, None, None] * size + offs[None] * bw[:, None, None] - 0.5
    pos = jnp.clip(pos, 0.0, size - 1.0)          # [P, bins, S]
    grid = jnp.arange(size, dtype=pos.dtype)      # [size]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))
    return w.mean(axis=2)                         # [P, bins, size]


def roi_align(feats: jax.Array, rois: jax.Array, out_size: int = 7,
              samples: int = 2, chunk: int = 128) -> jax.Array:
    """RoIAlign one pyramid level: feats [B,H,W,C], rois [B,P,4]
    normalized xyxy -> [B,P,out,out,C].

    Two einsums per RoI chunk (rows then cols); ``chunk`` bounds the
    [chunk,out,H,C] intermediate so HBM stays flat for any P.
    """
    B, H, W, C = feats.shape
    P = rois.shape[1]
    ch = min(chunk, P)
    nch = -(-P // ch)
    pad = nch * ch - P

    def one_image(f, r):
        if pad:
            r = jnp.concatenate([r, jnp.zeros((pad, 4), r.dtype)])

        def one_chunk(rc):
            rw = _pooled_axis_weights(rc[:, 1], rc[:, 3], H, out_size,
                                      samples)
            cw = _pooled_axis_weights(rc[:, 0], rc[:, 2], W, out_size,
                                      samples)
            t = jnp.einsum("pih,hwc->piwc", rw, f)
            return jnp.einsum("pjw,piwc->pijc", cw, t)

        out = jax.lax.map(one_chunk, r.reshape(nch, ch, 4))
        return out.reshape(nch * ch, out_size, out_size, C)[:P]

    return jax.vmap(one_image)(feats, rois)


def assign_levels(rois: jax.Array, num_levels: int) -> jax.Array:
    """FPN level index per RoI (normalized-canonical variant of the FPN
    paper's k = k0 + log2(sqrt(area)/224) rule): an image-sized RoI maps
    to the top level, each halving of sqrt(area) walks one level down.
    rois [..., 4] -> int32 [...]."""
    wh = jnp.maximum(rois[..., 2:] - rois[..., :2], 0.0)
    scale = jnp.sqrt(wh[..., 0] * wh[..., 1])
    lvl = (num_levels - 1) + jnp.log2(jnp.maximum(scale, 1e-6))
    return jnp.clip(jnp.floor(lvl + 0.5), 0, num_levels - 1).astype(
        jnp.int32)


def multilevel_roi_align(feats: list[jax.Array], rois: jax.Array,
                         out_size: int = 7, samples: int = 2,
                         chunk: int = 128) -> jax.Array:
    """RoIAlign over an FPN: each RoI pools from the level its scale
    assigns (assign_levels).  Crops compute on EVERY level and combine
    through the one-hot level weight — static shapes beat the 3-4x
    arithmetic (the crops are a few percent of the backbone's FLOPs and
    the MXU runs them dense; a per-level scatter would serialize)."""
    lvl = assign_levels(rois, len(feats))          # [B, P]
    oh = jax.nn.one_hot(lvl, len(feats), dtype=feats[0].dtype)
    out = None
    for li, f in enumerate(feats):
        crop = roi_align(f, rois, out_size, samples, chunk)
        w = oh[..., li][..., None, None, None]
        out = crop * w if out is None else out + crop * w
    return out

# -------------------------------------------------------------- proposals


def generate_proposals(objectness: jax.Array, deltas: jax.Array,
                       anchors: jax.Array, *, pre_topk: int = 2000,
                       post_count: int = 1000, nms_iou: float = 0.7,
                       min_size: float = 0.0
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """RPN outputs -> fixed-count proposal boxes, ONE image.

    objectness [A] logits, deltas [A,4], anchors [A,4] ->
    (boxes [post_count,4] clipped xyxy, scores [post_count],
    valid [post_count]).  Decode uses unit variances (the RPN
    convention).  Callers vmap over the batch.
    """
    scores = jax.nn.sigmoid(objectness)
    boxes = box_ops.decode_boxes(deltas, anchors, variances=(1.0, 1.0))
    boxes = jnp.clip(boxes, 0.0, 1.0)
    if min_size > 0.0:
        wh = boxes[:, 2:] - boxes[:, :2]
        keep = (wh[:, 0] >= min_size) & (wh[:, 1] >= min_size)
        scores = jnp.where(keep, scores, 0.0)
    k = min(pre_topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take(boxes, idx, axis=0)
    sel, valid = box_ops.nms(top_boxes, top_scores,
                             iou_threshold=nms_iou, max_out=post_count)
    return (jnp.take(top_boxes, sel, axis=0) * valid[:, None],
            jnp.take(top_scores, sel, axis=0) * valid, valid)

# ------------------------------------------------------------ RoI sampling


def match_and_sample_rois(key: jax.Array, proposals: jax.Array,
                          prop_valid: jax.Array, gt_boxes: jax.Array,
                          gt_labels: jax.Array, *,
                          num_samples: int = 512,
                          fg_fraction: float = 0.25,
                          fg_iou: float = 0.5, bg_iou_hi: float = 0.5,
                          bg_iou_lo: float = 0.0):
    """Second-stage training subsample, ONE image (vmap over batch).

    Appends the ground-truth boxes to the proposal set (the standard
    stabilizer — early RPN proposals rarely overlap anything), matches
    by best IoU, then draws ``num_samples`` RoIs with at most
    ``fg_fraction`` foreground via ONE static top-k: each candidate
    gets a uniform random priority, foreground within the quota (rank
    from a double argsort) is boosted above every background, and
    ineligible slots sink to -inf.

    Returns (rois [S,4], labels [S] int32 — 0 is background,
    reg_targets [S,4] encode_boxes vs the roi, pos [S] bool,
    valid [S] bool, matched_gt [S] int32 — the best-IoU gt row per
    RoI, meaningful where ``pos``; the mask branch crops its training
    targets from the instance this index names).
    """
    m = gt_boxes.shape[0]
    gt_valid = gt_labels >= 0
    cand = jnp.concatenate([proposals, gt_boxes], axis=0)     # [P+M, 4]
    cand_valid = jnp.concatenate([prop_valid, gt_valid])
    iou = box_ops.box_iou(cand, gt_boxes)                     # [P+M, M]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    # no valid gt at all -> best overlap is 0 (pure background image),
    # NOT the -1 mask value, or background sampling would go empty
    best_iou = jnp.maximum(iou.max(axis=1), 0.0)
    best_gt = iou.argmax(axis=1)
    fg = cand_valid & (best_iou >= fg_iou)
    bg = cand_valid & (best_iou < bg_iou_hi) & (best_iou >= bg_iou_lo)

    rand = jax.random.uniform(key, (cand.shape[0],))
    n_fg_max = int(round(num_samples * fg_fraction))
    fg_rand = jnp.where(fg, rand, -jnp.inf)
    fg_rank = jnp.argsort(jnp.argsort(-fg_rand))              # 0 = first
    prio = jnp.where(fg & (fg_rank < n_fg_max), rand + 2.0,
                     jnp.where(bg, rand, -jnp.inf))
    vals, sel = jax.lax.top_k(prio, num_samples)
    valid = vals > -jnp.inf

    rois = jnp.take(cand, sel, axis=0)
    pos = jnp.take(fg, sel) & valid
    matched_gt = jnp.take(best_gt, sel)
    labels_all = jnp.take(jnp.maximum(gt_labels, 0), matched_gt)
    labels = jnp.where(pos, labels_all, 0).astype(jnp.int32)
    matched_boxes = jnp.take(gt_boxes, matched_gt, axis=0)
    # guard degenerate rois (padding slots) before encode's log
    safe_rois = jnp.where(valid[:, None], rois,
                          jnp.array([0.0, 0.0, 1.0, 1.0], rois.dtype))
    targets = box_ops.encode_boxes(matched_boxes, safe_rois)
    targets = jnp.where(pos[:, None], targets, 0.0)
    return rois, labels, targets, pos, valid, matched_gt.astype(jnp.int32)

# ------------------------------------------------------------ mask crops


def crop_instance_masks(inst_map: jax.Array, rois: jax.Array,
                        inst_idx: jax.Array, out_size: int = 28,
                        samples: int = 2, chunk: int = 32) -> jax.Array:
    """Per-RoI mask-training targets from an instance-id map, as matmuls.

    inst_map [B,H,W] int (0 background, instance ``k`` stored as
    ``k+1`` — the VOC SegmentationObject convention), rois [B,S,4]
    normalized xyxy, inst_idx [B,S] matched instance per RoI ->
    [B,S,out,out] float32 soft indicators in [0,1] (bilinear crop of
    the per-RoI binary mask; threshold at 0.5 for hard targets).

    Same design as :func:`roi_align`: the crop operator is linear, so
    each RoI is two einsums against pooled interpolation weights; the
    per-RoI [chunk,H,W] indicator bounds HBM through ``lax.map``.
    """
    B, H, W = inst_map.shape
    S = rois.shape[1]
    ch = min(chunk, S)
    nch = -(-S // ch)
    pad = nch * ch - S

    def one_image(m, r, ix):
        if pad:
            r = jnp.concatenate([r, jnp.zeros((pad, 4), r.dtype)])
            ix = jnp.concatenate([ix, jnp.zeros((pad,), ix.dtype)])

        def one_chunk(args):
            rc, ic = args
            ind = (m[None] == (ic[:, None, None] + 1)).astype(jnp.float32)
            rw = _pooled_axis_weights(rc[:, 1], rc[:, 3], H, out_size,
                                      samples)
            cw = _pooled_axis_weights(rc[:, 0], rc[:, 2], W, out_size,
                                      samples)
            t = jnp.einsum("pih,phw->piw", rw, ind)
            return jnp.einsum("pjw,piw->pij", cw, t)

        out = jax.lax.map(one_chunk, (r.reshape(nch, ch, 4),
                                      ix.reshape(nch, ch)))
        return out.reshape(nch * ch, out_size, out_size)[:S]

    return jax.vmap(one_image)(inst_map, rois, inst_idx)


def _paste_axis_weights(lo: jax.Array, hi: jax.Array, size: int,
                        msize: int) -> jax.Array:
    """Paste-operator weights [D, size, msize] for one axis: output
    pixel centers inside [lo, hi] sample the mask bilinearly at the
    box-relative coordinate; pixels outside the box get zero rows.
    The adjoint view of :func:`_pooled_axis_weights`."""
    pix = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    span = jnp.maximum(hi - lo, 1e-9)
    mc = (pix[None, :] - lo[:, None]) / span[:, None] * msize - 0.5
    grid = jnp.arange(msize, dtype=mc.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(mc[..., None] - grid))
    inside = (pix[None, :] >= lo[:, None]) & (pix[None, :] <= hi[:, None])
    return w * inside[..., None]


def paste_masks(masks: jax.Array, boxes: jax.Array,
                out_hw: tuple[int, int], chunk: int = 32) -> jax.Array:
    """Detection-box mask paste: masks [B,D,s,s] (probabilities) +
    boxes [B,D,4] normalized xyxy -> [B,D,H,W] soft full-frame masks
    (zero outside each box).  Two einsums per chunk; threshold at 0.5
    for binary output.  Mind the output size: [D,H,W] floats per image
    — paste at eval resolution, not print resolution."""
    H, W = out_hw
    B, D, s, _ = masks.shape
    ch = min(chunk, D)
    nch = -(-D // ch)
    pad = nch * ch - D

    def one_image(m, b):
        if pad:
            m = jnp.concatenate([m, jnp.zeros((pad, s, s), m.dtype)])
            b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])

        def one_chunk(args):
            mc, bc = args
            rw = _paste_axis_weights(bc[:, 1], bc[:, 3], H, s)
            cw = _paste_axis_weights(bc[:, 0], bc[:, 2], W, s)
            t = jnp.einsum("dhs,dst->dht", rw, mc)
            return jnp.einsum("dwt,dht->dhw", cw, t)

        out = jax.lax.map(one_chunk, (m.reshape(nch, ch, s, s),
                                      b.reshape(nch, ch, 4)))
        return out.reshape(nch * ch, H, W)[:D]

    return jax.vmap(one_image)(masks, boxes)
