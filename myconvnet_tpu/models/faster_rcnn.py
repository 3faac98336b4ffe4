"""Faster R-CNN: the two-stage detector, static-shape TPU form.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN) and
beyond the rebuild's single-shot family — Ren et al. 2015 with the FPN
backbone (Lin et al. 2017), re-designed around XLA's static-shape
model, the historical reason two-stage detectors were "out of scope"
for TPU ports:

* proposals are a FIXED count with a validity mask — top-k candidate
  selection + the blocked fixpoint NMS (ops/boxes.nms) never create a
  data-dependent shape;
* RoIAlign is two einsums per RoI chunk against pooled bilinear weight
  matrices (ops/roi.roi_align) — gather-free, MXU-resident;
* the train-time RoI subsample (512 RoIs, <=25% foreground) is one
  ``lax.top_k`` over boosted random priorities (ops/roi);
* the whole thing — backbone, FPN, RPN, proposal NMS, sampling,
  RoIAlign, box head — runs inside ONE jitted program per step;
  train/rcnn.py fuses the augmentation chain and both losses in too.

Two-stage control flow: the second stage consumes RoIs that depend on
ground truth during training, so the forward takes optional
``gt_boxes``/``gt_labels`` and does the sampling inside the transform
(using the frame RNG), returning everything the loss needs.  At eval
the RoIs are simply the RPN's top proposals.

Head conventions: RPN objectness is sigmoid over 3 ratio anchors per
cell, weight-tied across levels; the box head is torchvision-shaped
(two 1024 FCs, per-class box deltas, softmax classification with
background column 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import next_rng_key
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.models.retinanet import _fpn
from myconvnet_tpu.ops import roi as roi_ops
from myconvnet_tpu.ops.boxes import retina_anchors
from myconvnet_tpu.ops.pool import max_pool2d

RPN_RATIOS = (0.5, 1.0, 2.0)
_A = len(RPN_RATIOS)

# RPN anchor grid at 512^2: P3..P6, one scale per level (the FPN-RPN
# convention), 3 ratios.  retina_anchors' octave-major/ratio-minor
# variant order matches the head's channel layout below.
FRCNN512_RPN_SPEC = tuple(
    (fm, base, (0.0,), RPN_RATIOS)
    for fm, base in ((64, 0.125), (32, 0.25), (16, 0.5), (8, 1.0)))

TINYFRCNN_RPN_SPEC = tuple(
    (fm, base, (0.0,), RPN_RATIOS)
    for fm, base in ((16, 0.2), (8, 0.45), (4, 0.9)))


class FRCNNOut(NamedTuple):
    """Everything train/rcnn.py's losses and postprocess consume.

    Shapes: A = RPN anchors, S = RoIs (train: num_samples; eval:
    post_nms proposals), C = num_classes (background column 0)."""
    rpn_logits: jax.Array      # [B, A]     objectness
    rpn_loc: jax.Array         # [B, A, 4]
    rois: jax.Array            # [B, S, 4]  xyxy, normalized
    roi_valid: jax.Array       # [B, S]
    roi_scores: jax.Array      # [B, S]     RPN proposal scores (eval)
    roi_cls: jax.Array         # [B, S, C]  softmax logits
    roi_reg: jax.Array         # [B, S, C, 4] per-class deltas
    roi_labels: jax.Array      # [B, S]     train targets (eval: zeros)
    roi_targets: jax.Array     # [B, S, 4]  train targets (eval: zeros)
    roi_pos: jax.Array         # [B, S]     train fg mask (eval: False)
    roi_gt: jax.Array          # [B, S]     matched gt row (eval: zeros)


def _rpn_heads(feats, ch):
    """Weight-tied RPN over the pyramid -> (logits [B,A], loc [B,A,4])."""
    logits, locs = [], []
    for f in feats:
        with nn.scope_shared("rpn"):
            h = nn.relu(nn.conv(f, ch, 3, name="conv"))
            ob = nn.conv(h, _A, 1, name="obj", w_init=init.normal(0.01))
            lc = nn.conv(h, _A * 4, 1, name="loc",
                         w_init=init.normal(0.01))
        b, hh, ww, _ = ob.shape
        logits.append(ob.reshape(b, hh * ww * _A))
        locs.append(lc.reshape(b, hh * ww * _A, 4))
    return jnp.concatenate(logits, axis=1), jnp.concatenate(locs, axis=1)


def _box_head(crops, num_classes, fc_dim):
    """[B,S,s,s,C'] -> (cls [B,S,C], reg [B,S,C,4]); torchvision shape."""
    b, s = crops.shape[:2]
    flat = crops.reshape(b * s, -1)
    with nn.scope_named("box_head"):
        h = nn.relu(nn.dense(flat, fc_dim, name="fc1"))
        h = nn.relu(nn.dense(h, fc_dim, name="fc2"))
        cls = nn.dense(h, num_classes, name="cls",
                       w_init=init.normal(0.01))
        reg = nn.dense(h, num_classes * 4, name="reg",
                       w_init=init.normal(0.001))
    return (cls.reshape(b, s, num_classes),
            reg.reshape(b, s, num_classes, 4))


def _two_stage(x, num_classes, *, train, gt_boxes, gt_labels, feats,
               rpn_spec, align_levels, fpn_channels, fc_dim,
               pre_topk, post_train, post_eval, nms_iou,
               num_samples, fg_fraction, fg_iou, out_size, chunk):
    """Shared second half: RPN -> proposals -> sample -> RoIAlign -> head.

    ``feats``: full pyramid for the RPN; ``align_levels`` of them (the
    bottom ones) feed RoIAlign.
    """
    rpn_logits, rpn_loc = _rpn_heads(feats, fpn_channels)
    anchors = jnp.asarray(retina_anchors(rpn_spec))
    if anchors.shape[0] != rpn_logits.shape[1]:
        raise ValueError(f"RPN grid {rpn_logits.shape[1]} != anchor "
                         f"spec {anchors.shape[0]} — wrong input size")

    # proposals never backprop into the RPN (the paper's approximate
    # joint training): boxes come from stop_gradient'ed outputs
    post_count = post_train if train else post_eval
    props, prop_scores, prop_valid = jax.vmap(
        lambda o, d: roi_ops.generate_proposals(
            o, d, anchors, pre_topk=pre_topk, post_count=post_count,
            nms_iou=nms_iou)
    )(jax.lax.stop_gradient(rpn_logits),
      jax.lax.stop_gradient(rpn_loc))

    B = x.shape[0]
    if train and gt_boxes is not None:
        keys = jax.random.split(next_rng_key(), B)
        rois, labels, targets, pos, valid, roi_gt = jax.vmap(
            lambda k, p, v, gb, gl: roi_ops.match_and_sample_rois(
                k, p, v, gb, gl, num_samples=num_samples,
                fg_fraction=fg_fraction, fg_iou=fg_iou)
        )(keys, props, prop_valid, gt_boxes, gt_labels)
        scores = jnp.zeros_like(valid, jnp.float32)
    else:
        rois, valid, scores = props, prop_valid, prop_scores
        S = rois.shape[1]
        labels = jnp.zeros((B, S), jnp.int32)
        targets = jnp.zeros((B, S, 4), rois.dtype)
        pos = jnp.zeros((B, S), bool)
        roi_gt = jnp.zeros((B, S), jnp.int32)

    crops = roi_ops.multilevel_roi_align(
        feats[:align_levels], rois, out_size=out_size, chunk=chunk)
    roi_cls, roi_reg = _box_head(crops, num_classes, fc_dim)
    return FRCNNOut(rpn_logits, rpn_loc, rois, valid, scores,
                    roi_cls, roi_reg, labels, targets, pos, roi_gt)


def _frcnn512_trunk(x, *, train, depth, fpn_channels, stem):
    """ResNet-FPN trunk for the 512x512 two-stage family: P3-P5 from
    C3-C5 laterals (models/retinanet._fpn, levels=3) + P6 = stride-2
    subsample of P5 for the RPN only (the FPN paper's RPN
    convention)."""
    with nn.scope_named("backbone"):
        _, c3, c4, c5 = resnet_backbone(x, depth, train=train, stem=stem,
                                        return_stages=True)
    p3, p4, p5 = _fpn(c3, c4, c5, fpn_channels, levels=3)
    p6 = max_pool2d(p5, 1, 2)
    feats = [p3, p4, p5, p6]
    sizes = tuple(f.shape[1] for f in feats)
    want = tuple(s[0] for s in FRCNN512_RPN_SPEC)
    if sizes != want:
        raise ValueError(f"pyramid {sizes} != RPN spec {want} — input "
                         "must be 512x512")
    return feats


def _tiny_trunk(x, *, width):
    """CPU-smoke trunk: 5 stride-2 convs -> 3-level FPN (16/8/4@128²)."""
    with nn.scope_named("backbone"):
        c1 = nn.relu(nn.conv(x, width, 3, stride=2, name="c1"))
        c2 = nn.relu(nn.conv(c1, width, 3, stride=2, name="c2"))
        c3 = nn.relu(nn.conv(c2, width * 2, 3, stride=2, name="c3"))
        c4 = nn.relu(nn.conv(c3, width * 2, 3, stride=2, name="c4"))
        c5 = nn.relu(nn.conv(c4, width * 4, 3, stride=2, name="c5"))
    feats = list(_fpn(c3, c4, c5, width * 2, levels=3))
    sizes = tuple(f.shape[1] for f in feats)
    want = tuple(s[0] for s in TINYFRCNN_RPN_SPEC)
    if sizes != want:
        raise ValueError(f"pyramid {sizes} != RPN spec {want} — input "
                         "must be 128x128")
    return feats


def faster_rcnn(x: jax.Array, num_classes: int = 21, *,
                train: bool = False, gt_boxes=None, gt_labels=None,
                depth: int = 50, fpn_channels: int = 256,
                fc_dim: int = 1024, stem: str = "conv7",
                pre_topk: int = 2000, post_train: int = 1000,
                post_eval: int = 300, rpn_nms_iou: float = 0.7,
                num_samples: int = 512, fg_fraction: float = 0.25,
                fg_iou: float = 0.5, roi_chunk: int = 32) -> FRCNNOut:
    """Faster R-CNN, ResNet-FPN trunk (_frcnn512_trunk), 512x512 input;
    RoIAlign pools from P3-P5 by RoI scale.  Pair with
    train.rcnn.make_rcnn_step / make_rcnn_postprocess.
    """
    feats = _frcnn512_trunk(x, train=train, depth=depth,
                            fpn_channels=fpn_channels, stem=stem)
    return _two_stage(
        x, num_classes, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, feats=feats, rpn_spec=FRCNN512_RPN_SPEC,
        align_levels=3, fpn_channels=fpn_channels, fc_dim=fc_dim,
        pre_topk=pre_topk, post_train=post_train, post_eval=post_eval,
        nms_iou=rpn_nms_iou, num_samples=num_samples,
        fg_fraction=fg_fraction, fg_iou=fg_iou, out_size=7,
        chunk=roi_chunk)


faster_rcnn.input_hw = (512, 512)
faster_rcnn.rpn_spec = FRCNN512_RPN_SPEC
faster_rcnn.family = "two_stage"


def tinyfrcnn(x: jax.Array, num_classes: int = 21, *,
              train: bool = False, gt_boxes=None, gt_labels=None,
              width: int = 32, fc_dim: int = 64,
              pre_topk: int = 256, post_train: int = 128,
              post_eval: int = 64, num_samples: int = 64,
              fg_fraction: float = 0.25) -> FRCNNOut:
    """CPU-runnable two-stage smoke variant: 128x128 input, 3-level
    pyramid (16/8/4), tiny trunk and head, 5x5 RoIAlign."""
    feats = _tiny_trunk(x, width=width)
    return _two_stage(
        x, num_classes, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, feats=feats, rpn_spec=TINYFRCNN_RPN_SPEC,
        align_levels=3, fpn_channels=width * 2, fc_dim=fc_dim,
        pre_topk=pre_topk, post_train=post_train, post_eval=post_eval,
        nms_iou=0.7, num_samples=num_samples, fg_fraction=fg_fraction,
        fg_iou=0.5, out_size=5, chunk=64)


tinyfrcnn.input_hw = (128, 128)
tinyfrcnn.rpn_spec = TINYFRCNN_RPN_SPEC
tinyfrcnn.family = "two_stage"
