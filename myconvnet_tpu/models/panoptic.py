"""Panoptic FPN: joint instance + semantic segmentation.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN) —
Kirillov et al. 2019 on the rebuild's Mask R-CNN assembly
(models/mask_rcnn.py): the two-stage instance branch is untouched, and
a SEMANTIC branch hangs off the same FPN —

* each pyramid level gets a small conv stack (conv3x3+ReLU per 2x of
  upsampling needed) and is bilinearly upsampled to the finest level's
  resolution (matmul-form ops/resize — gather-free),
* the summed feature map takes a 1x1 to per-pixel class logits at 1/8
  input scale; the loss upsamples gt rather than logits (cheaper, the
  paper's 1/4-scale equivalent for a P3-P5 pyramid),
* everything — RPN, box head, mask branch, semantic branch, all four
  losses — runs in ONE jitted program (train/rcnn.make_panoptic_step).

The panoptic MERGE (instances pasted by score over the semantic
argmax, the paper's inference heuristic) and the PQ metric are
host-side eval code (eval/panoptic.py) — per-image ragged segment
matching, a once-per-validation cost like the mAP protocols.

Semantic class convention: channel 0 = "thing" pixels (any instance),
channels 1..S-1 = stuff classes.  VOC sources map background to stuff
channel 1 ("unlabeled stuff") and instance pixels to 0; corpora with
real stuff annotations (COCO panoptic) slot in the same shape.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.models.faster_rcnn import (FRCNN512_RPN_SPEC,
                                              TINYFRCNN_RPN_SPEC,
                                              _frcnn512_trunk,
                                              _tiny_trunk)
from myconvnet_tpu.models.mask_rcnn import MaskRCNNOut, _with_masks
from myconvnet_tpu.ops.resize import resize_bilinear


class PanopticOut(NamedTuple):
    """MaskRCNNOut's fields plus the semantic branch ([B, H/8, W/8, S]
    per-pixel logits at the finest pyramid scale)."""
    rpn_logits: jax.Array
    rpn_loc: jax.Array
    rois: jax.Array
    roi_valid: jax.Array
    roi_scores: jax.Array
    roi_cls: jax.Array
    roi_reg: jax.Array
    roi_labels: jax.Array
    roi_targets: jax.Array
    roi_pos: jax.Array
    roi_gt: jax.Array
    mask_logits: jax.Array
    mask_rois: jax.Array
    mask_labels: jax.Array
    mask_gt: jax.Array
    mask_valid: jax.Array
    sem_logits: jax.Array


def _semantic_branch(feats, num_stuff, channels):
    """FPN levels -> [B, h0, w0, num_stuff] logits at the finest
    level's resolution (the Panoptic FPN semantic head)."""
    h0, w0 = feats[0].shape[1:3]
    merged = None
    with nn.scope_named("semantic"):
        for i, f in enumerate(feats):
            g = f
            # one conv per 2x of upsampling (at least one), then a
            # single bilinear jump to the target grid
            ups = max(1, int(math.log2(max(h0 // f.shape[1], 1))))
            for j in range(ups):
                g = nn.relu(nn.conv(g, channels, 3,
                                    name=f"p{i}_conv{j + 1}"))
            if g.shape[1] != h0:
                g = resize_bilinear(g, (h0, w0))
            merged = g if merged is None else merged + g
        return nn.conv(merged, num_stuff, 1, name="logits")


def _panoptic(x, num_classes, num_stuff, feats, align_levels, *,
              train, gt_boxes, gt_labels, mask_rois, sem_channels,
              mask_kwargs):
    if mask_rois is not None:
        # detection-time mask pass — same contract as mask_rcnn
        return _with_masks(x, num_classes, feats, align_levels,
                           train=train, gt_boxes=gt_boxes,
                           gt_labels=gt_labels, mask_rois=mask_rois,
                           **mask_kwargs)
    out = _with_masks(x, num_classes, feats, align_levels, train=train,
                      gt_boxes=gt_boxes, gt_labels=gt_labels,
                      mask_rois=None, **mask_kwargs)
    sem = _semantic_branch(feats[:align_levels], num_stuff,
                           sem_channels)
    return PanopticOut(*out, sem)


def panoptic_fpn(x: jax.Array, num_classes: int = 21, *,
                 train: bool = False, gt_boxes=None, gt_labels=None,
                 mask_rois=None, num_stuff: int = 2,
                 depth: int = 50, fpn_channels: int = 256,
                 fc_dim: int = 1024, stem: str = "conv7",
                 sem_channels: int = 128,
                 pre_topk: int = 2000, post_train: int = 1000,
                 post_eval: int = 300, rpn_nms_iou: float = 0.7,
                 num_samples: int = 512, fg_fraction: float = 0.25,
                 fg_iou: float = 0.5, roi_chunk: int = 32,
                 mask_pool: int = 14, mask_channels: int = 256,
                 mask_convs: int = 4, mask_samples: int = 128,
                 mask_eval_rois: int = 100):
    """Panoptic FPN, ResNet-FPN trunk, 512x512 input: Mask R-CNN plus
    the semantic branch.  Pair with train.rcnn.make_panoptic_step /
    make_rcnn_postprocess / eval.panoptic."""
    feats = _frcnn512_trunk(x, train=train, depth=depth,
                            fpn_channels=fpn_channels, stem=stem)
    return _panoptic(
        x, num_classes, num_stuff, feats, 3, train=train,
        gt_boxes=gt_boxes, gt_labels=gt_labels, mask_rois=mask_rois,
        sem_channels=sem_channels,
        mask_kwargs=dict(
            two_stage_kwargs=dict(
                rpn_spec=FRCNN512_RPN_SPEC, align_levels=3,
                fpn_channels=fpn_channels, fc_dim=fc_dim,
                pre_topk=pre_topk, post_train=post_train,
                post_eval=post_eval, nms_iou=rpn_nms_iou,
                num_samples=num_samples, fg_fraction=fg_fraction,
                fg_iou=fg_iou, out_size=7, chunk=roi_chunk),
            mask_pool=mask_pool, mask_channels=mask_channels,
            mask_convs=mask_convs, mask_samples=mask_samples,
            mask_eval_rois=mask_eval_rois, chunk=roi_chunk))


panoptic_fpn.input_hw = (512, 512)
panoptic_fpn.rpn_spec = FRCNN512_RPN_SPEC
panoptic_fpn.family = "two_stage_panoptic"


def tinypan(x: jax.Array, num_classes: int = 21, *,
            train: bool = False, gt_boxes=None, gt_labels=None,
            mask_rois=None, num_stuff: int = 2, width: int = 32,
            fc_dim: int = 64, sem_channels: int = 16,
            pre_topk: int = 256, post_train: int = 128,
            post_eval: int = 64, num_samples: int = 64,
            fg_fraction: float = 0.25, mask_pool: int = 5,
            mask_channels: int = 16, mask_convs: int = 2,
            mask_samples: int = 16, mask_eval_rois: int = 16):
    """CPU-runnable Panoptic FPN smoke variant on the tiny trunk."""
    feats = _tiny_trunk(x, width=width)
    return _panoptic(
        x, num_classes, num_stuff, feats, 3, train=train,
        gt_boxes=gt_boxes, gt_labels=gt_labels, mask_rois=mask_rois,
        sem_channels=sem_channels,
        mask_kwargs=dict(
            two_stage_kwargs=dict(
                rpn_spec=TINYFRCNN_RPN_SPEC, align_levels=3,
                fpn_channels=width * 2, fc_dim=fc_dim,
                pre_topk=pre_topk, post_train=post_train,
                post_eval=post_eval, nms_iou=0.7,
                num_samples=num_samples, fg_fraction=fg_fraction,
                fg_iou=0.5, out_size=5, chunk=64),
            mask_pool=mask_pool, mask_channels=mask_channels,
            mask_convs=mask_convs, mask_samples=mask_samples,
            mask_eval_rois=mask_eval_rois, chunk=64))


tinypan.input_hw = (128, 128)
tinypan.rpn_spec = TINYFRCNN_RPN_SPEC
tinypan.family = "two_stage_panoptic"
