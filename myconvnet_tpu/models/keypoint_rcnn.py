"""Keypoint R-CNN: human-pose estimation on the two-stage stack.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN) — the
third member of the He et al. 2017 R-CNN trio (detect / +masks /
+keypoints), on the rebuild's shared two-stage assembly
(models/faster_rcnn.py), keeping every static-shape discipline:

* one heatmap channel per keypoint: the head predicts logits over a
  ``p x p`` grid per RoI and the loss is a softmax cross-entropy over
  GRID POSITIONS per visible keypoint (the paper's "one-hot mask"
  formulation) — no regression targets, no variable shapes;
* keypoint-training targets are pure arithmetic on the matched gt
  keypoints (train/rcnn.keypoint_targets): box-relative coordinates
  snapped to the grid, visibility-masked — no instance map needed;
* at detection time the keypoint branch re-runs on the POST-NMS boxes
  (``kp_rois=`` mode, the Detectron convention) and the host decodes
  grid argmaxes back to image coordinates
  (train/rcnn.decode_keypoints).

Head convention (torchvision-shaped): ``kp_convs`` 3x3 convs at
``kp_channels`` -> 2x deconv -> 1x1 to K channels -> 2x bilinear
upsample, i.e. heatmaps at 4x the keypoint RoIAlign resolution
(14 -> 56 for the 512² model).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.models.faster_rcnn import (FRCNN512_RPN_SPEC,
                                              TINYFRCNN_RPN_SPEC,
                                              _frcnn512_trunk,
                                              _tiny_trunk, _two_stage)
from myconvnet_tpu.models.mask_rcnn import _select_mask_rois
from myconvnet_tpu.ops import roi as roi_ops
from myconvnet_tpu.ops.resize import resize_bilinear


class KeypointRCNNOut(NamedTuple):
    """FRCNNOut's fields (by name — train/rcnn.py reads attributes)
    plus the keypoint branch.  Sk = kp_samples (train) or kp_eval_rois
    (eval); p = 4 * keypoint RoIAlign size; K = num_keypoints."""
    rpn_logits: jax.Array      # [B, A]
    rpn_loc: jax.Array         # [B, A, 4]
    rois: jax.Array            # [B, S, 4]
    roi_valid: jax.Array       # [B, S]
    roi_scores: jax.Array      # [B, S]
    roi_cls: jax.Array         # [B, S, C]
    roi_reg: jax.Array         # [B, S, C, 4]
    roi_labels: jax.Array      # [B, S]
    roi_targets: jax.Array     # [B, S, 4]
    roi_pos: jax.Array         # [B, S]
    roi_gt: jax.Array          # [B, S]
    kp_logits: jax.Array       # [B, Sk, p, p, K]
    kp_rois: jax.Array         # [B, Sk, 4]
    kp_gt: jax.Array           # [B, Sk]  matched gt instance row
    kp_valid: jax.Array        # [B, Sk]  bool — positives only


def _kp_head(crops, num_keypoints, channels, convs):
    """[B,Sk,s,s,C'] -> [B,Sk,4s,4s,K] per-keypoint heatmap logits."""
    b, s, p = crops.shape[:3]
    h = crops.reshape(b * s, p, p, crops.shape[-1])
    with nn.scope_named("kp_head"):
        for i in range(convs):
            h = nn.relu(nn.conv(h, channels, 3, name=f"conv{i + 1}"))
        h = nn.conv_transpose(h, num_keypoints, 4, stride=2,
                              w_init=init.he_normal(), name="deconv")
        h = resize_bilinear(h, (4 * p, 4 * p))
    return h.reshape(b, s, 4 * p, 4 * p, num_keypoints)


def _kp_branch(feats, align_levels, rois, num_keypoints, *, channels,
               convs, pool, chunk):
    crops = roi_ops.multilevel_roi_align(feats[:align_levels], rois,
                                         out_size=pool, chunk=chunk)
    return _kp_head(crops, num_keypoints, channels, convs)


def _with_keypoints(x, num_classes, feats, align_levels, *, train,
                    gt_boxes, gt_labels, kp_rois, num_keypoints,
                    two_stage_kwargs, kp_pool, kp_channels, kp_convs,
                    kp_samples, kp_eval_rois, chunk):
    """Shared Keypoint R-CNN second half over a built pyramid."""
    if kp_rois is not None:
        # detection-time pass: trunk + keypoint branch only
        return _kp_branch(feats, align_levels, kp_rois, num_keypoints,
                          channels=kp_channels, convs=kp_convs,
                          pool=kp_pool, chunk=chunk)
    out = _two_stage(x, num_classes, train=train, gt_boxes=gt_boxes,
                     gt_labels=gt_labels, feats=feats,
                     **two_stage_kwargs)
    if train and gt_boxes is not None:
        k_rois, _k_labels, k_gt, k_valid = _select_mask_rois(
            out, kp_samples)
    else:
        n = min(kp_eval_rois, out.rois.shape[1])
        k_rois = out.rois[:, :n]
        k_valid = out.roi_valid[:, :n]
        k_gt = jnp.zeros((x.shape[0], n), jnp.int32)
    kp_logits = _kp_branch(feats, align_levels, k_rois, num_keypoints,
                           channels=kp_channels, convs=kp_convs,
                           pool=kp_pool, chunk=chunk)
    return KeypointRCNNOut(*out, kp_logits, k_rois, k_gt, k_valid)


def keypoint_rcnn(x: jax.Array, num_classes: int = 2, *,
                  train: bool = False, gt_boxes=None, gt_labels=None,
                  kp_rois=None, num_keypoints: int = 17,
                  depth: int = 50, fpn_channels: int = 256,
                  fc_dim: int = 1024, stem: str = "conv7",
                  pre_topk: int = 2000, post_train: int = 1000,
                  post_eval: int = 300, rpn_nms_iou: float = 0.7,
                  num_samples: int = 512, fg_fraction: float = 0.25,
                  fg_iou: float = 0.5, roi_chunk: int = 32,
                  kp_pool: int = 14, kp_channels: int = 512,
                  kp_convs: int = 8, kp_samples: int = 64,
                  kp_eval_rois: int = 100):
    """Keypoint R-CNN, ResNet-FPN trunk, 512x512 input, COCO-person
    defaults (num_classes=2: background + person; K=17 keypoints;
    56x56 heatmaps).  Pair with train.rcnn.make_keypoint_rcnn_step /
    make_rcnn_postprocess / decode_keypoints.
    """
    feats = _frcnn512_trunk(x, train=train, depth=depth,
                            fpn_channels=fpn_channels, stem=stem)
    return _with_keypoints(
        x, num_classes, feats, 3, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, kp_rois=kp_rois,
        num_keypoints=num_keypoints,
        two_stage_kwargs=dict(
            rpn_spec=FRCNN512_RPN_SPEC, align_levels=3,
            fpn_channels=fpn_channels, fc_dim=fc_dim, pre_topk=pre_topk,
            post_train=post_train, post_eval=post_eval,
            nms_iou=rpn_nms_iou, num_samples=num_samples,
            fg_fraction=fg_fraction, fg_iou=fg_iou, out_size=7,
            chunk=roi_chunk),
        kp_pool=kp_pool, kp_channels=kp_channels, kp_convs=kp_convs,
        kp_samples=kp_samples, kp_eval_rois=kp_eval_rois,
        chunk=roi_chunk)


keypoint_rcnn.input_hw = (512, 512)
keypoint_rcnn.rpn_spec = FRCNN512_RPN_SPEC
keypoint_rcnn.family = "two_stage_kp"


def tinykp(x: jax.Array, num_classes: int = 2, *,
           train: bool = False, gt_boxes=None, gt_labels=None,
           kp_rois=None, num_keypoints: int = 4, width: int = 32,
           fc_dim: int = 64, pre_topk: int = 256, post_train: int = 128,
           post_eval: int = 64, num_samples: int = 64,
           fg_fraction: float = 0.25, kp_pool: int = 5,
           kp_channels: int = 16, kp_convs: int = 2,
           kp_samples: int = 16, kp_eval_rois: int = 16):
    """CPU-runnable Keypoint R-CNN smoke variant on the tinyfrcnn
    trunk: 128x128 input, 4 keypoints, 5 -> 20 heatmap resolution."""
    feats = _tiny_trunk(x, width=width)
    return _with_keypoints(
        x, num_classes, feats, 3, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, kp_rois=kp_rois,
        num_keypoints=num_keypoints,
        two_stage_kwargs=dict(
            rpn_spec=TINYFRCNN_RPN_SPEC, align_levels=3,
            fpn_channels=width * 2, fc_dim=fc_dim, pre_topk=pre_topk,
            post_train=post_train, post_eval=post_eval, nms_iou=0.7,
            num_samples=num_samples, fg_fraction=fg_fraction,
            fg_iou=0.5, out_size=5, chunk=64),
        kp_pool=kp_pool, kp_channels=kp_channels, kp_convs=kp_convs,
        kp_samples=kp_samples, kp_eval_rois=kp_eval_rois, chunk=64)


tinykp.input_hw = (128, 128)
tinykp.rpn_spec = TINYFRCNN_RPN_SPEC
tinykp.family = "two_stage_kp"
