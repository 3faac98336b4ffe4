"""Mask R-CNN: instance segmentation on the two-stage stack.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN) — He
et al. 2017 on the rebuild's Faster R-CNN assembly
(models/faster_rcnn.py), keeping every static-shape discipline of the
two-stage design and adding the mask branch as more MXU work:

* mask-training targets are bilinear crops of per-RoI binary
  indicators from an instance-id map, computed as two einsums per RoI
  (ops/roi.crop_instance_masks) — no gathers, no host work; the
  instance map rides the data pipeline exactly like a segmentation
  mask ([B,H,W] int, 0 background, instance k stored as k+1);
* the train-time mask subsample (``mask_samples`` RoIs, positives
  first) is one ``lax.top_k`` over boosted random priorities — the
  same trick as the RoI subsample;
* at detection time the mask branch re-runs on the POST-NMS boxes
  (the Detectron convention — masks predicted on refined boxes score
  better than proposal-box masks): call the model with ``mask_rois=``
  and it returns the mask logits for exactly those boxes.

Head convention (torchvision-shaped): ``mask_convs`` 3x3 convs at
``mask_channels`` -> 2x deconv -> 1x1 to C-1 per-class sigmoid mask
logits at twice the mask RoIAlign resolution; the loss reads only the
target class's channel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import next_rng_key
from myconvnet_tpu.models.faster_rcnn import (FRCNN512_RPN_SPEC,
                                              TINYFRCNN_RPN_SPEC,
                                              _frcnn512_trunk,
                                              _tiny_trunk, _two_stage)
from myconvnet_tpu.ops import roi as roi_ops


class MaskRCNNOut(NamedTuple):
    """FRCNNOut's fields (by name — train/rcnn.py losses and
    make_rcnn_postprocess read attributes, not types) plus the mask
    branch.  Sm = mask_samples (train) or mask_eval_rois (eval);
    p = 2 * mask RoIAlign size; F = num_classes - 1."""
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
    mask_logits: jax.Array     # [B, Sm, p, p, F]
    mask_rois: jax.Array       # [B, Sm, 4]
    mask_labels: jax.Array     # [B, Sm]  target class (1..C-1)
    mask_gt: jax.Array         # [B, Sm]  matched gt instance row
    mask_valid: jax.Array      # [B, Sm]  bool — positives only


def _mask_head(crops, num_fg, channels, convs):
    """[B,Sm,p,p,C'] -> [B,Sm,2p,2p,num_fg] per-class mask logits."""
    b, s, p = crops.shape[:3]
    h = crops.reshape(b * s, p, p, crops.shape[-1])
    with nn.scope_named("mask_head"):
        for i in range(convs):
            h = nn.relu(nn.conv(h, channels, 3, name=f"conv{i + 1}"))
        h = nn.relu(nn.conv_transpose(h, channels, 2, stride=2,
                                      w_init=init.he_normal(),
                                      name="deconv"))
        h = nn.conv(h, num_fg, 1, name="logits",
                    w_init=init.normal(0.01))
    return h.reshape(b, s, 2 * p, 2 * p, num_fg)


def _mask_branch(feats, align_levels, rois, num_fg, *, channels, convs,
                 pool, chunk):
    crops = roi_ops.multilevel_roi_align(feats[:align_levels], rois,
                                         out_size=pool, chunk=chunk)
    return _mask_head(crops, num_fg, channels, convs)


def _select_mask_rois(out, mask_samples):
    """Subsample the box head's RoIs for the mask branch: positives
    first (random order), then whatever fills the quota (mask_valid
    marks the positives — only they carry loss)."""
    B = out.rois.shape[0]
    rand = jax.random.uniform(next_rng_key(), out.roi_pos.shape)
    prio = jnp.where(out.roi_pos, rand + 2.0,
                     jnp.where(out.roi_valid, rand, -jnp.inf))
    _, sel = jax.lax.top_k(prio, mask_samples)
    take = lambda t: jnp.take_along_axis(t, sel, axis=1)  # noqa: E731
    rois = jnp.take_along_axis(out.rois, sel[..., None], axis=1)
    return (rois, take(out.roi_labels), take(out.roi_gt),
            take(out.roi_pos))


def _with_masks(x, num_classes, feats, align_levels, *, train, gt_boxes,
                gt_labels, mask_rois, two_stage_kwargs, mask_pool,
                mask_channels, mask_convs, mask_samples, mask_eval_rois,
                chunk):
    """Shared Mask R-CNN second half over a built pyramid."""
    num_fg = num_classes - 1
    if mask_rois is not None:
        # detection-time pass: trunk + mask branch only (RPN/box-head
        # params exist but go unused in this trace)
        return _mask_branch(feats, align_levels, mask_rois, num_fg,
                            channels=mask_channels, convs=mask_convs,
                            pool=mask_pool, chunk=chunk)
    out = _two_stage(x, num_classes, train=train, gt_boxes=gt_boxes,
                     gt_labels=gt_labels, feats=feats, **two_stage_kwargs)
    if train and gt_boxes is not None:
        m_rois, m_labels, m_gt, m_valid = _select_mask_rois(
            out, mask_samples)
    else:
        n = min(mask_eval_rois, out.rois.shape[1])
        m_rois = out.rois[:, :n]
        m_valid = out.roi_valid[:, :n]
        m_labels = jnp.zeros((x.shape[0], n), jnp.int32)
        m_gt = jnp.zeros((x.shape[0], n), jnp.int32)
    mask_logits = _mask_branch(feats, align_levels, m_rois, num_fg,
                               channels=mask_channels, convs=mask_convs,
                               pool=mask_pool, chunk=chunk)
    return MaskRCNNOut(*out, mask_logits, m_rois, m_labels, m_gt,
                       m_valid)


def mask_rcnn(x: jax.Array, num_classes: int = 21, *,
              train: bool = False, gt_boxes=None, gt_labels=None,
              mask_rois=None, depth: int = 50, fpn_channels: int = 256,
              fc_dim: int = 1024, stem: str = "conv7",
              pre_topk: int = 2000, post_train: int = 1000,
              post_eval: int = 300, rpn_nms_iou: float = 0.7,
              num_samples: int = 512, fg_fraction: float = 0.25,
              fg_iou: float = 0.5, roi_chunk: int = 32,
              mask_pool: int = 14, mask_channels: int = 256,
              mask_convs: int = 4, mask_samples: int = 128,
              mask_eval_rois: int = 100):
    """Mask R-CNN, ResNet-FPN trunk, 512x512 input.

    Modes: train with gt -> MaskRCNNOut with in-forward sampled RoIs +
    mask logits for ``mask_samples`` of them (positives first); eval ->
    MaskRCNNOut with masks on the top ``mask_eval_rois`` proposals;
    ``mask_rois=[B,D,4]`` -> just the mask logits [B,D,2p,2p,C-1] for
    those boxes (the post-NMS detection pass).  Pair with
    train.rcnn.make_mask_rcnn_step / make_rcnn_postprocess /
    make_mask_predict.
    """
    feats = _frcnn512_trunk(x, train=train, depth=depth,
                            fpn_channels=fpn_channels, stem=stem)
    return _with_masks(
        x, num_classes, feats, 3, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, mask_rois=mask_rois,
        two_stage_kwargs=dict(
            rpn_spec=FRCNN512_RPN_SPEC, align_levels=3,
            fpn_channels=fpn_channels, fc_dim=fc_dim, pre_topk=pre_topk,
            post_train=post_train, post_eval=post_eval,
            nms_iou=rpn_nms_iou, num_samples=num_samples,
            fg_fraction=fg_fraction, fg_iou=fg_iou, out_size=7,
            chunk=roi_chunk),
        mask_pool=mask_pool, mask_channels=mask_channels,
        mask_convs=mask_convs, mask_samples=mask_samples,
        mask_eval_rois=mask_eval_rois, chunk=roi_chunk)


mask_rcnn.input_hw = (512, 512)
mask_rcnn.rpn_spec = FRCNN512_RPN_SPEC
mask_rcnn.family = "two_stage_mask"


def tinymask(x: jax.Array, num_classes: int = 21, *,
             train: bool = False, gt_boxes=None, gt_labels=None,
             mask_rois=None, width: int = 32, fc_dim: int = 64,
             pre_topk: int = 256, post_train: int = 128,
             post_eval: int = 64, num_samples: int = 64,
             fg_fraction: float = 0.25, mask_pool: int = 5,
             mask_channels: int = 16, mask_convs: int = 2,
             mask_samples: int = 16, mask_eval_rois: int = 16):
    """CPU-runnable Mask R-CNN smoke variant on the tinyfrcnn trunk:
    128x128 input, 5x5 box pool, 5->10 mask resolution."""
    feats = _tiny_trunk(x, width=width)
    return _with_masks(
        x, num_classes, feats, 3, train=train, gt_boxes=gt_boxes,
        gt_labels=gt_labels, mask_rois=mask_rois,
        two_stage_kwargs=dict(
            rpn_spec=TINYFRCNN_RPN_SPEC, align_levels=3,
            fpn_channels=width * 2, fc_dim=fc_dim, pre_topk=pre_topk,
            post_train=post_train, post_eval=post_eval, nms_iou=0.7,
            num_samples=num_samples, fg_fraction=fg_fraction,
            fg_iou=0.5, out_size=5, chunk=64),
        mask_pool=mask_pool, mask_channels=mask_channels,
        mask_convs=mask_convs, mask_samples=mask_samples,
        mask_eval_rois=mask_eval_rois, chunk=64)


tinymask.input_hw = (128, 128)
tinymask.rpn_spec = TINYFRCNN_RPN_SPEC
tinymask.family = "two_stage_mask"
