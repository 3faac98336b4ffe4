"""FCOS: fully convolutional one-stage, ANCHOR-FREE detection.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN) —
Tian et al. 2019, the anchor-free paradigm completing the rebuild's
detector taxonomy (anchored one-stage: SSD/RetinaNet; two-stage:
the R-CNN family; anchor-free: this).  TPU notes:

* no anchor enumeration at all — every pyramid LOCATION regresses the
  four distances (l, t, r, b) to its object's sides, so the "grid" is
  just cell centers (``fcos_points``) and all target assignment is
  [L, M] broadcast arithmetic (train/fcos.py), no IoU matching;
* per-level scale ownership replaces anchor scales: a location only
  takes objects whose LONGEST regression distance falls in its
  level's band (the paper's m_i thresholds, here 4x the level stride
  so they generalize to any input size — with the paper's 8x and this
  model's stride-to-input ratios the coarsest band's lower bound
  would be 1.0 normalized, unreachable by any box, starving the
  coarsest level of positives);
* the heads are the RetinaNet towers with anchors_per_cell=1 plus a
  CENTERNESS logit on the regression tower (the v2 placement) — at
  inference the class score is multiplied by centerness, suppressing
  the low-quality far-from-center boxes that anchor-free heads
  otherwise emit;
* distances are predicted as softplus(raw) * 4 * stride * scale_i
  (a learnable per-level scalar, init 1) — positive by construction,
  initialized inside the level's band, no exp blow-ups in bf16.

Returns (cls_logits [B, L, C-1], ctr_logits [B, L], dists [B, L, 4]);
pair with train.fcos.make_fcos_step / make_fcos_postprocess.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import param
from myconvnet_tpu.models.faster_rcnn import _tiny_trunk
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.models.retinanet import (_PRIOR_BIAS, _fpn,
                                            _shared_head)

# (feature map size, normalized stride) per level; level i owns
# objects with max regression distance in (4*stride_{i-1}, 4*stride_i]
FCOS512_SPEC = ((64, 1 / 64), (32, 1 / 32), (16, 1 / 16), (8, 1 / 8),
                (4, 1 / 4))
TINYFCOS_SPEC = ((16, 1 / 16), (8, 1 / 8), (4, 1 / 4))


def fcos_points(spec) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell centers for a pyramid spec -> (points [L,2] normalized xy,
    ranges [L,2] (lo, hi] max-distance bands, strides [L])."""
    pts, ranges, strides = [], [], []
    prev_hi = 0.0
    for i, (fm, s) in enumerate(spec):
        c = (np.arange(fm, dtype=np.float32) + 0.5) * s
        xx, yy = np.meshgrid(c, c)
        p = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
        hi = np.inf if i == len(spec) - 1 else 4.0 * s
        pts.append(p)
        ranges.append(np.tile([[prev_hi, hi]], (fm * fm, 1)))
        strides.append(np.full(fm * fm, s, np.float32))
        prev_hi = hi
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(ranges).astype(np.float32),
            np.concatenate(strides))


def _fcos_heads(feats, spec, num_fg, head_depth, ch):
    cls_out, ctr_out, dist_out = [], [], []
    for i, f in enumerate(feats):
        cls_out.append(_shared_head(f, num_fg, head_depth, ch,
                                    "cls_head", final_bias=_PRIOR_BIAS,
                                    anchors_per_cell=1))
        # regression tower emits 4 distances + the centerness logit
        # (the v2 placement) from ONE weight-tied head
        reg = _shared_head(f, 5, head_depth, ch, "box_head",
                           anchors_per_cell=1)
        raw, ctr = reg[..., :4], reg[..., 4]
        with nn.scope_named(f"scale{i + 1}"):
            s = param("s", (), jnp.float32, init.ones)
        stride = spec[i][1]
        dist_out.append(jax.nn.softplus(raw) * (4.0 * stride) * s)
        ctr_out.append(ctr)
    return (jnp.concatenate(cls_out, axis=1),
            jnp.concatenate(ctr_out, axis=1),
            jnp.concatenate(dist_out, axis=1))


def fcos(x: jax.Array, num_classes: int = 21, *, train: bool = False,
         depth: int = 50, fpn_channels: int = 256, head_depth: int = 4,
         stem: str = "conv7"):
    """FCOS-R50-FPN, 512x512 input, P3-P7 (strides 8..128)."""
    with nn.scope_named("backbone"):
        _, c3, c4, c5 = resnet_backbone(x, depth, train=train,
                                        stem=stem, return_stages=True)
    feats = _fpn(c3, c4, c5, fpn_channels)
    sizes = tuple(f.shape[1] for f in feats)
    if sizes != tuple(s[0] for s in FCOS512_SPEC):
        raise ValueError(f"pyramid {sizes} != FCOS spec — input must "
                         "be 512x512")
    return _fcos_heads(feats, FCOS512_SPEC, num_classes - 1,
                       head_depth, fpn_channels)


fcos.input_hw = (512, 512)
fcos.point_spec = FCOS512_SPEC
fcos.family = "fcos"


def tinyfcos(x: jax.Array, num_classes: int = 21, *,
             train: bool = False, width: int = 32):
    """CPU-runnable anchor-free smoke variant: 128x128, 3 levels
    (16/8/4), L = 336 locations."""
    feats = _tiny_trunk(x, width=width)  # checked 16/8/4 pyramid
    return _fcos_heads(feats, TINYFCOS_SPEC, num_classes - 1, 2,
                       width * 2)


tinyfcos.input_hw = (128, 128)
tinyfcos.point_spec = TINYFCOS_SPEC
tinyfcos.family = "fcos"
