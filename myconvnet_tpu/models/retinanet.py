"""RetinaNet: ResNet + FPN + weight-tied focal-loss heads, NHWC.

Beyond the reference inventory (SURVEY.md §2 lists cls/seg/GAN only) —
the second member of the detection family (Lin et al. 2017,
"Focal Loss for Dense Object Detection").  Architecture: a ResNet
backbone tapped at C3/C4/C5, a feature pyramid (lateral 1x1 + top-down
nearest 2x upsample + 3x3 smooth) extended with P6/P7 stride convs, and
two 4-deep 3x3-conv heads — classification (sigmoid, foreground classes
only, no background column) and box regression — whose weights are
SHARED across all five pyramid levels via ``nn.scope_shared``
(core/module.shared_scope).

TPU notes: every op is a dense conv or a nearest 2x upsample
(ops/resize.upsample2x_nearest — a reshape/broadcast, no gather); heads
emit [B, H, W, a*k] reshaped to the cell-major [B, A, k] anchor axis
matching ops.boxes.retina_anchors (octave-major, ratio-minor variant
order).  The classification head's final bias starts at
-log((1-pi)/pi), pi=0.01 — the paper's trick so the focal loss does
not blow up on step 0 with ~50k mostly-background anchors.
"""

from __future__ import annotations

from math import log

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.ops.boxes import RETINA512_SPEC
from myconvnet_tpu.ops.resize import upsample2x_nearest

ANCHORS_PER_CELL = 9  # 3 octaves x 3 ratios, all levels
_PRIOR_BIAS = -log((1.0 - 0.01) / 0.01)  # pi = 0.01


def _fpn(c3, c4, c5, ch, levels: int = 5):
    """Feature pyramid: [P3, P4, P5] (+ P6, P7 when ``levels == 5``)."""
    with nn.scope_named("fpn"):
        p5 = nn.conv(c5, ch, 1, name="lat5")
        p4 = nn.conv(c4, ch, 1, name="lat4") + upsample2x_nearest(p5)
        p3 = nn.conv(c3, ch, 1, name="lat3") + upsample2x_nearest(p4)
        p3 = nn.conv(p3, ch, 3, name="smooth3")
        p4 = nn.conv(p4, ch, 3, name="smooth4")
        p5 = nn.conv(p5, ch, 3, name="smooth5")
        if levels == 3:
            return [p3, p4, p5]
        # the paper: P6 = 3x3 s2 conv on C5; P7 = relu then 3x3 s2
        p6 = nn.conv(c5, ch, 3, stride=2, name="p6")
        p7 = nn.conv(nn.relu(p6), ch, 3, stride=2, name="p7")
    return [p3, p4, p5, p6, p7]


def _shared_head(fm, out_per_anchor, depth, ch, name, final_bias=0.0,
                 anchors_per_cell: int = ANCHORS_PER_CELL):
    """One weight-tied head applied to a pyramid level -> [B, H*W*a, k].

    No normalization layers (the paper's heads are plain conv+ReLU;
    weight-tied scopes must not carry BN state — see shared_scope)."""
    with nn.scope_shared(name):
        y = fm
        for i in range(depth):
            y = nn.relu(nn.conv(y, ch, 3, name=f"conv{i + 1}"))
        y = nn.conv(y, anchors_per_cell * out_per_anchor, 3, name="out",
                    w_init=init.normal(0.01),
                    b_init=init.constant(final_bias))
    b, h, w, _ = y.shape
    return y.reshape(b, h * w * anchors_per_cell, out_per_anchor)


def retinanet(x: jax.Array, num_classes: int = 21, *, train: bool = False,
              depth: int = 50, fpn_channels: int = 256,
              head_depth: int = 4, stem: str = "conv7"
              ) -> tuple[jax.Array, jax.Array]:
    """Returns (cls_logits [B, A, num_classes - 1], loc [B, A, 4]).

    ``num_classes`` INCLUDES background id 0 for API uniformity with
    ssd300, but the sigmoid head emits FOREGROUND logits only — pair
    with train.detection.focal_det_loss and
    make_postprocess(score_activation="sigmoid").  Input must be
    512x512 (pyramid sizes are asserted against the anchor spec).
    """
    with nn.scope_named("backbone"):
        _, c3, c4, c5 = resnet_backbone(x, depth, train=train, stem=stem,
                                        return_stages=True)
    feats = _fpn(c3, c4, c5, fpn_channels)
    sizes = tuple(f.shape[1] for f in feats)
    want = tuple(s[0] for s in RETINA512_SPEC)
    if sizes != want:
        raise ValueError(f"feature pyramid {sizes} != anchor spec {want} "
                         "— input must be 512x512")
    cls_out = [_shared_head(f, num_classes - 1, head_depth, fpn_channels,
                            "cls_head", final_bias=_PRIOR_BIAS)
               for f in feats]
    loc_out = [_shared_head(f, 4, head_depth, fpn_channels, "box_head")
               for f in feats]
    return (jnp.concatenate(cls_out, axis=1),
            jnp.concatenate(loc_out, axis=1))


retinanet.input_hw = (512, 512)
retinanet.anchor_spec = RETINA512_SPEC
retinanet.anchor_kind = "retina"
retinanet.head = "sigmoid_focal"


# CPU-runnable smoke variant: 128x128 input, 3 levels (16/8/4), tiny
# trunk, same weight-tied head structure.
TINYRETINA_SPEC = tuple(
    (fm, base, (0.0, 0.5), (0.5, 1.0, 2.0))
    for fm, base in ((16, 0.15), (8, 0.35), (4, 0.7)))
_TINY_APC = 6  # 2 octaves x 3 ratios


def tinyretina(x: jax.Array, num_classes: int = 21, *,
               train: bool = False, width: int = 32
               ) -> tuple[jax.Array, jax.Array]:
    """Small FPN + focal detector: (cls [B, A, C-1], loc [B, A, 4]),
    A = 6 * (16^2 + 8^2 + 4^2) = 2016."""
    with nn.scope_named("backbone"):
        c1 = nn.relu(nn.conv(x, width, 3, stride=2, name="c1"))      # 64
        c2 = nn.relu(nn.conv(c1, width, 3, stride=2, name="c2"))     # 32
        c3 = nn.relu(nn.conv(c2, width * 2, 3, stride=2, name="c3"))  # 16
        c4 = nn.relu(nn.conv(c3, width * 2, 3, stride=2, name="c4"))  # 8
        c5 = nn.relu(nn.conv(c4, width * 4, 3, stride=2, name="c5"))  # 4
    feats = _fpn(c3, c4, c5, width * 2, levels=3)
    sizes = tuple(f.shape[1] for f in feats)
    if sizes != tuple(s[0] for s in TINYRETINA_SPEC):
        raise ValueError(f"feature pyramid {sizes} does not match "
                         "TINYRETINA_SPEC — input must be 128x128")
    cls_out = [_shared_head(f, num_classes - 1, 1, width * 2, "cls_head",
                            final_bias=_PRIOR_BIAS,
                            anchors_per_cell=_TINY_APC)
               for f in feats]
    loc_out = [_shared_head(f, 4, 1, width * 2, "box_head",
                            anchors_per_cell=_TINY_APC)
               for f in feats]
    return (jnp.concatenate(cls_out, axis=1),
            jnp.concatenate(loc_out, axis=1))


tinyretina.input_hw = (128, 128)
tinyretina.anchor_spec = TINYRETINA_SPEC
tinyretina.anchor_kind = "retina"
tinyretina.head = "sigmoid_focal"
