"""SSD300: single-shot detector on a VGG16 trunk, NHWC.

Beyond the reference inventory (SURVEY.md §2 lists classification /
segmentation / GAN only) — the detection task family on the same
substrate.  The layout follows the SSD paper: VGG16 through conv4_3
(38x38 for a 300 input), dilated fc6/fc7 as convs (19x19), then four
stride/VALID extra stages down to 1x1; six multibox heads emit
class scores and box regressions per anchor.

TPU notes: every head is a dense 3x3 conv (MXU); outputs concatenate to
the fixed [B, 8732, ...] anchor axis — static shapes, no gathers.  The
anchor grid itself lives in ``ops.boxes.ssd_anchors`` (a compile-time
constant), cell-major to match the heads' [H, W, a*k] channel layout.
BN (on by default) replaces the paper's L2Norm-on-conv4_3 trick — same
role (scale taming for the early head), standard op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn

# anchors per cell for the six maps — must match ops.boxes.SSD300_SPEC
# (2 + 2*len(ratios) each): 38^2*4 + 19^2*6 + ... = 8732.
ANCHORS_PER_CELL = (4, 6, 6, 6, 4, 4)
NUM_ANCHORS = 8732


def _conv_bn_relu(x, ch, k, *, stride=1, padding="SAME", dilation=1,
                  train, use_bn):
    x = nn.conv(x, ch, k, stride=stride, padding=padding,
                dilation=dilation, use_bias=not use_bn)
    if use_bn:
        x = nn.batch_norm(x, train=train)
    return nn.relu(x)


def _head(fm, a, k, name):
    """3x3 conv head -> [B, H*W*a, k] (cell-major, matching anchors)."""
    y = nn.conv(fm, a * k, 3, name=name)
    b, h, w, _ = y.shape
    return y.reshape(b, h * w * a, k)


def _vgg_trunk(x, train, use_bn):
    """VGG16 through dilated fc6/fc7 -> [conv4_3 map, fc7 map]."""
    feats = []
    for ch in (64, 64):
        x = _conv_bn_relu(x, ch, 3, train=train, use_bn=use_bn)
    x = nn.max_pool(x, 2, 2)
    for ch in (128, 128):
        x = _conv_bn_relu(x, ch, 3, train=train, use_bn=use_bn)
    x = nn.max_pool(x, 2, 2)
    for ch in (256, 256, 256):
        x = _conv_bn_relu(x, ch, 3, train=train, use_bn=use_bn)
    x = nn.max_pool(x, 2, 2)  # ceil via SAME: 75 -> 38
    for ch in (512, 512, 512):
        x = _conv_bn_relu(x, ch, 3, train=train, use_bn=use_bn)
    feats.append(x)  # conv4_3
    x = nn.max_pool(x, 2, 2)
    for ch in (512, 512, 512):
        x = _conv_bn_relu(x, ch, 3, train=train, use_bn=use_bn)
    # the paper keeps resolution here: pool5 is 3x3 stride 1
    x = nn.max_pool(x, 3, 1)
    with nn.scope_named("fc6"):
        x = _conv_bn_relu(x, 1024, 3, dilation=6, train=train,
                          use_bn=use_bn)
    with nn.scope_named("fc7"):
        x = _conv_bn_relu(x, 1024, 1, train=train, use_bn=use_bn)
    feats.append(x)
    return feats


def _ssd_vgg(x, num_classes, train, use_bn, extras, anchors_per_cell,
             expect_sizes, what):
    """Shared SSD-on-VGG assembly: trunk + extra stages + multibox
    heads, pyramid shape-checked against the anchor spec."""
    with nn.scope_named("backbone"):
        feats = _vgg_trunk(x, train, use_bn)
    x = feats[-1]
    with nn.scope_named("extras"):
        for i, (mid, out, stride, padding) in enumerate(extras):
            with nn.scope_named(f"stage{i + 8}"):
                x = _conv_bn_relu(x, mid, 1, train=train, use_bn=use_bn)
                x = _conv_bn_relu(x, out, 3, stride=stride,
                                  padding=padding, train=train,
                                  use_bn=use_bn)
            feats.append(x)
    sizes = tuple(f.shape[1] for f in feats)
    if sizes != expect_sizes:
        raise ValueError(f"feature pyramid {sizes} does not match the "
                         f"{what} anchor spec — expected {expect_sizes}")
    cls_out, loc_out = [], []
    with nn.scope_named("heads"):
        for i, (fm, a) in enumerate(zip(feats, anchors_per_cell)):
            cls_out.append(_head(fm, a, num_classes, f"cls{i + 1}"))
            loc_out.append(_head(fm, a, 4, f"loc{i + 1}"))
    return (jnp.concatenate(cls_out, axis=1),
            jnp.concatenate(loc_out, axis=1))


def ssd300(x: jax.Array, num_classes: int = 21, *, train: bool = False,
           use_bn: bool = True) -> tuple[jax.Array, jax.Array]:
    """Returns (cls_logits [B, 8732, num_classes], loc [B, 8732, 4]).

    ``num_classes`` INCLUDES background at index 0 (VOC: 20 + 1).
    Input must be 300x300 (the feature-pyramid sizes are asserted
    against the anchor spec at trace time).
    """
    return _ssd_vgg(
        x, num_classes, train, use_bn,
        extras=[(256, 512, 2, "SAME"),    # 19 -> 10
                (128, 256, 2, "SAME"),    # 10 -> 5
                (128, 256, 1, "VALID"),   # 5 -> 3
                (128, 256, 1, "VALID")],  # 3 -> 1
        anchors_per_cell=ANCHORS_PER_CELL,
        expect_sizes=(38, 19, 10, 5, 3, 1), what="SSD300")


def ssd512(x: jax.Array, num_classes: int = 21, *, train: bool = False,
           use_bn: bool = True) -> tuple[jax.Array, jax.Array]:
    """The paper's larger model: 512x512 input, seven pyramid maps
    (64..1), 24564 anchors -> (cls [B, 24564, C], loc [B, 24564, 4])."""
    return _ssd_vgg(
        x, num_classes, train, use_bn,
        extras=[(256, 512, 2, "SAME"),   # 32 -> 16
                (128, 256, 2, "SAME"),   # 16 -> 8
                (128, 256, 2, "SAME"),   # 8 -> 4
                (128, 256, 2, "SAME"),   # 4 -> 2
                (128, 256, 2, "SAME")],  # 2 -> 1
        anchors_per_cell=(4, 6, 6, 6, 6, 4, 4),
        expect_sizes=(64, 32, 16, 8, 4, 2, 1), what="SSD512")


# recipe wiring metadata (recipes.build_detector reads these to pick
# the anchor grid and the input resolution): the canonical paper specs
# live with the anchor code (ops/boxes.py).
from myconvnet_tpu.ops.boxes import SSD300_SPEC, SSD512_SPEC  # noqa: E402

ssd300.input_hw = (300, 300)
ssd300.anchor_spec = SSD300_SPEC
ssd512.input_hw = (512, 512)
ssd512.anchor_spec = SSD512_SPEC


# Tinydet: the CPU-runnable smoke detector — the detection analogue of
# models/smallnet.py.  96x96 input, three pyramid levels (12/6/3), 4
# anchors per cell -> 756 anchors.
TINYDET_SPEC = (
    (12, 0.10, 0.25, (2.0,)),
    (6, 0.25, 0.50, (2.0,)),
    (3, 0.50, 0.80, (2.0,)),
)


def tinydet(x: jax.Array, num_classes: int = 21, *, train: bool = False,
            use_bn: bool = True, width: int = 32
            ) -> tuple[jax.Array, jax.Array]:
    """Small single-shot detector: (cls [B, 756, C], loc [B, 756, 4])."""
    feats = []
    with nn.scope_named("backbone"):
        x = _conv_bn_relu(x, width, 3, stride=2, train=train,
                          use_bn=use_bn)          # 48
        x = _conv_bn_relu(x, width * 2, 3, stride=2, train=train,
                          use_bn=use_bn)          # 24
        x = _conv_bn_relu(x, width * 2, 3, train=train, use_bn=use_bn)
        x = _conv_bn_relu(x, width * 4, 3, stride=2, train=train,
                          use_bn=use_bn)          # 12
        feats.append(x)
        x = _conv_bn_relu(x, width * 4, 3, stride=2, train=train,
                          use_bn=use_bn)          # 6
        feats.append(x)
        x = _conv_bn_relu(x, width * 4, 3, stride=2, train=train,
                          use_bn=use_bn)          # 3
        feats.append(x)
    sizes = tuple(f.shape[1] for f in feats)
    if sizes != tuple(s[0] for s in TINYDET_SPEC):
        raise ValueError(f"feature pyramid {sizes} does not match "
                         "TINYDET_SPEC — input must be 96x96")
    cls_out, loc_out = [], []
    with nn.scope_named("heads"):
        for i, fm in enumerate(feats):
            cls_out.append(_head(fm, 4, num_classes, f"cls{i + 1}"))
            loc_out.append(_head(fm, 4, 4, f"loc{i + 1}"))
    return (jnp.concatenate(cls_out, axis=1),
            jnp.concatenate(loc_out, axis=1))


tinydet.input_hw = (96, 96)
tinydet.anchor_spec = TINYDET_SPEC
