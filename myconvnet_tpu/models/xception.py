"""Aligned Xception (65-layer) — classifier and DeepLabv3+ backbone, NHWC.

The DeepLabv3+ paper's strongest backbone (Chollet's Xception modified
per Chen et al.: deeper entry flow, no max-pool — every downsample is a
strided separable conv — and BN+ReLU after each depthwise).  Exposed
both as an ImageNet classifier (``xception65``) and as the
``backbone="xception"`` option of ``models.deeplab_v3_plus``.

TPU notes: depthwise 3x3s run on the VPU; the pointwise 1x1s carry the
FLOPs as wide MXU matmuls.  ``output_stride`` < 32 converts the late
strides to dilation exactly like the ResNet backbone, so the ASPP sees
the same receptive-field contract.
"""

from __future__ import annotations

import jax

from myconvnet_tpu import nn


def _sep_conv(x, features, *, stride=1, dilation=1, train, relu_first,
              name):
    """Separable conv, DeepLab-aligned flavor: depthwise -> BN -> 1x1 ->
    BN (+ optional pre-ReLU, the modified-aligned ordering)."""
    with nn.scope_named(name):
        if relu_first:
            x = nn.relu(x)
        x = nn.depthwise_conv(x, 3, stride=stride, dilation=dilation,
                              name="dw")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn_dw")
        x = nn.relu(x)
        x = nn.conv(x, features, 1, use_bias=False, name="pw")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn_pw")
    return x


def _xception_block(x, features, *, stride=1, dilation=1, train,
                    skip_kind, relu_first, name):
    """Three separable convs + residual.  skip_kind: 'conv' (1x1-projected
    shortcut), 'sum' (identity), 'none'."""
    with nn.scope_named(name):
        h = x
        for i, f in enumerate(features):
            h = _sep_conv(h, f,
                          stride=stride if i == len(features) - 1 else 1,
                          dilation=dilation, train=train,
                          relu_first=relu_first, name=f"sep{i + 1}")
        if skip_kind == "conv":
            s = nn.conv(x, features[-1], 1, stride=stride, use_bias=False,
                        name="skip_conv")
            s = nn.batch_norm(s, train=train, momentum=0.9, eps=1e-3,
                              name="skip_bn")
            h = h + s
        elif skip_kind == "sum":
            h = h + x
    return h


def xception_backbone(x: jax.Array, *, train: bool = False,
                      output_stride: int = 32,
                      return_low_level: bool = False):
    """Returns the stride-``output_stride`` feature map (and the entry-
    flow stride-4 features for the DeepLab decoder)."""
    if output_stride not in (8, 16, 32):
        raise ValueError("output_stride must be 8, 16 or 32")
    with nn.scope_named("stem"):
        x = nn.conv(x, 32, 3, stride=2, use_bias=False, name="conv1")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn1")
        x = nn.relu(x)
        x = nn.conv(x, 64, 3, use_bias=False, name="conv2")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn2")
        x = nn.relu(x)
    # entry flow: stride 2 blocks to 4, 8, 16; current_stride tracks the
    # physical stride so output_stride converts the rest to dilation
    x = _xception_block(x, (128, 128, 128), stride=2, train=train,
                        skip_kind="conv", relu_first=False, name="entry1")
    low_level = x  # stride 4 — the DeepLab decoder tap
    current, rate = 4, 1

    def block_stride():
        """(stride, dilation) for the next nominally-stride-2 block:
        stride while the physical stride is below output_stride, then
        dilation doubling (the converted block itself keeps the
        pre-doubling rate, DeepLab convention)."""
        nonlocal current, rate
        if current >= output_stride:
            rate *= 2  # converted: dilate instead of stride
            return 1, rate // 2
        current *= 2
        return 2, 1

    s, d = block_stride()
    x = _xception_block(x, (256, 256, 256), stride=s, dilation=max(d, 1),
                        train=train, skip_kind="conv", relu_first=True,
                        name="entry2")
    s, d = block_stride()
    x = _xception_block(x, (728, 728, 728), stride=s, dilation=max(d, 1),
                        train=train, skip_kind="conv", relu_first=True,
                        name="entry3")
    # middle flow: 16 identity blocks at 728
    mid_rate = max(rate, 1)
    for i in range(16):
        x = _xception_block(x, (728, 728, 728), dilation=mid_rate,
                            train=train, skip_kind="sum", relu_first=True,
                            name=f"middle{i + 1}")
    # exit flow
    s, d = block_stride()
    x = _xception_block(x, (728, 1024, 1024), stride=s,
                        dilation=max(d, 1), train=train, skip_kind="conv",
                        relu_first=True, name="exit1")
    exit_rate = max(rate, 1)
    with nn.scope_named("exit2"):
        for i, f in enumerate((1536, 1536, 2048)):
            x = _sep_conv(x, f, dilation=exit_rate, train=train,
                          relu_first=False, name=f"sep{i + 1}")
            x = nn.relu(x)
    if return_low_level:
        return x, low_level
    return x


def xception65(x: jax.Array, num_classes: int = 1000, *,
               train: bool = False,
               dropout_rate: float = 0.5) -> jax.Array:
    feats = xception_backbone(x, train=train, output_stride=32)
    h = nn.gap(feats)
    h = nn.dropout(h, dropout_rate, train=train)
    return nn.dense(h, num_classes, name="logits")
