"""PSPNet (pyramid scene parsing), NHWC.

The third classic of the segmentation zoo (Zhao et al.) next to
DeepLabv3+ and FCN (SURVEY.md §2#3): dilated backbone at output_stride 8
-> Pyramid Pooling Module (adaptive average pools at 1/2/3/6 bins, each
projected and upsampled back) -> fused conv head -> bilinear to input.

TPU notes: the PPM's adaptive pools use the matmul-form
``ops.adaptive_avg_pool2d`` (per-axis bin-membership matrices — zero
gathers, fuses like the bilinear resize), and each pyramid branch's 1x1
projection is a wide MXU matmul over a tiny grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.ops.resize import resize_bilinear


def _conv_bn_relu(x, features, kernel, *, train, name):
    return nn.conv_bn_relu(x, features, kernel, train=train, name=name)


def pyramid_pooling(x: jax.Array, *, bins=(1, 2, 3, 6), train: bool,
                    name: str = "ppm") -> jax.Array:
    """PPM: each bin level pools -> 1x1 conv (C/len(bins)) -> upsample;
    concat with the input features."""
    c = x.shape[-1]
    branch_c = max(c // len(bins), 1)
    outs = [x]
    with nn.scope_named(name):
        for b in bins:
            with nn.scope_named(f"bin{b}"):
                p = nn.adaptive_avg_pool(x, b)
                p = _conv_bn_relu(p, branch_c, 1, train=train,
                                  name="project")
                p = resize_bilinear(p, (x.shape[1], x.shape[2]),
                                    align_corners=False).astype(x.dtype)
            outs.append(p)
    return jnp.concatenate(outs, axis=-1)


def pspnet(x: jax.Array, num_classes: int = 21, *, train: bool = False,
           backbone_depth: int = 50, output_stride: int = 8,
           head_features: int = 512,
           dropout_rate: float = 0.1) -> jax.Array:
    """[N,H,W,C] -> per-pixel logits [N,H,W,num_classes]."""
    in_h, in_w = x.shape[1], x.shape[2]
    with nn.scope_named("backbone"):
        feats = resnet_backbone(x, backbone_depth, train=train,
                                output_stride=output_stride)
    y = pyramid_pooling(feats, train=train)
    y = _conv_bn_relu(y, head_features, 3, train=train, name="head")
    y = nn.dropout(y, dropout_rate, train=train)
    logits = nn.conv(y, num_classes, 1, name="logits")
    logits = resize_bilinear(logits, (in_h, in_w), align_corners=False)
    return logits.astype(jnp.float32)
