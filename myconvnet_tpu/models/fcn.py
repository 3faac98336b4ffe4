"""FCN segmentation head on a dilated ResNet backbone, NHWC.

Fully-convolutional networks (Long et al.) are the zoo's simplest
segmenter: backbone features -> 3x3 conv-BN-ReLU head -> 1x1 classifier
-> bilinear upsample to input resolution.  Complements DeepLabv3+
(SURVEY.md §2#3) as the light/fast option; shares the same dilated
``resnet_backbone`` (atrous late stages keep output_stride at 16 or 8
without losing the pretrained stride pattern).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.ops.resize import resize_bilinear


def fcn(x: jax.Array, num_classes: int = 21, *, train: bool = False,
        backbone_depth: int = 50, output_stride: int = 16,
        head_features: int = 512,
        dropout_rate: float = 0.1) -> jax.Array:
    """[N,H,W,C] -> per-pixel logits [N,H,W,num_classes]."""
    in_h, in_w = x.shape[1], x.shape[2]
    with nn.scope_named("backbone"):
        feats = resnet_backbone(x, backbone_depth, train=train,
                                output_stride=output_stride)
    with nn.scope_named("head"):
        y = nn.conv(feats, head_features, 3, use_bias=False, name="conv")
        y = nn.batch_norm(y, train=train, momentum=0.9, eps=1e-5,
                          name="bn")
        y = nn.relu(y)
        y = nn.dropout(y, dropout_rate, train=train)
        logits = nn.conv(y, num_classes, 1, name="logits")
    logits = resize_bilinear(logits, (in_h, in_w), align_corners=False)
    return logits.astype(jnp.float32)
