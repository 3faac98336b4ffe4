"""DeepLabv3+ semantic segmentation, NHWC (BASELINE config #4).

Rebuild of the reference's DeepLabv3+ `_build_model` (SURVEY.md §2#3,
§3.4): ResNet backbone run at ``output_stride`` 16 (or 8) via dilated late
stages, ASPP with parallel atrous branches + image-level pooling, a
low-level-feature decoder, and bilinear upsampling back to input
resolution.

TPU notes:
* atrous conv = ``rhs_dilation`` on ``conv_general_dilated`` — same MXU
  kernels as dense conv, no im2col blowup (SURVEY §7 hard-part #6).
* bilinear upsampling uses the matmul-form resize in ``ops.resize``
  (gather-free; fuses with the surrounding convs' epilogues).
* image-level pooling broadcasts a 1x1 global feature — XLA turns the
  concat+1x1-conv over the 5 ASPP branches into one wide matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.ops.resize import resize_bilinear


def _conv_bn_relu(x, features, kernel, *, dilation=1, train, name):
    return nn.conv_bn_relu(x, features, kernel, dilation=dilation,
                           train=train, name=name)


def aspp(x: jax.Array, *, features: int = 256,
         rates: tuple[int, ...] = (6, 12, 18), train: bool) -> jax.Array:
    """Atrous Spatial Pyramid Pooling."""
    branches = [_conv_bn_relu(x, features, 1, train=train, name="aspp_1x1")]
    for i, rate in enumerate(rates):
        branches.append(_conv_bn_relu(x, features, 3, dilation=rate,
                                      train=train, name=f"aspp_rate{rate}"))
    # image-level pooling branch
    with nn.scope_named("aspp_pool"):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pooled = pooled.astype(x.dtype)
        pooled = nn.conv(pooled, features, 1, use_bias=False, name="conv")
        pooled = nn.batch_norm(pooled, train=train, momentum=0.9, eps=1e-5,
                               name="bn")
        pooled = nn.relu(pooled)
        pooled = jnp.broadcast_to(pooled,
                                  (x.shape[0], x.shape[1], x.shape[2],
                                   features))
    branches.append(pooled)
    y = jnp.concatenate(branches, axis=-1)
    return _conv_bn_relu(y, features, 1, train=train, name="aspp_project")


def deeplab_v3_plus(x: jax.Array, num_classes: int = 21, *,
                    train: bool = False, backbone: str = "resnet",
                    backbone_depth: int = 50,
                    output_stride: int = 16,
                    aspp_features: int = 256,
                    decoder_low_features: int = 48) -> jax.Array:
    """Returns per-pixel logits at input resolution [N,H,W,num_classes].

    ``backbone``: "resnet" (depth via ``backbone_depth``) or "xception"
    (the paper's aligned Xception-65, models/xception.py).
    """
    in_h, in_w = x.shape[1], x.shape[2]
    rates = (6, 12, 18) if output_stride == 16 else (12, 24, 36)

    with nn.scope_named("backbone"):
        if backbone == "xception":
            from myconvnet_tpu.models.xception import xception_backbone
            feats, low_level = xception_backbone(
                x, train=train, output_stride=output_stride,
                return_low_level=True)
        elif backbone == "resnet":
            feats, low_level = resnet_backbone(
                x, backbone_depth, train=train,
                output_stride=output_stride, return_low_level=True)
        else:
            raise ValueError(f"unknown backbone {backbone!r}")

    y = aspp(feats, features=aspp_features, rates=rates, train=train)
    y = nn.dropout(y, 0.1, train=train)

    # decoder: upsample x4 to low-level resolution, fuse, refine
    with nn.scope_named("decoder"):
        low = _conv_bn_relu(low_level, decoder_low_features, 1, train=train,
                            name="low_level_project")
        y = resize_bilinear(y, (low.shape[1], low.shape[2]),
                            align_corners=False).astype(low.dtype)
        y = jnp.concatenate([y, low], axis=-1)
        y = _conv_bn_relu(y, aspp_features, 3, train=train, name="refine1")
        y = _conv_bn_relu(y, aspp_features, 3, train=train, name="refine2")
        logits = nn.conv(y, num_classes, 1, name="logits")

    logits = resize_bilinear(logits, (in_h, in_w), align_corners=False)
    return logits.astype(jnp.float32)
