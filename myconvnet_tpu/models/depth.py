"""Monocular depth estimation models (fourteenth task family — the
reference is a classification/segmentation/GAN framework, SURVEY.md
§2; mount empty, §0).

* :func:`depth_unet` — a DispNet-style encoder-decoder (the
  supervised single-frame architecture popularized by monodepth2,
  Godard et al. 2019, with the skip topology of U-Net): ResNet
  encoder stages [C2..C5] (strides 4/8/16/32), top-down decoder of
  bilinear-upsample + conv + skip-concat blocks (no transposed convs
  — checkerboard-free, and `ops/resize.py`'s matmul-form bilinear
  rides the MXU), sigmoid disparity head.
* Output parameterization is INVERSE depth (the standard monocular
  choice: near pixels get high resolution, the sigmoid saturates at
  far range): ``disp = 1/max_depth + s * (1/min_depth - 1/max_depth)``
  with ``s = sigmoid(head)``, returned as ``depth = 1/disp`` in
  meters, shape ``[N, H, W, 1]``, f32.
* :func:`tinydepth` — CPU-runnable smoke variant (plain conv
  encoder at 1/8 resolution; same head contract).

TPU mapping: everything is convs + matmul-form resizes (one fused
XLA program with the loss/optimizer in the jitted step); no gathers,
no dynamic shapes.  BN is the default norm (batch-independent
GroupNorm available via ``norm=``, matching the ResNet zoo surface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.models.resnet import resnet_backbone
from myconvnet_tpu.ops.resize import resize_bilinear


def _up_block(x, skip, features, train, norm, name):
    """Bilinear 2x upsample + conv, concat the encoder skip, conv."""
    with nn.scope_named(name):
        n, h, w, _ = x.shape
        x = nn.conv(x, features, 3, use_bias=False, name="conv_pre")
        x = nn.relu(nn.batch_norm(x, train=train, name="bn_pre")
                    if norm == "batch" else
                    nn.group_norm(x, groups=8, name="gn_pre"))
        x = resize_bilinear(x, (2 * h, 2 * w))
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = nn.conv(x, features, 3, use_bias=False, name="conv_post")
        x = nn.relu(nn.batch_norm(x, train=train, name="bn_post")
                    if norm == "batch" else
                    nn.group_norm(x, groups=8, name="gn_post"))
    return x


def _disp_head(x, min_depth, max_depth, name="disp"):
    """1-channel sigmoid head -> metric depth via inverse-depth."""
    s = nn.sigmoid(nn.conv(x, 1, 3, name=name).astype(jnp.float32))
    d_min, d_max = 1.0 / max_depth, 1.0 / min_depth
    disp = d_min + s * (d_max - d_min)
    return 1.0 / disp


def depth_unet(x: jax.Array, num_classes: int = 0, *,
               train: bool = False, depth: int = 18,
               min_depth: float = 0.1, max_depth: float = 10.0,
               decoder_width: int = 32, norm: str = "batch",
               stem: str = "conv7") -> jax.Array:
    """ResNet-encoder DispNet: ``[N, H, W, 3]`` -> ``[N, H, W, 1]``
    metric depth (meters, f32).  ``num_classes`` is unused (dense
    regression) — kept for the uniform model signature.

    ``depth`` selects the ResNet encoder (18/34/50...); decoder
    channel widths follow monodepth2's (16,32,64,128,256) scaled by
    ``decoder_width/32``.
    """
    del num_classes
    h_in, w_in = x.shape[1], x.shape[2]
    if h_in % 32 or w_in % 32:
        raise ValueError(
            f"depth_unet needs input_hw divisible by 32 (the encoder's "
            f"total stride; the skip concats misalign otherwise), got "
            f"({h_in}, {w_in})")
    stages = resnet_backbone(x, depth, train=train, stem=stem,
                             norm=norm, return_stages=True)
    c2, c3, c4, c5 = stages                     # strides 4, 8, 16, 32
    k = decoder_width / 32.0
    widths = [int(w * k) for w in (256, 128, 64, 32, 16)]
    with nn.scope_named("decoder"):
        h = _up_block(c5, c4, widths[0], train, norm, "up1")   # s16
        h = _up_block(h, c3, widths[1], train, norm, "up2")    # s8
        h = _up_block(h, c2, widths[2], train, norm, "up3")    # s4
        h = _up_block(h, None, widths[3], train, norm, "up4")  # s2
        h = _up_block(h, None, widths[4], train, norm, "up5")  # s1
        return _disp_head(h, min_depth, max_depth)


def tinydepth(x: jax.Array, num_classes: int = 0, *,
              train: bool = False, width: int = 8,
              min_depth: float = 0.1,
              max_depth: float = 10.0) -> jax.Array:
    """CPU smoke variant: 3-level plain conv encoder-decoder."""
    del num_classes
    if x.shape[1] % 8 or x.shape[2] % 8:
        raise ValueError(f"tinydepth needs input_hw divisible by 8, "
                         f"got ({x.shape[1]}, {x.shape[2]})")
    e1 = nn.relu(nn.conv(x, width, 3, stride=2, name="enc1"))      # s2
    e2 = nn.relu(nn.conv(e1, 2 * width, 3, stride=2, name="enc2"))  # s4
    e3 = nn.relu(nn.conv(e2, 4 * width, 3, stride=2, name="enc3"))  # s8
    h = nn.relu(nn.conv(e3, 4 * width, 3, name="mid"))
    n, hh, ww, _ = h.shape
    h = resize_bilinear(h, (2 * hh, 2 * ww))
    h = nn.relu(nn.conv(jnp.concatenate([h, e2.astype(h.dtype)], -1),
                        2 * width, 3, name="dec1"))                # s4
    h = resize_bilinear(h, (4 * hh, 4 * ww))
    h = nn.relu(nn.conv(jnp.concatenate([h, e1.astype(h.dtype)], -1),
                        width, 3, name="dec2"))                    # s2
    h = resize_bilinear(h, (8 * hh, 8 * ww))
    h = nn.relu(nn.conv(h, width, 3, name="dec3"))                 # s1
    return _disp_head(h, min_depth, max_depth)
