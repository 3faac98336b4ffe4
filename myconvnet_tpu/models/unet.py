"""U-Net semantic segmentation, NHWC.

The reference's segmentation family (SURVEY.md §2#3) centers on
DeepLabv3+, but the encoder-decoder-with-skips shape is the other
canonical member of the era's segmentation zoo (Ronneberger et al.) —
and this rebuild already ships its GAN twin as the pix2pix generator
(``models/gan.py``).  This is the *segmentation* U-Net: double
conv-BN-ReLU blocks, maxpool downsampling, bilinear-upsample + concat
decoder, per-pixel logits at input resolution.

TPU notes:
* upsampling uses the matmul-form ``ops.resize`` (gather-free, fuses
  into the adjacent convs) instead of transposed convs — no
  checkerboard artifacts and no stride-2 scatter patterns that XLA
  lowers poorly on the MXU.
* channel widths stay multiples of the 128-lane register tile from
  ``base_features=32`` upward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.ops.resize import resize_bilinear


def _double_conv(x, features, *, train, name):
    with nn.scope_named(name):
        for i in (1, 2):
            x = nn.conv(x, features, 3, use_bias=False, name=f"conv{i}")
            x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-5,
                              name=f"bn{i}")
            x = nn.relu(x)
    return x


def unet(x: jax.Array, num_classes: int = 21, *, train: bool = False,
         base_features: int = 64, depth: int = 4) -> jax.Array:
    """[N,H,W,C] -> per-pixel logits [N,H,W,num_classes].

    ``depth`` pooling stages halve the resolution each (H, W must be
    divisible by 2**depth); features double per stage.
    """
    assert x.shape[1] % (1 << depth) == 0 and \
        x.shape[2] % (1 << depth) == 0, \
        f"input {x.shape[1]}x{x.shape[2]} not divisible by {1 << depth}"
    skips = []
    feats = base_features
    for level in range(depth):
        x = _double_conv(x, feats, train=train, name=f"down{level}")
        skips.append(x)
        x = nn.max_pool(x, 2, stride=2)
        feats *= 2

    x = _double_conv(x, feats, train=train, name="bottleneck")

    for level in reversed(range(depth)):
        feats //= 2
        skip = skips[level]
        x = resize_bilinear(x, (skip.shape[1], skip.shape[2]),
                            align_corners=False).astype(skip.dtype)
        with nn.scope_named(f"up{level}"):
            x = nn.conv(x, feats, 1, use_bias=False, name="reduce")
        x = jnp.concatenate([x, skip], axis=-1)
        x = _double_conv(x, feats, train=train, name=f"up{level}_refine")

    logits = nn.conv(x, num_classes, 1, name="logits")
    return logits.astype(jnp.float32)
