"""Fast neural style transfer generator (twelfth task family —
the reference is cls/seg/GAN only, SURVEY.md §2; mount empty, §0).

Johnson et al. 2016 ("Perceptual Losses for Real-Time Style Transfer
and Super-Resolution") image-transformation network, TPU-shaped:

* NHWC convs with instance norm (Ulyanov et al. — the post-paper
  standard that replaced the original's batch norm) and ReLU.
* Downsample by strided conv x2, five residual blocks at 1/4
  resolution, upsample by **nearest-resize + conv** (Odena et al.'s
  checkerboard-free alternative to transposed conv; rides
  ``ops/resize.upsample2x_nearest`` — a reshape/broadcast, no gathers).
* Sigmoid output in [0, 1] — the same value space as the content
  input, so stylized batches drop straight into the image utilities.

fn(x [N,H,W,3] in [0,1]) -> [N,H,W,3] in [0,1]; H, W must be
multiples of 4 (two stride-2 stages).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.ops.resize import upsample2x_nearest


def _conv_in_relu(x, ch: int, k: int, *, stride: int = 1,
                  name: str = "conv"):
    with nn.scope_named(name):
        h = nn.conv(x, ch, k, stride=stride, use_bias=False,
                    name="conv")
        return nn.relu(nn.instance_norm(h))


def _res_block(x, ch: int):
    with nn.scope_named("res"):
        h = _conv_in_relu(x, ch, 3, name="c1")
        with nn.scope_named("c2"):
            h = nn.conv(h, ch, 3, use_bias=False, name="conv")
            h = nn.instance_norm(h)
        return x + h


def _upsample_block(x, ch: int, name: str):
    with nn.scope_named(name):
        x = upsample2x_nearest(x)
        h = nn.conv(x, ch, 3, use_bias=False, name="conv")
        return nn.relu(nn.instance_norm(h))


def transformer_net(x: jax.Array, *, width: int = 32,
                    n_res: int = 5, train: bool = False) -> jax.Array:
    """Johnson transformer net.  ``train`` is accepted for interface
    uniformity; instance norm has no train/eval split."""
    del train
    if x.shape[1] % 4 or x.shape[2] % 4:
        raise ValueError(f"input H/W must be multiples of 4, got "
                         f"{x.shape[1]}x{x.shape[2]}")
    h = _conv_in_relu(x, width, 9, name="stem")
    h = _conv_in_relu(h, 2 * width, 3, stride=2, name="down1")
    h = _conv_in_relu(h, 4 * width, 3, stride=2, name="down2")
    for _ in range(n_res):
        h = _res_block(h, 4 * width)
    h = _upsample_block(h, 2 * width, "up1")
    h = _upsample_block(h, width, "up2")
    with nn.scope_named("out"):
        h = nn.conv(h, 3, 9, name="conv")
    return jax.nn.sigmoid(h.astype(jnp.float32))


def tiny_transformer_net(x: jax.Array, *, width: int = 8,
                         n_res: int = 2, train: bool = False) -> jax.Array:
    """CPU smoke variant."""
    return transformer_net(x, width=width, n_res=n_res, train=train)
