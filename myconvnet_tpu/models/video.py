"""Video classification models (ninth task family — the reference is
image-only, SURVEY.md §2; mount empty, §0).

* :func:`r3d_18` — 3-D ResNet-18 (Tran et al., 2018; torchvision's
  ``r3d_18`` topology): full 3x3x3 convs, stages 64/128/256/512.
* :func:`r2plus1d_18` — the decomposed R(2+1)D variant: every 3-D conv
  factors into a (1,3,3) spatial conv to an intermediate width M and a
  (3,1,1) temporal conv, with M chosen to match the 3-D parameter
  count (the paper's formula).  On TPU this is usually the better
  mapping: two MXU contractions that are individually denser relative
  to their IO than one 27-tap conv.
* :func:`tinyvideo` — CPU-runnable smoke variant.

Input: [N, T, H, W, 3] floats (normalized clips, NDHWC).  All convs
ride ``ops/conv3d.py``; BN/dense reuse the rank-agnostic ``nn``
helpers.  Parameter counts match torchvision (r3d_18: 33.4M).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.ops.conv3d import global_avg_pool3d


def _bn_relu(x, *, train, name="bn"):
    return nn.relu(nn.batch_norm(x, train=train, name=name))


def _conv2plus1d(x, out_ch: int, *, stride, train, name="c21d"):
    """(1,3,3) spatial -> BN/ReLU -> (3,1,1) temporal, intermediate
    width M = (3*3*3*Cin*Cout) // (3*3*Cin + 3*Cout) (Tran et al.)."""
    cin = x.shape[-1]
    mid = (3 * 3 * 3 * cin * out_ch) // (3 * 3 * cin + 3 * out_ch)
    sd, sh, sw = stride
    with nn.scope_named(name):
        x = nn.conv3d(x, mid, (1, 3, 3), stride=(1, sh, sw),
                      use_bias=False, name="spatial")
        x = _bn_relu(x, train=train, name="mid_bn")
        x = nn.conv3d(x, out_ch, (3, 1, 1), stride=(sd, 1, 1),
                      use_bias=False, name="temporal")
    return x


def _conv3x3x3(x, out_ch: int, *, stride, train, name="conv"):
    del train
    return nn.conv3d(x, out_ch, 3, stride=stride, use_bias=False,
                     name=name)


def _basic_block(x, out_ch: int, *, stride, conv_fn, train):
    with nn.scope_named("block"):
        identity = x
        h = conv_fn(x, out_ch, stride=stride, train=train, name="conv1")
        h = _bn_relu(h, train=train, name="bn1")
        h = conv_fn(h, out_ch, stride=(1, 1, 1), train=train,
                    name="conv2")
        h = nn.batch_norm(h, train=train, name="bn2")
        if stride != (1, 1, 1) or identity.shape[-1] != out_ch:
            identity = nn.conv3d(identity, out_ch, 1, stride=stride,
                                 use_bias=False, name="down")
            identity = nn.batch_norm(identity, train=train,
                                     name="down_bn")
        return nn.relu(h + identity)


def _video_resnet(x, num_classes, *, train, conv_fn, stem_fn,
                  base: int = 64, blocks_per_stage: int = 2,
                  num_stages: int = 4):
    h = stem_fn(x, train)
    for stage in range(num_stages):
        ch = base * (2 ** stage)
        with nn.scope_named("stage"):
            for b in range(blocks_per_stage):
                stride = ((2, 2, 2) if stage > 0 and b == 0
                          else (1, 1, 1))
                h = _basic_block(h, ch, stride=stride, conv_fn=conv_fn,
                                 train=train)
    h = global_avg_pool3d(h)
    return nn.dense(h, num_classes, name="fc").astype(jnp.float32)


def r3d_18(x: jax.Array, num_classes: int = 400, *,
           train: bool = False) -> jax.Array:
    """3-D ResNet-18: stem (3,7,7) s(1,2,2) -> 4 stages x 2 blocks."""

    def stem(x, train):
        h = nn.conv3d(x, 64, (3, 7, 7), stride=(1, 2, 2),
                      use_bias=False, name="stem")
        return _bn_relu(h, train=train, name="stem_bn")

    return _video_resnet(x, num_classes, train=train,
                         conv_fn=_conv3x3x3, stem_fn=stem)


def r2plus1d_18(x: jax.Array, num_classes: int = 400, *,
                train: bool = False) -> jax.Array:
    """R(2+1)D-18: decomposed stem ((1,7,7) s(1,2,2) -> 45 mid ->
    (3,1,1) -> 64) and decomposed blocks."""

    def stem(x, train):
        h = nn.conv3d(x, 45, (1, 7, 7), stride=(1, 2, 2),
                      use_bias=False, name="stem_s")
        h = _bn_relu(h, train=train, name="stem_mid_bn")
        h = nn.conv3d(h, 64, (3, 1, 1), use_bias=False, name="stem_t")
        return _bn_relu(h, train=train, name="stem_bn")

    return _video_resnet(x, num_classes, train=train,
                         conv_fn=_conv2plus1d, stem_fn=stem)


def tinyvideo(x: jax.Array, num_classes: int = 4, *,
              train: bool = False, base: int = 8) -> jax.Array:
    """CPU smoke variant: tiny 2-stage R3D (same code path)."""

    def stem(x, train):
        h = nn.conv3d(x, base, (3, 3, 3), stride=(1, 2, 2),
                      use_bias=False, name="stem")
        return _bn_relu(h, train=train, name="stem_bn")

    return _video_resnet(x, num_classes, train=train,
                         conv_fn=_conv3x3x3, stem_fn=stem,
                         base=base, blocks_per_stage=1, num_stages=2)
