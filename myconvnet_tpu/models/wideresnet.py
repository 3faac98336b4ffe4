"""Wide ResNet (Zagoruyko & Komodakis), NHWC, TPU-first.

The CIFAR-standard wide residual network: pre-activation basic blocks
(BN-ReLU-conv), 3 groups of (depth-4)/6 blocks at widths 16k/32k/64k,
optional dropout between the two convs.  WRN-28-10 is the canonical
configuration (36.5M params — pinned by test).

TPU notes: widths are multiples of 16k, so every conv channel count
tiles the 128-lane MXU cleanly at k >= 8; the whole network is 3x3
convs — pure MXU work with no transposes.
"""

from __future__ import annotations

from functools import partial

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init


def _bn_relu(x, train, name):
    x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-5, name=name)
    return nn.relu(x)


def _wide_block(x, features, *, stride, train, dropout_rate, first):
    """Pre-activation basic block; projection shortcut on width change.

    NOTE the BN scopes are named ``preact_*``, NOT ``bn_*``: in this
    ordering BN normalizes a conv's INPUT (through a ReLU), so it must
    never be folded into the preceding conv — the distinct name keeps
    models/folding.py's conv_X/bn_X pairing from matching it.
    """
    pre = _bn_relu(x, train, "preact_a")
    # pre-activation: the projection branches from the PRE-activated
    # tensor on the first block of a group (the paper's arrangement)
    shortcut = x
    if first:
        shortcut = nn.conv(pre, features, 1, stride=stride, use_bias=False,
                           name="conv_proj")
    y = nn.conv(pre, features, 3, stride=stride, use_bias=False,
                name="conv_a")
    y = _bn_relu(y, train, "preact_b")
    if dropout_rate > 0.0:
        y = nn.dropout(y, dropout_rate, train=train)
    y = nn.conv(y, features, 3, use_bias=False, name="conv_b")
    return y + shortcut


def wide_resnet(x: jax.Array, num_classes: int = 10, *,
                depth: int = 28, width_mult: int = 10,
                train: bool = False,
                dropout_rate: float = 0.0) -> jax.Array:
    if (depth - 4) % 6:
        raise ValueError(f"WRN depth must be 6n+4, got {depth}")
    n = (depth - 4) // 6
    widths = [16 * width_mult * (2 ** g) for g in range(3)]

    with nn.scope_named("stem"):
        x = nn.conv(x, 16, 3, use_bias=False, name="conv")
    for g, features in enumerate(widths):
        with nn.scope_named(f"group{g + 1}"):
            for b in range(n):
                with nn.scope_named(f"block{b + 1}"):
                    x = _wide_block(
                        x, features,
                        stride=(2 if g > 0 and b == 0 else 1),
                        train=train, dropout_rate=dropout_rate,
                        first=(b == 0))
    x = _bn_relu(x, train, "bn_final")
    x = nn.tag_intermediate("features", x)
    x = nn.gap(x)
    return nn.dense(x, num_classes, w_init=init.glorot_uniform(),
                    name="logits")


wrn_28_10 = partial(wide_resnet, depth=28, width_mult=10)
wrn_16_8 = partial(wide_resnet, depth=16, width_mult=8)
