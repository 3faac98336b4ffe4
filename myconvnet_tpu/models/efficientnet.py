"""EfficientNet (B0-B3): MBConv + squeeze-excitation, NHWC.

SURVEY.md §2#2 lists EfficientNet among the reference's probable model
zoo [MED].  TPU notes: SE's global-pool+2 tiny matmuls are negligible;
swish fuses into the preceding BN epilogue; depthwise runs on the VPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax

from myconvnet_tpu import nn

# (kernel, channels, repeats, stride, expand) — B0 baseline
B0_BLOCKS = [
    (3, 16, 1, 1, 1),
    (3, 24, 2, 2, 6),
    (5, 40, 2, 2, 6),
    (3, 80, 3, 2, 6),
    (5, 112, 3, 1, 6),
    (5, 192, 4, 2, 6),
    (3, 320, 1, 1, 6),
]

# width_mult, depth_mult, dropout
SCALING = {
    0: (1.0, 1.0, 0.2),
    1: (1.0, 1.1, 0.2),
    2: (1.1, 1.2, 0.3),
    3: (1.2, 1.4, 0.3),
    4: (1.4, 1.8, 0.4),
    5: (1.6, 2.2, 0.4),
    6: (1.8, 2.6, 0.5),
    7: (2.0, 3.1, 0.5),
}


def _round_filters(c, mult, divisor=8):
    c *= mult
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return int(new)


def _round_repeats(r, mult):
    return int(math.ceil(r * mult))


def squeeze_excite(x, reduced: int, name="se"):
    with nn.scope_named(name):
        s = nn.gap(x, keepdims=True)
        s = nn.conv(s, reduced, 1, name="conv_reduce")
        s = nn.swish(s)
        s = nn.conv(s, x.shape[-1], 1, name="conv_expand")
        s = nn.sigmoid(s)
    return x * s


def mbconv(x, features, *, kernel, stride, expand, se_ratio, train,
           drop_rate):
    cin = x.shape[-1]
    shortcut = x
    h = x
    if expand != 1:
        h = nn.conv(h, cin * expand, 1, use_bias=False, name="conv_expand")
        h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                          name="bn_expand")
        h = nn.swish(h)
    h = nn.depthwise_conv(h, kernel, stride=stride, name="dwconv")
    h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3, name="bn_dw")
    h = nn.swish(h)
    if se_ratio:
        h = squeeze_excite(h, max(1, int(cin * se_ratio)))
    h = nn.conv(h, features, 1, use_bias=False, name="conv_project")
    h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                      name="bn_project")
    if stride == 1 and cin == features:
        h = nn.drop_path(h, drop_rate, train=train) + shortcut
    return h


def efficientnet(x: jax.Array, num_classes: int = 1000, variant: int = 0,
                 *, train: bool = False, se_ratio: float = 0.25,
                 drop_connect: float = 0.2) -> jax.Array:
    if variant not in SCALING:
        raise ValueError(f"unsupported EfficientNet-B{variant}; "
                         f"valid: {sorted(SCALING)}")
    wm, dm, dropout_rate = SCALING[variant]
    with nn.scope_named("stem"):
        x = nn.conv(x, _round_filters(32, wm), 3, stride=2, use_bias=False,
                    name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
        x = nn.swish(x)
    total_blocks = sum(_round_repeats(r, dm) for _, _, r, _, _ in B0_BLOCKS)
    block_idx = 0
    for si, (k, c, r, s, t) in enumerate(B0_BLOCKS):
        feats = _round_filters(c, wm)
        for i in range(_round_repeats(r, dm)):
            rate = drop_connect * block_idx / total_blocks
            with nn.scope_named(f"stage{si + 1}_block{i + 1}"):
                x = mbconv(x, feats, kernel=k,
                           stride=s if i == 0 else 1, expand=t,
                           se_ratio=se_ratio, train=train, drop_rate=rate)
            block_idx += 1
    with nn.scope_named("head"):
        x = nn.conv(x, _round_filters(1280, wm), 1, use_bias=False,
                    name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
        x = nn.swish(x)
    x = nn.gap(x)
    x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")


efficientnet_b0 = partial(efficientnet, variant=0)
efficientnet_b1 = partial(efficientnet, variant=1)
efficientnet_b2 = partial(efficientnet, variant=2)
efficientnet_b3 = partial(efficientnet, variant=3)
efficientnet_b4 = partial(efficientnet, variant=4)
efficientnet_b5 = partial(efficientnet, variant=5)
efficientnet_b6 = partial(efficientnet, variant=6)
efficientnet_b7 = partial(efficientnet, variant=7)
