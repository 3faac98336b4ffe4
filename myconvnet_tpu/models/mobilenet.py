"""MobileNetV2 (inverted residuals, depthwise convs), NHWC.

SURVEY.md §2#2 lists MobileNet among the reference's probable model zoo
[MED].  TPU notes: depthwise convs run on the VPU (no MXU), so the 1x1
expand/project convs dominate FLOPs — they are plain wide matmuls and
tile well; ReLU6 keeps bf16 activations bounded.
"""

from __future__ import annotations

import jax

from myconvnet_tpu import nn

# (expansion t, channels c, repeats n, stride s) — V2 paper table 2
V2_BLOCKS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _round_filters(c: int, multiplier: float, divisor: int = 8) -> int:
    c = c * multiplier
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return int(new)


def inverted_residual(x, features, *, stride, expand, train):
    cin = x.shape[-1]
    shortcut = x
    h = x
    if expand != 1:
        h = nn.conv(h, cin * expand, 1, use_bias=False, name="conv_expand")
        h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                          name="bn_expand")
        h = nn.relu6(h)
    h = nn.depthwise_conv(h, 3, stride=stride, name="dwconv")
    h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3, name="bn_dw")
    h = nn.relu6(h)
    h = nn.conv(h, features, 1, use_bias=False, name="conv_project")
    h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                      name="bn_project")
    if stride == 1 and cin == features:
        h = h + shortcut
    return h


def mobilenet_v2(x: jax.Array, num_classes: int = 1000, *,
                 train: bool = False,
                 width_multiplier: float = 1.0,
                 dropout_rate: float = 0.2) -> jax.Array:
    first = _round_filters(32, width_multiplier)
    with nn.scope_named("stem"):
        x = nn.conv(x, first, 3, stride=2, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
        x = nn.relu6(x)
    for bi, (t, c, n, s) in enumerate(V2_BLOCKS):
        feats = _round_filters(c, width_multiplier)
        for i in range(n):
            with nn.scope_named(f"block{bi + 1}_{i + 1}"):
                x = inverted_residual(x, feats,
                                      stride=s if i == 0 else 1,
                                      expand=t, train=train)
    last = _round_filters(1280, max(1.0, width_multiplier))
    with nn.scope_named("head"):
        x = nn.conv(x, last, 1, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
        x = nn.relu6(x)
    x = nn.gap(x)
    x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")
