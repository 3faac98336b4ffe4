"""EfficientNetV2 (S/M/L): fused-MBConv early stages + MBConv late.

Beyond the reference inventory (SURVEY.md §2#2 stops at EfficientNet
[MED]) — added because the V2 stage recipe is the TPU-friendly variant
of the family: the early fused-MBConv blocks replace depthwise convs
(VPU-bound, low arithmetic intensity) with ordinary 3x3 convs that run
on the MXU, which is exactly the trade the paper made for TPU training
speed.  Stage tables follow the published V2-S/M/L configs (param
counts match torchvision: S=21.46M, M=54.14M, L=118.52M — asserted in
tests/test_models.py).
"""

from __future__ import annotations

from functools import partial

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.models.efficientnet import mbconv, squeeze_excite

# (block, kernel, channels, repeats, stride, expand, se_ratio)
V2_STAGES = {
    "s": [
        ("fused", 3, 24, 2, 1, 1, 0.0),
        ("fused", 3, 48, 4, 2, 4, 0.0),
        ("fused", 3, 64, 4, 2, 4, 0.0),
        ("mb", 3, 128, 6, 2, 4, 0.25),
        ("mb", 3, 160, 9, 1, 6, 0.25),
        ("mb", 3, 256, 15, 2, 6, 0.25),
    ],
    "m": [
        ("fused", 3, 24, 3, 1, 1, 0.0),
        ("fused", 3, 48, 5, 2, 4, 0.0),
        ("fused", 3, 80, 5, 2, 4, 0.0),
        ("mb", 3, 160, 7, 2, 4, 0.25),
        ("mb", 3, 176, 14, 1, 6, 0.25),
        ("mb", 3, 304, 18, 2, 6, 0.25),
        ("mb", 3, 512, 5, 1, 6, 0.25),
    ],
    "l": [
        ("fused", 3, 32, 4, 1, 1, 0.0),
        ("fused", 3, 64, 7, 2, 4, 0.0),
        ("fused", 3, 96, 7, 2, 4, 0.0),
        ("mb", 3, 192, 10, 2, 4, 0.25),
        ("mb", 3, 224, 19, 1, 6, 0.25),
        ("mb", 3, 384, 25, 2, 6, 0.25),
        ("mb", 3, 512, 7, 1, 6, 0.25),
    ],
}

# stem channels, head dropout
V2_STEM = {"s": 24, "m": 24, "l": 32}
V2_DROPOUT = {"s": 0.2, "m": 0.3, "l": 0.4}


def fused_mbconv(x, features, *, kernel, stride, expand, se_ratio, train,
                 drop_rate):
    """Fused-MBConv: the expand depthwise pair collapsed into ONE dense
    kxk conv (MXU-friendly).  expand==1 degenerates to a single
    conv+BN+swish; expand>1 adds a linear 1x1 projection."""
    cin = x.shape[-1]
    shortcut = x
    if expand != 1:
        h = nn.conv(x, cin * expand, kernel, stride=stride, use_bias=False,
                    name="conv_expand")
        h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                          name="bn_expand")
        h = nn.swish(h)
        if se_ratio:
            h = squeeze_excite(h, max(1, int(cin * se_ratio)))
        h = nn.conv(h, features, 1, use_bias=False, name="conv_project")
        h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                          name="bn_project")
    else:
        h = nn.conv(x, features, kernel, stride=stride, use_bias=False,
                    name="conv")
        h = nn.batch_norm(h, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
        h = nn.swish(h)
    if stride == 1 and cin == features:
        h = nn.drop_path(h, drop_rate, train=train) + shortcut
    return h


def efficientnet_v2(x: jax.Array, num_classes: int = 1000,
                    variant: str = "s", *, train: bool = False,
                    drop_connect: float = 0.2) -> jax.Array:
    if variant not in V2_STAGES:
        raise ValueError(f"unsupported EfficientNetV2-{variant!r}; "
                         f"valid: {sorted(V2_STAGES)}")
    stages = V2_STAGES[variant]
    with nn.scope_named("stem"):
        x = nn.conv(x, V2_STEM[variant], 3, stride=2, use_bias=False,
                    name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3, name="bn")
        x = nn.swish(x)
    total_blocks = sum(r for _, _, _, r, _, _, _ in stages)
    block_idx = 0
    for si, (kind, k, c, r, s, e, se) in enumerate(stages):
        block = fused_mbconv if kind == "fused" else mbconv
        for i in range(r):
            rate = drop_connect * block_idx / total_blocks
            with nn.scope_named(f"stage{si + 1}_block{i + 1}"):
                x = block(x, c, kernel=k, stride=s if i == 0 else 1,
                          expand=e, se_ratio=se, train=train,
                          drop_rate=rate)
            block_idx += 1
    with nn.scope_named("head"):
        x = nn.conv(x, 1280, 1, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3, name="bn")
        x = nn.swish(x)
    x = nn.gap(x)
    x = nn.dropout(x, V2_DROPOUT[variant], train=train)
    return nn.dense(x, num_classes, name="logits")


efficientnet_v2_s = partial(efficientnet_v2, variant="s")
efficientnet_v2_m = partial(efficientnet_v2, variant="m")
efficientnet_v2_l = partial(efficientnet_v2, variant="l")
