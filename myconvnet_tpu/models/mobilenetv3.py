"""MobileNetV3 (Howard et al. 2019) Large/Small, NHWC.

SURVEY.md §2#2 lists MobileNet among the reference's probable zoo
[MED]; V3 extends the shipped V2 with the searched block tables,
hard-swish/hard-sigmoid activations and the expanded-channel SE.

TPU notes (same economics as V2, models/mobilenet.py): depthwise convs
run on the VPU, so the 1x1 expand/project matmuls carry the FLOPs and
tile well on the MXU; hard-swish is three elementwise ops XLA fuses
into the surrounding pass, measurably cheaper than the exp-based silu
on the VPU.  Param counts match torchvision mobilenet_v3_large
(5,483,032) / _small (2,542,856) exactly (test_models).
"""

from __future__ import annotations

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.models.mobilenet import _round_filters


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) * (1.0 / 6.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


def _se_v3(x, expanded: int, name: str = "se"):
    """V3's SE: squeeze on the EXPANDED channels, reduce to
    round8(expanded/4), relu -> hard-sigmoid gate (paper §5.3;
    torchvision SqueezeExcitation(scale_activation=Hardsigmoid))."""
    with nn.scope_named(name):
        c = x.shape[-1]
        red = _round_filters(expanded // 4, 1.0)
        s = nn.gap(x)
        s = nn.relu(nn.dense(s, red, name="fc1"))
        s = hard_sigmoid(nn.dense(s, c, name="fc2")).astype(x.dtype)
        return x * s[:, None, None, :]


def _bneck(x, *, k, exp, out, se, hs, stride, train, name):
    cin = x.shape[-1]
    shortcut = x
    act = hard_swish if hs else nn.relu
    with nn.scope_named(name):
        h = x
        if exp != cin:
            h = nn.conv(h, exp, 1, use_bias=False, name="conv_expand")
            h = nn.batch_norm(h, train=train, momentum=0.99, eps=1e-3,
                              name="bn_expand")
            h = act(h)
        h = nn.depthwise_conv(h, k, stride=stride, name="dwconv")
        h = nn.batch_norm(h, train=train, momentum=0.99, eps=1e-3,
                          name="bn_dw")
        h = act(h)
        if se:
            h = _se_v3(h, exp)
        h = nn.conv(h, out, 1, use_bias=False, name="conv_project")
        h = nn.batch_norm(h, train=train, momentum=0.99, eps=1e-3,
                          name="bn_project")
        if stride == 1 and cin == out:
            h = h + shortcut
    return h


# (kernel, exp, out, SE, hard-swish, stride) — paper tables 1 / 2
V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


def _mobilenet_v3(x, num_classes, blocks, last_conv, head_dim, *,
                  train, width_multiplier, dropout_rate):
    with nn.scope_named("stem"):
        x = nn.conv(x, _round_filters(16, width_multiplier), 3,
                    stride=2, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.99, eps=1e-3,
                          name="bn")
        x = hard_swish(x)
    for i, (k, exp, out, se, hs, s) in enumerate(blocks):
        x = _bneck(x, k=k, exp=_round_filters(exp, width_multiplier),
                   out=_round_filters(out, width_multiplier), se=se,
                   hs=hs, stride=s, train=train, name=f"block{i + 1}")
    with nn.scope_named("head"):
        x = nn.conv(x, _round_filters(last_conv, width_multiplier), 1,
                    use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.99, eps=1e-3,
                          name="bn")
        x = hard_swish(x)
    x = nn.gap(x)
    # the 1280/1024 "expansion fc" sits AFTER pooling (paper fig. 5:
    # no BN at 1x1 resolution), biased, hard-swish; it scales with the
    # width multiplier like torchvision's last_channel
    x = hard_swish(nn.dense(x, _round_filters(head_dim,
                                              width_multiplier),
                            name="pre_logits"))
    x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")


def mobilenet_v3_large(x: jax.Array, num_classes: int = 1000, *,
                       train: bool = False,
                       width_multiplier: float = 1.0,
                       dropout_rate: float = 0.2) -> jax.Array:
    return _mobilenet_v3(x, num_classes, V3_LARGE, 960, 1280,
                         train=train, width_multiplier=width_multiplier,
                         dropout_rate=dropout_rate)


def mobilenet_v3_small(x: jax.Array, num_classes: int = 1000, *,
                       train: bool = False,
                       width_multiplier: float = 1.0,
                       dropout_rate: float = 0.2) -> jax.Array:
    return _mobilenet_v3(x, num_classes, V3_SMALL, 576, 1024,
                         train=train, width_multiplier=width_multiplier,
                         dropout_rate=dropout_rate)
