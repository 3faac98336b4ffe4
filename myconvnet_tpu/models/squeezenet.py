"""SqueezeNet 1.1 (fire modules), NHWC.

SURVEY.md §2#2's zoo spans the era's compact classifiers; SqueezeNet
(Iandola et al.) is the smallest.  The fire module's two expand branches
(1x1 and 3x3 over the same squeezed input) are independent convs whose
concat feeds the next squeeze — XLA fuses the concat into the consumer's
input window, so the branch split costs nothing extra in HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn

# (squeeze, expand1x1, expand3x3) per fire module — SqueezeNet 1.1
FIRE_CFG = ((16, 64, 64), (16, 64, 64),
            (32, 128, 128), (32, 128, 128),
            (48, 192, 192), (48, 192, 192),
            (64, 256, 256), (64, 256, 256))


def fire(x, squeeze, e1, e3, *, name):
    with nn.scope_named(name):
        s = nn.relu(nn.conv(x, squeeze, 1, name="squeeze"))
        a = nn.relu(nn.conv(s, e1, 1, name="expand1x1"))
        b = nn.relu(nn.conv(s, e3, 3, name="expand3x3"))
    return jnp.concatenate([a, b], axis=-1)


def squeezenet(x: jax.Array, num_classes: int = 1000, *,
               train: bool = False,
               dropout_rate: float = 0.5) -> jax.Array:
    with nn.scope_named("stem"):
        x = nn.relu(nn.conv(x, 64, 3, stride=2, name="conv"))
    x = nn.max_pool(x, 3, stride=2)
    for i, cfg in enumerate(FIRE_CFG):
        x = fire(x, *cfg, name=f"fire{i + 2}")
        if i in (1, 3):  # pool after fire3 and fire5 (v1.1 layout)
            x = nn.max_pool(x, 3, stride=2)
    x = nn.dropout(x, dropout_rate, train=train)
    # fully-convolutional classifier head (no dense layer)
    x = nn.relu(nn.conv(x, num_classes, 1, name="classifier"))
    return nn.gap(x).astype(jnp.float32)
