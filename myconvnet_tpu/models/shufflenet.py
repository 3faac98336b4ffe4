"""ShuffleNetV2 (channel split + shuffle), NHWC.

SURVEY.md §2#2's zoo targets the era's efficient-inference families;
ShuffleNetV2 (Ma et al., 2018) is the canonical shuffle-based one.

TPU notes: the channel shuffle is a reshape+transpose on the minor
(lane) dimension — XLA folds it into the neighbouring 1x1 conv's layout,
so it costs no separate HBM pass.  As with MobileNet, the depthwise 3x3
runs on the VPU and the 1x1 convs (the FLOP carriers) are wide matmuls
that tile cleanly onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn

# out_channels per stage for width multipliers (paper table 5)
STAGE_CHANNELS = {
    0.5: (48, 96, 192, 1024),
    1.0: (116, 232, 464, 1024),
    1.5: (176, 352, 704, 1024),
    2.0: (244, 488, 976, 2048),
}
STAGE_REPEATS = (4, 8, 4)


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def _branch_main(x, features, *, stride, train):
    x = nn.conv(x, features, 1, use_bias=False, name="conv1")
    x = nn.batch_norm(x, train=train, momentum=0.9, name="bn1")
    x = nn.relu(x)
    x = nn.depthwise_conv(x, 3, stride=stride, name="dwconv")
    x = nn.batch_norm(x, train=train, momentum=0.9, name="bn_dw")
    x = nn.conv(x, features, 1, use_bias=False, name="conv2")
    x = nn.batch_norm(x, train=train, momentum=0.9, name="bn2")
    return nn.relu(x)


def shuffle_unit(x, out_features, *, stride, train):
    if stride == 1:
        # channel split: half rides the identity, half the main branch
        half = x.shape[-1] // 2
        shortcut, h = x[..., :half], x[..., half:]
        with nn.scope_named("main"):
            h = _branch_main(h, out_features - half, stride=1, train=train)
    else:
        shortcut = x
        with nn.scope_named("proj"):
            shortcut = nn.depthwise_conv(shortcut, 3, stride=2,
                                         name="dwconv")
            shortcut = nn.batch_norm(shortcut, train=train, momentum=0.9,
                                     name="bn_dw")
            shortcut = nn.conv(shortcut, out_features // 2, 1,
                               use_bias=False, name="conv")
            shortcut = nn.batch_norm(shortcut, train=train, momentum=0.9,
                                     name="bn")
            shortcut = nn.relu(shortcut)
        with nn.scope_named("main"):
            h = _branch_main(x, out_features - out_features // 2,
                             stride=2, train=train)
    return channel_shuffle(jnp.concatenate([shortcut, h], axis=-1))


def shufflenet_v2(x: jax.Array, num_classes: int = 1000, *,
                  train: bool = False,
                  width_multiplier: float = 1.0) -> jax.Array:
    if width_multiplier not in STAGE_CHANNELS:
        raise ValueError(f"width_multiplier must be one of "
                         f"{sorted(STAGE_CHANNELS)}")
    c2, c3, c4, c5 = STAGE_CHANNELS[width_multiplier]
    with nn.scope_named("stem"):
        x = nn.conv(x, 24, 3, stride=2, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, name="bn")
        x = nn.relu(x)
    x = nn.max_pool(x, 3, stride=2, padding="SAME")
    for si, (feats, reps) in enumerate(zip((c2, c3, c4), STAGE_REPEATS)):
        for i in range(reps):
            with nn.scope_named(f"stage{si + 2}_{i + 1}"):
                x = shuffle_unit(x, feats, stride=2 if i == 0 else 1,
                                 train=train)
    with nn.scope_named("conv5"):
        x = nn.conv(x, c5, 1, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, name="bn")
        x = nn.relu(x)
    x = nn.gap(x)
    return nn.dense(x, num_classes, name="logits")
