"""VGG family (11/16/19) with optional BN, NHWC.

Rebuild of the reference's VGG `_build_model` (SURVEY.md §2#2; BASELINE
config #3: "deep conv stacks").  The classifier uses global-average-pool +
dense by default (TPU-friendly: avoids the 25088->4096 flatten matmul's
awkward activation layout); the original flatten+fc head is available via
``classic_head=True`` for parity work.
"""

from __future__ import annotations

from functools import partial

import jax

from myconvnet_tpu import nn

# conv widths per block; int = conv, 'M' = maxpool
VGG_CFG = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


def vgg(x: jax.Array, num_classes: int = 1000, depth: int = 16, *,
        train: bool = False, use_bn: bool = True,
        dropout_rate: float = 0.5, classic_head: bool = False) -> jax.Array:
    if depth not in VGG_CFG:
        raise ValueError(f"unsupported VGG depth {depth}; "
                         f"valid: {sorted(VGG_CFG)}")
    block, idx = 1, 0
    for item in VGG_CFG[depth]:
        if item == "M":
            x = nn.max_pool(x, 2, 2)
            block, idx = block + 1, 0
        else:
            x = nn.conv(x, item, 3, use_bias=not use_bn)
            if use_bn:
                x = nn.batch_norm(x, train=train)
            x = nn.relu(x)
            idx += 1
            # zero-overhead taps (core.module.collecting): the
            # perceptual-loss machinery (train/perceptual.py) and
            # Grad-CAM read activations as relu{block}_{conv}
            x = nn.tag_intermediate(f"relu{block}_{idx}", x)
    if classic_head:
        x = x.reshape(x.shape[0], -1)
        x = nn.dense(x, 4096, name="fc1")
        x = nn.relu(x)
        x = nn.dropout(x, dropout_rate, train=train)
        x = nn.dense(x, 4096, name="fc2")
        x = nn.relu(x)
        x = nn.dropout(x, dropout_rate, train=train)
    else:
        x = nn.gap(x)
        x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")


vgg11 = partial(vgg, depth=11)
vgg16 = partial(vgg, depth=16)
vgg19 = partial(vgg, depth=19)
