"""AlexNet, NHWC (SURVEY.md §2#2 lists AlexNet in the reference zoo
[MED]).  Kept faithful to the 2012 shape (LRN replaced by BN, the modern
convention) with a GAP head option; classic 4096-dense head available
for param-count parity."""

from __future__ import annotations

import jax

from myconvnet_tpu import nn


def alexnet(x: jax.Array, num_classes: int = 1000, *, train: bool = False,
            use_bn: bool = True, dropout_rate: float = 0.5,
            classic_head: bool = True) -> jax.Array:
    def maybe_bn(h):
        return nn.batch_norm(h, train=train) if use_bn else h

    x = nn.conv(x, 64, 11, stride=4, padding="SAME", use_bias=not use_bn)
    x = nn.relu(maybe_bn(x))
    x = nn.max_pool(x, 3, 2, padding="VALID")
    x = nn.conv(x, 192, 5, use_bias=not use_bn)
    x = nn.relu(maybe_bn(x))
    x = nn.max_pool(x, 3, 2, padding="VALID")
    x = nn.conv(x, 384, 3, use_bias=not use_bn)
    x = nn.relu(maybe_bn(x))
    x = nn.conv(x, 256, 3, use_bias=not use_bn)
    x = nn.relu(maybe_bn(x))
    x = nn.conv(x, 256, 3, use_bias=not use_bn)
    x = nn.relu(maybe_bn(x))
    x = nn.max_pool(x, 3, 2, padding="VALID")
    if classic_head:
        x = x.reshape(x.shape[0], -1)
        x = nn.dropout(x, dropout_rate, train=train)
        x = nn.relu(nn.dense(x, 4096, name="fc1"))
        x = nn.dropout(x, dropout_rate, train=train)
        x = nn.relu(nn.dense(x, 4096, name="fc2"))
    else:
        x = nn.gap(x)
        x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")
