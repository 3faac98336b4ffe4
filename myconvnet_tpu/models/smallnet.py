"""Small CIFAR-10 ConvNet — the reference's default, CPU-runnable recipe
(BASELINE.json config #1; SURVEY.md §2#2).

A compact VGG-ish stack: 3 conv blocks (conv-BN-ReLU ×2 + pool) then a
small dense head with dropout — the classic shape of the reference's
default net; exact filter counts are a rebuild choice since the mount was
empty (SURVEY.md §0)."""

from __future__ import annotations

import jax

from myconvnet_tpu import nn


def smallnet(x: jax.Array, num_classes: int = 10, *, train: bool = False,
             dropout_rate: float = 0.5, width: int = 32) -> jax.Array:
    for i, mult in enumerate((1, 2, 4)):
        for _ in range(2):
            x = nn.conv(x, width * mult, 3, use_bias=False)
            x = nn.batch_norm(x, train=train)
            x = nn.relu(x)
        x = nn.max_pool(x, 2, 2)
    x = nn.tag_intermediate("features", x)
    x = nn.gap(x)
    x = nn.dropout(x, dropout_rate, train=train)
    x = nn.dense(x, width * 8, name="fc1")
    x = nn.relu(x)
    x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")
