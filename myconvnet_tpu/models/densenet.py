"""DenseNet family (121/169/201), NHWC.

Rebuild of the reference's DenseNet `_build_model` (SURVEY.md §2#2;
BASELINE config #3: "dense-block concatenation").

TPU note: each dense layer concatenates on the channel (lane) axis, which
XLA handles as pure layout bookkeeping in NHWC — growth-rate-32 keeps
channel counts 128-friendly at the block level, and the BN-ReLU-1x1
bottleneck in front of each 3x3 keeps the MXU fed with wide matmuls
instead of many skinny convs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn

STAGE_LAYERS = {
    121: (6, 12, 24, 16),
    169: (6, 12, 32, 32),
    201: (6, 12, 48, 32),
}


def _bn_relu(x, train):
    x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-5)
    return nn.relu(x)


def dense_layer(x, growth_rate, *, train):
    """BN-ReLU-1x1(4k) -> BN-ReLU-3x3(k), output concatenated by caller."""
    y = _bn_relu(x, train)
    y = nn.conv(y, 4 * growth_rate, 1, use_bias=False, name="conv_bottleneck")
    y = _bn_relu(y, train)
    return nn.conv(y, growth_rate, 3, use_bias=False, name="conv_grow")


def dense_block(x, n_layers, growth_rate, *, train):
    for i in range(n_layers):
        with nn.scope_named(f"layer{i + 1}"):
            y = dense_layer(x, growth_rate, train=train)
        x = jnp.concatenate([x, y], axis=-1)
    return x


def transition(x, *, train, compression=0.5):
    y = _bn_relu(x, train)
    y = nn.conv(y, int(x.shape[-1] * compression), 1, use_bias=False,
                name="conv_transition")
    return nn.avg_pool(y, 2, 2, padding="VALID")


def densenet(x: jax.Array, num_classes: int = 1000, depth: int = 121, *,
             train: bool = False, growth_rate: int = 32) -> jax.Array:
    if depth not in STAGE_LAYERS:
        raise ValueError(f"unsupported DenseNet depth {depth}; "
                         f"valid: {sorted(STAGE_LAYERS)}")
    with nn.scope_named("stem"):
        x = nn.conv(x, 2 * growth_rate, 7, stride=2, use_bias=False,
                    name="conv")
        x = _bn_relu(x, train)
        x = nn.max_pool(x, 3, 2, padding="SAME")
    stages = STAGE_LAYERS[depth]
    for i, n_layers in enumerate(stages):
        with nn.scope_named(f"block{i + 1}"):
            x = dense_block(x, n_layers, growth_rate, train=train)
        if i < len(stages) - 1:
            with nn.scope_named(f"transition{i + 1}"):
                x = transition(x, train=train)
    x = _bn_relu(x, train)
    x = nn.gap(x)
    return nn.dense(x, num_classes, name="logits")


densenet121 = partial(densenet, depth=121)
densenet169 = partial(densenet, depth=169)
densenet201 = partial(densenet, depth=201)
