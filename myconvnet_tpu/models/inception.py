"""Inception-v3, NHWC (SURVEY.md §2#2 lists Inception among the
reference's probable model zoo [MED]).

TPU notes: each inception module's parallel branches are independent
conv towers XLA schedules back-to-back on the MXU; the channel concat is
layout bookkeeping in NHWC.  Factorized 1xN/Nx1 convs map to skinny but
well-tiled matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn


def _cbr(x, features, kernel, *, stride=1, padding="SAME", train,
         name="cbr"):
    with nn.scope_named(name):
        x = nn.conv(x, features, kernel, stride=stride, padding=padding,
                    use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, momentum=0.9, eps=1e-3,
                          name="bn")
    return nn.relu(x)


def _branch_pool(x, features, *, train, name="pool_proj"):
    y = nn.avg_pool(x, 3, 1, padding="SAME")
    return _cbr(y, features, 1, train=train, name=name)


def inception_a(x, pool_features, *, train):
    b1 = _cbr(x, 64, 1, train=train, name="b1x1")
    b2 = _cbr(x, 48, 1, train=train, name="b5_1")
    b2 = _cbr(b2, 64, 5, train=train, name="b5_2")
    b3 = _cbr(x, 64, 1, train=train, name="b3_1")
    b3 = _cbr(b3, 96, 3, train=train, name="b3_2")
    b3 = _cbr(b3, 96, 3, train=train, name="b3_3")
    b4 = _branch_pool(x, pool_features, train=train)
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def reduction_a(x, *, train):
    b1 = _cbr(x, 384, 3, stride=2, padding="VALID", train=train,
              name="r3")
    b2 = _cbr(x, 64, 1, train=train, name="r3d_1")
    b2 = _cbr(b2, 96, 3, train=train, name="r3d_2")
    b2 = _cbr(b2, 96, 3, stride=2, padding="VALID", train=train,
              name="r3d_3")
    b3 = nn.max_pool(x, 3, 2, padding="VALID")
    return jnp.concatenate([b1, b2, b3], axis=-1)


def inception_b(x, c7, *, train):
    b1 = _cbr(x, 192, 1, train=train, name="b1x1")
    b2 = _cbr(x, c7, 1, train=train, name="b7_1")
    b2 = _cbr(b2, c7, (1, 7), train=train, name="b7_2")
    b2 = _cbr(b2, 192, (7, 1), train=train, name="b7_3")
    b3 = _cbr(x, c7, 1, train=train, name="b77_1")
    b3 = _cbr(b3, c7, (7, 1), train=train, name="b77_2")
    b3 = _cbr(b3, c7, (1, 7), train=train, name="b77_3")
    b3 = _cbr(b3, c7, (7, 1), train=train, name="b77_4")
    b3 = _cbr(b3, 192, (1, 7), train=train, name="b77_5")
    b4 = _branch_pool(x, 192, train=train)
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def reduction_b(x, *, train):
    b1 = _cbr(x, 192, 1, train=train, name="r1")
    b1 = _cbr(b1, 320, 3, stride=2, padding="VALID", train=train,
              name="r2")
    b2 = _cbr(x, 192, 1, train=train, name="r7_1")
    b2 = _cbr(b2, 192, (1, 7), train=train, name="r7_2")
    b2 = _cbr(b2, 192, (7, 1), train=train, name="r7_3")
    b2 = _cbr(b2, 192, 3, stride=2, padding="VALID", train=train,
              name="r7_4")
    b3 = nn.max_pool(x, 3, 2, padding="VALID")
    return jnp.concatenate([b1, b2, b3], axis=-1)


def inception_c(x, *, train):
    b1 = _cbr(x, 320, 1, train=train, name="b1x1")
    b2 = _cbr(x, 384, 1, train=train, name="b3_1")
    b2 = jnp.concatenate([
        _cbr(b2, 384, (1, 3), train=train, name="b3_2a"),
        _cbr(b2, 384, (3, 1), train=train, name="b3_2b")], axis=-1)
    b3 = _cbr(x, 448, 1, train=train, name="b33_1")
    b3 = _cbr(b3, 384, 3, train=train, name="b33_2")
    b3 = jnp.concatenate([
        _cbr(b3, 384, (1, 3), train=train, name="b33_3a"),
        _cbr(b3, 384, (3, 1), train=train, name="b33_3b")], axis=-1)
    b4 = _branch_pool(x, 192, train=train)
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def inception_v3(x: jax.Array, num_classes: int = 1000, *,
                 train: bool = False,
                 dropout_rate: float = 0.5) -> jax.Array:
    """Canonical input 299x299; any size >= 75 works (GAP head)."""
    with nn.scope_named("stem"):
        x = _cbr(x, 32, 3, stride=2, padding="VALID", train=train,
                 name="conv1")
        x = _cbr(x, 32, 3, padding="VALID", train=train, name="conv2")
        x = _cbr(x, 64, 3, train=train, name="conv3")
        x = nn.max_pool(x, 3, 2, padding="VALID")
        x = _cbr(x, 80, 1, padding="VALID", train=train, name="conv4")
        x = _cbr(x, 192, 3, padding="VALID", train=train, name="conv5")
        x = nn.max_pool(x, 3, 2, padding="VALID")
    for i, pf in enumerate((32, 64, 64)):
        with nn.scope_named(f"mixed_a{i + 1}"):
            x = inception_a(x, pf, train=train)
    with nn.scope_named("reduction_a"):
        x = reduction_a(x, train=train)
    for i, c7 in enumerate((128, 160, 160, 192)):
        with nn.scope_named(f"mixed_b{i + 1}"):
            x = inception_b(x, c7, train=train)
    with nn.scope_named("reduction_b"):
        x = reduction_b(x, train=train)
    for i in range(2):
        with nn.scope_named(f"mixed_c{i + 1}"):
            x = inception_c(x, train=train)
    x = nn.gap(x)
    x = nn.dropout(x, dropout_rate, train=train)
    return nn.dense(x, num_classes, name="logits")
