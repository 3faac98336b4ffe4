"""RegNet (Radosavovic et al. 2020, "Designing Network Design Spaces").

Zoo extension beyond the reference inventory (SURVEY.md §2#2 names the
family style): the design-space networks are plain bottleneck-1 group
conv stacks — they map onto the same nn primitives as ResNeXt (group
conv, BN, SE) with per-stage (depth, width, group-width) tables instead
of a doubling rule.  X variants are plain; Y variants add SE with the
reduction computed from the block INPUT width (paper convention).

Stage tables below are the published 400MF / 1.6GF configurations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import init

# name -> (depths, widths, group_width, se)
REGNET_CFG = {
    "x_400mf": ((1, 2, 7, 12), (32, 64, 160, 384), 16, False),
    "y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8, True),
    "x_1_6gf": ((2, 4, 10, 2), (72, 168, 408, 912), 24, False),
    "y_1_6gf": ((2, 6, 17, 2), (48, 120, 336, 888), 24, True),
}


def _se(x: jax.Array, w_in: int, name: str = "se") -> jax.Array:
    """RegNetY SE: hidden width = block INPUT width / 4 (not the
    current channel count — the paper's convention)."""
    with nn.scope_named(name):
        c = x.shape[-1]
        s = nn.gap(x)
        s = nn.relu(nn.dense(s, max(w_in // 4, 1), name="fc1"))
        s = jax.nn.sigmoid(nn.dense(s, c, name="fc2").astype(x.dtype))
        return x * s[:, None, None, :]


def _block(x, w_out: int, *, stride: int, group_width: int, se: bool,
           train: bool):
    w_in = x.shape[-1]
    groups = max(w_out // group_width, 1)
    shortcut = x
    y = nn.conv(x, w_out, 1, use_bias=False, name="conv_a")
    y = nn.batch_norm(y, train=train, name="bn_a")
    y = nn.relu(y)
    y = nn.conv(y, w_out, 3, stride=stride, groups=groups,
                use_bias=False, name="conv_b")
    y = nn.batch_norm(y, train=train, name="bn_b")
    y = nn.relu(y)
    if se:
        y = _se(y, w_in)
    y = nn.conv(y, w_out, 1, use_bias=False, name="conv_c")
    y = nn.batch_norm(y, train=train, name="bn_c")
    if stride != 1 or w_in != w_out:
        shortcut = nn.conv(x, w_out, 1, stride=stride, use_bias=False,
                           name="conv_proj")
        shortcut = nn.batch_norm(shortcut, train=train, name="bn_proj")
    return nn.relu(y + shortcut)


def regnet(x: jax.Array, num_classes: int = 1000,
           variant: str = "x_400mf", *, train: bool = False) -> jax.Array:
    if variant not in REGNET_CFG:
        raise ValueError(f"unknown RegNet variant {variant!r}; valid: "
                         f"{sorted(REGNET_CFG)}")
    depths, widths, gw, se = REGNET_CFG[variant]
    with nn.scope_named("stem"):
        x = nn.conv(x, 32, 3, stride=2, use_bias=False, name="conv")
        x = nn.batch_norm(x, train=train, name="bn")
        x = nn.relu(x)
    for si, (d, w) in enumerate(zip(depths, widths)):
        with nn.scope_named(f"stage{si + 1}"):
            for b in range(d):
                with nn.scope_named(f"block{b + 1}"):
                    x = _block(x, w, stride=2 if b == 0 else 1,
                               group_width=gw, se=se, train=train)
    x = nn.tag_intermediate("features", x)
    x = nn.gap(x)
    return nn.dense(x, num_classes, w_init=init.glorot_uniform(),
                    name="logits")


regnet_x_400mf = partial(regnet, variant="x_400mf")
regnet_y_400mf = partial(regnet, variant="y_400mf")
regnet_x_1_6gf = partial(regnet, variant="x_1_6gf")
regnet_y_1_6gf = partial(regnet, variant="y_1_6gf")
