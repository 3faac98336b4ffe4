"""ConvNeXt (Liu et al., 2022), NHWC — the modern pure-conv flagship.

A convolutional architecture competitive with vision transformers while
remaining entirely MXU/VPU work: 7x7 depthwise (VPU) + two 1x1
projections (wide MXU matmuls) per block, LayerNorm over channels
(elementwise along lanes, no batch coupling), GELU, per-block LayerScale
and stochastic depth.  No attention, no gathers, static shapes — the
best-case TPU workload shape, included as the zoo's modern endpoint
beyond the reference era.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import param

# depths / dims per variant (paper table 1)
VARIANTS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


def _block(x, dim, *, drop_rate, layer_scale_init, train, name):
    with nn.scope_named(name):
        shortcut = x
        h = nn.depthwise_conv(x, 7, use_bias=True, name="dwconv")
        h = nn.layer_norm(h, name="ln")
        h = nn.dense(h, 4 * dim, name="pw1")
        h = nn.gelu(h)
        h = nn.dense(h, dim, name="pw2")
        if layer_scale_init > 0:
            gamma = param("layer_scale", (dim,), jnp.float32,
                          init.constant(layer_scale_init))
            h = h * gamma.astype(h.dtype)
        h = nn.drop_path(h, drop_rate, train=train)
        return shortcut + h


def convnext(x: jax.Array, num_classes: int = 1000, *,
             train: bool = False, variant: str = "tiny",
             drop_path_rate: float = 0.1,
             layer_scale_init: float = 1e-6) -> jax.Array:
    if variant not in VARIANTS:
        raise ValueError(f"unknown ConvNeXt variant {variant!r}; "
                         f"valid: {sorted(VARIANTS)}")
    depths, dims = VARIANTS[variant]
    total_blocks = sum(depths)
    block_idx = 0
    with nn.scope_named("stem"):
        # patchify stem: 4x4 stride-4 conv + LN
        x = nn.conv(x, dims[0], 4, stride=4, name="conv")
        x = nn.layer_norm(x, name="ln")
    for stage, (depth, dim) in enumerate(zip(depths, dims)):
        if stage > 0:
            with nn.scope_named(f"down{stage}"):
                x = nn.layer_norm(x, name="ln")
                x = nn.conv(x, dim, 2, stride=2, name="conv")
        for b in range(depth):
            # linearly ramped stochastic depth (deeper blocks drop more)
            rate = drop_path_rate * block_idx / max(total_blocks - 1, 1)
            x = _block(x, dim, drop_rate=rate,
                       layer_scale_init=layer_scale_init, train=train,
                       name=f"stage{stage + 1}_block{b + 1}")
            block_idx += 1
    x = nn.gap(x)
    with nn.scope_named("head"):
        x = nn.layer_norm(x[:, None, None, :], name="ln")[:, 0, 0, :]
        return nn.dense(x, num_classes, name="logits")


def convnext_tiny(x, num_classes=1000, *, train=False, **kw):
    return convnext(x, num_classes, train=train, variant="tiny", **kw)


def convnext_small(x, num_classes=1000, *, train=False, **kw):
    return convnext(x, num_classes, train=train, variant="small", **kw)
