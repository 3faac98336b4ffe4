"""Denoising-diffusion models (seventh task family, beyond the
reference's cls/seg/GAN scope; mount empty, SURVEY.md §0).

* :func:`ddpm_unet` — the DDPM epsilon-predictor (Ho et al., 2020):
  a time-conditioned UNet with GroupNorm+SiLU residual blocks,
  self-attention at chosen feature resolutions, stride-2 conv
  downsampling and nearest+conv upsampling.  TPU notes:

  - every block is static-shape dense conv work — the whole forward
    is MXU matmuls with XLA-fused normalization/activation around
    them; attention rides ``ops.attention.multi_head_attention``
    (the Pallas flash kernel once L >= 256, i.e. from 16x16 maps up);
  - the timestep embedding is a [N, D] tensor broadcast-added after
    each block's first conv — no per-sample control flow, so one
    program serves every t;
  - the final conv and every residual branch's second conv are
    ZERO-initialized, the DDPM init that makes the net an identity
    map at step 0 (stable at any depth — same principle as the SR
    zoo's zero-init residual tails, models/sr.py).

The function fits the zoo's ``fn(x, num_classes, train=)`` calling
shape with an extra ``t`` argument: ``ddpm_unet(x, t, train=...)``.
Value space is [-1, 1] RGB like the DCGAN path (recipes.build_gan).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import init
from myconvnet_tpu.ops.attention import multi_head_attention
from myconvnet_tpu.ops.resize import upsample2x_nearest


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding [N] -> [N, dim] (Transformer/DDPM).

    Computed in f32: at bf16, adjacent large timesteps collide in the
    low-frequency channels and the model cannot distinguish them.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _norm_groups(c: int) -> int:
    """Largest group count <= 32 that divides c (tiny variants use
    channel widths below 32)."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


def _res_block(x: jax.Array, temb: jax.Array, out_ch: int, *,
               train: bool, dropout: float) -> jax.Array:
    """GN -> SiLU -> conv3x3 -> (+ time proj) -> GN -> SiLU -> dropout
    -> zero-init conv3x3, plus a (projected) skip."""
    with nn.scope_named("resblock"):
        h = nn.swish(nn.group_norm(x, groups=_norm_groups(x.shape[-1]),
                                   name="gn1"))
        h = nn.conv(h, out_ch, 3, name="conv1")
        # per-sample scalar shift per channel, broadcast over H, W
        tproj = nn.dense(nn.swish(temb), out_ch, name="temb_proj")
        h = h + tproj[:, None, None, :].astype(h.dtype)
        h = nn.swish(nn.group_norm(h, groups=_norm_groups(out_ch),
                                   name="gn2"))
        h = nn.dropout(h, dropout, train=train)
        h = nn.conv(h, out_ch, 3, w_init=init.zeros, name="conv2")
        if x.shape[-1] != out_ch:
            x = nn.conv(x, out_ch, 1, name="skip")
        return x + h


def _attn_block(x: jax.Array, *, num_heads: int = 4) -> jax.Array:
    """Self-attention over the HxW positions (one head per 64 channels
    capped at num_heads); zero-init output proj keeps it an identity
    at step 0."""
    n, h, w, c = x.shape
    heads = max(1, min(num_heads, c // 8))
    with nn.scope_named("attn"):
        y = nn.group_norm(x, groups=_norm_groups(c), name="gn")
        qkv = nn.dense(y.reshape(n, h * w, c), 3 * c, name="qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(n, h * w, heads, c // heads).transpose(
                0, 2, 1, 3)

        o = multi_head_attention(split_heads(q), split_heads(k),
                                 split_heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(n, h * w, c)
        o = nn.dense(o, c, w_init=init.zeros, name="proj")
        return x + o.reshape(n, h, w, c)


def ddpm_unet(x: jax.Array, t: jax.Array, y: jax.Array | None = None, *,
              train: bool = False,
              base: int = 128,
              channel_mults: Sequence[int] = (1, 2, 2, 2),
              num_res_blocks: int = 2,
              attn_resolutions: Sequence[int] = (16,),
              dropout: float = 0.1,
              num_classes: int = 0,
              out_ch: int | None = None) -> jax.Array:
    """DDPM UNet epsilon-predictor: ([N,H,W,C], [N] int timesteps) ->
    [N,H,W,out_ch].  The CIFAR-10 paper config is the default
    (base=128, mults 1/2/2/2, 2 res blocks, attention at 16x16).

    ``num_classes > 0`` makes the model class-conditional: a learned
    class embedding (one EXTRA null row at index ``num_classes``, the
    classifier-free-guidance unconditional token) is added to the time
    embedding.  ``y`` is then [N] int labels (required)."""
    out_ch = out_ch or x.shape[-1]
    temb_dim = base * 4
    temb = timestep_embedding(t, base)
    with nn.scope_named("time_mlp"):
        temb = nn.dense(temb, temb_dim, name="fc1")
        temb = nn.dense(nn.swish(temb), temb_dim, name="fc2")
    if num_classes > 0:
        if y is None:
            raise ValueError("conditional model (num_classes>0) needs y")
        with nn.scope_named("class_emb"):
            from myconvnet_tpu.core.module import param
            table = param("emb", (num_classes + 1, temb_dim),
                          jnp.float32, init.normal(0.02))
        temb = temb + table[y].astype(temb.dtype)

    h = nn.conv(x, base, 3, name="stem")
    hs = [h]
    # ------------------------------------------------- down path
    for level, mult in enumerate(channel_mults):
        ch = base * mult
        for _ in range(num_res_blocks):
            h = _res_block(h, temb, ch, train=train, dropout=dropout)
            if h.shape[1] in attn_resolutions:
                h = _attn_block(h)
            hs.append(h)
        if level != len(channel_mults) - 1:
            h = nn.conv(h, ch, 3, stride=2, name="down")
            hs.append(h)
    # ------------------------------------------------- middle
    h = _res_block(h, temb, h.shape[-1], train=train, dropout=dropout)
    h = _attn_block(h)
    h = _res_block(h, temb, h.shape[-1], train=train, dropout=dropout)
    # ------------------------------------------------- up path
    for level, mult in reversed(list(enumerate(channel_mults))):
        ch = base * mult
        for _ in range(num_res_blocks + 1):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = _res_block(h, temb, ch, train=train, dropout=dropout)
            if h.shape[1] in attn_resolutions:
                h = _attn_block(h)
        if level != 0:
            h = nn.conv(upsample2x_nearest(h), ch, 3, name="up")
    assert not hs, "skip stack must drain exactly"
    h = nn.swish(nn.group_norm(h, groups=_norm_groups(h.shape[-1]),
                               name="out_gn"))
    return nn.conv(h, out_ch, 3, w_init=init.zeros,
                   name="out_conv").astype(jnp.float32)


def tiny_ddpm_unet(x: jax.Array, t: jax.Array,
                   y: jax.Array | None = None, *,
                   train: bool = False, **kw) -> jax.Array:
    """CPU-runnable smoke variant (same code path, ~60k params)."""
    kw.setdefault("base", 16)
    kw.setdefault("channel_mults", (1, 2))
    kw.setdefault("num_res_blocks", 1)
    kw.setdefault("attn_resolutions", (x.shape[1] // 2,))
    kw.setdefault("dropout", 0.0)
    return ddpm_unet(x, t, y, train=train, **kw)
