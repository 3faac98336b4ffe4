"""Swin Transformer (Liu et al., 2021), NHWC input.

The hierarchical attention family (beyond the reference's conv-only
scope; mount empty, SURVEY.md §0).  TPU mapping:

* window partition/reverse are pure reshape+transpose (static window
  counts — no gathers, no dynamic shapes), so windowed attention is a
  batched [B*nW, ws², C] einsum chain on the MXU; at ws=7 the sequence
  is 49 tokens and the [49, 49] score tile lives comfortably in VMEM —
  exactly the regime where the einsum path beats a flash kernel
  (ops/attention.py dispatch threshold is L >= 256 for this reason).
* the shifted-window interaction is ``jnp.roll`` (a lane rotation XLA
  lowers to cheap collective-permute-style data movement on device)
  plus a STATIC additive attention mask computed with numpy at trace
  time from the (H, W, window, shift) geometry.
* relative position bias is a [(2w-1)², heads] table gathered with a
  static index matrix — one small gather per layer, constant-folded
  into the attention bias add.
* patch merging = space-to-depth reshape + LN + dense (the same
  2x2-concat trick the ResNet bench stem uses, here as the down-
  sampling operator between stages).

Static shapes throughout: stage resolutions are fixed by the input, so
one compiled program per resolution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import param

# name: (embed_dim, depths, heads, window)
VARIANTS = {
    "t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    # CPU-test scale: 2 stages on 32x32 inputs (patch 2 -> 16 -> 8)
    "test": (16, (1, 1), (2, 2), 4),
}


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (row-major windows)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(x: jax.Array, ws: int, hw: tuple[int, int],
                    b: int) -> jax.Array:
    """Inverse of :func:`_window_partition`."""
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static [ws², ws²] index into the (2w-1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))         # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hw: tuple[int, int], ws: int,
                     shift: int) -> np.ndarray:
    """Static additive mask [nW, n, n] for shifted-window attention:
    tokens rolled in from across the image edge must not attend to the
    window's original content (the paper's cyclic-shift masking)."""
    h, w = hw
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    win = np.asarray(_window_partition(jnp.asarray(img), ws))[..., 0]
    diff = win[:, None, :] - win[:, :, None]               # [nW, n, n]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


def _window_attention(x: jax.Array, *, heads: int, ws: int,
                      mask: np.ndarray | None, name: str) -> jax.Array:
    """Attention within windows + relative position bias.
    x: [B*nW, n, C] with n = ws².  Softmax statistics in f32 (the
    framework-wide bf16-sum policy)."""
    bn, n, c = x.shape
    head_dim = c // heads
    with nn.scope_named(name):
        qkv = nn.dense(x, 3 * c, name="qkv")
        qkv = qkv.reshape(bn, n, 3, heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scale = float(head_dim) ** -0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale     # [B*nW,h,n,n]
        table = param("rel_bias", ((2 * ws - 1) ** 2, heads),
                      jnp.float32, init.normal(0.02))
        idx = _relative_position_index(ws)                # static
        bias = table[idx.reshape(-1)].reshape(n, n, heads)
        s = s + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            s = s.reshape(bn // nw, nw, heads, n, n) \
                + jnp.asarray(mask)[None, :, None]
            s = s.reshape(bn, heads, n, n)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(bn, n, c)
        return nn.dense(out, c, name="proj")


def _swin_block(x: jax.Array, hw: tuple[int, int], *, heads: int,
                ws: int, shift: int, mlp_ratio: float, dropout: float,
                drop_path_rate: float, train: bool,
                name: str) -> jax.Array:
    """One W-MSA / SW-MSA block on the [B, H*W, C] token grid."""
    b, l, c = x.shape
    h, w = hw
    with nn.scope_named(name):
        res = x
        y = nn.layer_norm(x, name="ln1").reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(y, ws)
        mask = _shift_attn_mask((h, w), ws, shift) if shift > 0 else None
        attn = _window_attention(windows, heads=heads, ws=ws, mask=mask,
                                 name="attn")
        y = _window_reverse(attn, ws, (h, w), b)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = res + nn.drop_path(y.reshape(b, l, c), drop_path_rate,
                               train=train)
        y = nn.layer_norm(x, name="ln2")
        with nn.scope_named("mlp"):
            y = nn.dense(y, int(c * mlp_ratio), name="fc1")
            y = jax.nn.gelu(y, approximate=False)
            y = nn.dropout(y, dropout, train=train)
            y = nn.dense(y, c, name="fc2")
        y = nn.dropout(y, dropout, train=train)
        return x + nn.drop_path(y, drop_path_rate, train=train)


def _patch_merging(x: jax.Array, hw: tuple[int, int],
                   name: str) -> tuple[jax.Array, tuple[int, int]]:
    """2x2 space-to-depth + LN + dense(2C): the downsampling operator."""
    b, l, c = x.shape
    h, w = hw
    with nn.scope_named(name):
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // 2) * (w // 2),
                                                  4 * c)
        y = nn.layer_norm(y, name="ln")
        y = nn.dense(y, 2 * c, use_bias=False, name="reduce")
    return y, (h // 2, w // 2)


def swin(x: jax.Array, num_classes: int = 1000, *, train: bool = False,
         variant: str = "t", patch: int = 4, mlp_ratio: float = 4.0,
         dropout: float = 0.0, drop_path_rate: float = 0.2) -> jax.Array:
    """Swin forward.  x: [B, H, W, 3]; every stage resolution must be
    divisible by its effective window (224 with patch 4 / window 7
    works: 56 -> 28 -> 14 -> 7)."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown Swin variant {variant!r}; "
                         f"valid: {sorted(VARIANTS)}")
    dim, depths, heads, ws = VARIANTS[variant]
    b, h, w, _ = x.shape
    if h % patch or w % patch:
        raise ValueError(f"input {h}x{w} not divisible by patch {patch}")

    x = nn.conv(x, dim, patch, stride=patch, padding="VALID",
                name="patch_embed")
    hw = (h // patch, w // patch)
    x = x.reshape(b, hw[0] * hw[1], dim)
    x = nn.layer_norm(x, name="ln_embed")
    x = nn.dropout(x, dropout, train=train)

    total = max(sum(depths) - 1, 1)
    blk = 0
    for stage, (depth, n_heads) in enumerate(zip(depths, heads)):
        if stage > 0:
            x, hw = _patch_merging(x, hw, name=f"merge{stage}")
        # windows never exceed the stage resolution; when they equal it
        # there is a single window and shifting is a no-op (disabled)
        eff_ws = min(ws, hw[0], hw[1])
        if hw[0] % eff_ws or hw[1] % eff_ws:
            raise ValueError(f"stage {stage}: resolution {hw} not "
                             f"divisible by window {eff_ws}")
        for i in range(depth):
            shift = (eff_ws // 2) if (i % 2 == 1) \
                and eff_ws < min(hw) else 0
            x = _swin_block(
                x, hw, heads=n_heads, ws=eff_ws, shift=shift,
                mlp_ratio=mlp_ratio, dropout=dropout,
                drop_path_rate=drop_path_rate * blk / total, train=train,
                name=f"stage{stage + 1}_block{i + 1}")
            blk += 1

    x = nn.layer_norm(x, name="ln")
    x = jnp.mean(x, axis=1)                     # global token pooling
    x = nn.tag_intermediate("features", x)
    with nn.scope_named("head"):
        return nn.dense(x, num_classes, name="logits")


def swin_t(x, num_classes=1000, *, train=False, **kw):
    return swin(x, num_classes, train=train, variant="t", **kw)


def swin_s(x, num_classes=1000, *, train=False, **kw):
    return swin(x, num_classes, train=train, variant="s", **kw)


def swin_b(x, num_classes=1000, *, train=False, **kw):
    return swin(x, num_classes, train=train, variant="b", **kw)


def tinyswin(x, num_classes=10, *, train=False, **kw):
    kw.setdefault("patch", 2)
    kw.setdefault("drop_path_rate", 0.0)
    return swin(x, num_classes, train=train, variant="test", **kw)
