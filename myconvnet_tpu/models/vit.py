"""Vision Transformer (Dosovitskiy et al., 2021), NHWC input.

The zoo's attention-era endpoint (beyond the reference's conv-only
scope; mount empty, SURVEY.md §0).  TPU mapping:

* patch embedding = one stride-p conv — a single big MXU matmul over
  (p*p*3, dim) after XLA's im2col-free lowering;
* every block is two LN-sandwiched MXU chains: packed qkv projection
  (one [dim, 3*dim] matmul, not three small ones) -> fused attention
  (``ops.multi_head_attention``: Pallas flash kernel at L >= 256,
  einsum below) -> out-proj; then the 4x MLP;
* LayerNorm/GELU are VPU work XLA fuses into the surrounding matmuls;
  softmax statistics are f32 inside the attention op.

Static shapes throughout: token count is fixed by (image, patch) size,
so one compiled program per resolution — no dynamic padding.

Scope layout mirrors torchvision's ``vit_b_16`` module tree so
``models/pretrained.py`` can map ``conv_proj / class_token /
encoder.pos_embedding / encoder.layers.encoder_layer_i.* / heads.head``
weights directly (see import_torch_vit there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import next_rng_key, param
from myconvnet_tpu.core.precision import current_policy
from myconvnet_tpu.ops.attention import multi_head_attention

# name: (patch, dim, depth, heads, mlp_dim)
VARIANTS = {
    "ti16": (16, 192, 12, 3, 768),
    "s16": (16, 384, 12, 6, 1536),
    "b16": (16, 768, 12, 12, 3072),
    "b32": (32, 768, 12, 12, 3072),
    "l16": (16, 1024, 24, 16, 4096),
    # CPU-test scale: 2 blocks, 8x8 inputs with patch 4 -> L = 5
    "test": (4, 32, 2, 2, 64),
}


def _attention(x, *, heads, attn_dropout, proj_dropout, train):
    b, l, dim = x.shape
    head_dim = dim // heads
    qkv = nn.dense(x, 3 * dim, name="qkv")
    qkv = qkv.reshape(b, l, 3, heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    rate = attn_dropout if train else 0.0
    out = multi_head_attention(
        q, k, v, dropout_rate=rate,
        dropout_rng=next_rng_key() if rate > 0.0 else None,
        use_flash=False if rate > 0.0 else None)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, dim)
    out = nn.dense(out, dim, name="proj")
    return nn.dropout(out, proj_dropout, train=train)


def _block(x, *, heads, mlp_dim, dropout, attn_dropout, drop_path_rate,
           train, name):
    with nn.scope_named(name):
        h = nn.layer_norm(x, name="ln1")
        h = _attention(h, heads=heads, attn_dropout=attn_dropout,
                       proj_dropout=dropout, train=train)
        x = x + nn.drop_path(h, drop_path_rate, train=train)
        h = nn.layer_norm(x, name="ln2")
        with nn.scope_named("mlp"):
            h = nn.dense(h, mlp_dim, name="fc1")
            # exact (erf) GELU: torch nn.GELU default — required for
            # logits agreement with imported torchvision checkpoints
            h = jax.nn.gelu(h, approximate=False)
            h = nn.dropout(h, dropout, train=train)
            h = nn.dense(h, x.shape[-1], name="fc2")
        h = nn.dropout(h, dropout, train=train)
        return x + nn.drop_path(h, drop_path_rate, train=train)


def vit(x: jax.Array, num_classes: int = 1000, *, train: bool = False,
        variant: str = "b16", dropout: float = 0.0,
        attn_dropout: float = 0.0, drop_path_rate: float = 0.0,
        repr_dim: int | None = None) -> jax.Array:
    """ViT forward.  x: [B, H, W, 3] with H, W % patch == 0.

    ``repr_dim`` adds the paper's optional pre-logits tanh head (the
    torchvision ``heads.pre_logits`` slot used by the original JAX
    checkpoints); None (default) matches torchvision's fine-tuned zoo.
    """
    if variant not in VARIANTS:
        raise ValueError(f"unknown ViT variant {variant!r}; "
                         f"valid: {sorted(VARIANTS)}")
    patch, dim, depth, heads, mlp_dim = VARIANTS[variant]
    b, h, w, _ = x.shape
    if h % patch or w % patch:
        raise ValueError(f"input {h}x{w} not divisible by patch {patch}")
    pol = current_policy()

    x = nn.conv(x, dim, patch, stride=patch, padding="VALID",
                name="patch_embed")
    x = x.reshape(b, -1, dim)                       # [B, N, dim]
    n = x.shape[1]

    cls = param("cls_token", (1, 1, dim), pol.param_dtype, init.zeros)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, dim)), x], axis=1)
    pos = param("pos_embed", (1, n + 1, dim), pol.param_dtype,
                init.normal(0.02))
    x = x + pos.astype(x.dtype)
    x = nn.dropout(x, dropout, train=train)

    total = max(depth - 1, 1)
    for i in range(depth):
        x = _block(x, heads=heads, mlp_dim=mlp_dim, dropout=dropout,
                   attn_dropout=attn_dropout,
                   drop_path_rate=drop_path_rate * i / total,
                   train=train, name=f"block{i + 1}")
    x = nn.layer_norm(x, name="ln")
    x = x[:, 0]                                     # CLS token
    with nn.scope_named("head"):
        if repr_dim is not None:
            x = jnp.tanh(nn.dense(x, repr_dim, name="pre_logits"))
        return nn.dense(x, num_classes, name="logits")


def vit_ti16(x, num_classes=1000, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="ti16", **kw)


def vit_s16(x, num_classes=1000, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="s16", **kw)


def vit_b16(x, num_classes=1000, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="b16", **kw)


def vit_b32(x, num_classes=1000, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="b32", **kw)


def vit_l16(x, num_classes=1000, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="l16", **kw)


def tinyvit(x, num_classes=10, *, train=False, **kw):
    return vit(x, num_classes, train=train, variant="test", **kw)
