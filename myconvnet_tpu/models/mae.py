"""Masked Autoencoder (He et al., 2022) — self-supervised ViT pretraining.

Beyond the reference's supervised-only scope (mount empty, SURVEY.md §0);
the fifth task family (self-supervised) rides on the ViT assembly.

TPU mapping:

* The encoder runs on the VISIBLE tokens only — with the paper's 75%
  mask ratio that is a 4x sequence-length cut, i.e. ~16x less attention
  FLOPs and 4x less MLP FLOPs than a full ViT forward.  The kept-token
  count is STATIC (``int(n * (1 - mask_ratio))``), so one compiled
  program: the per-image randomness lives in ``argsort(uniform)``
  permutations and two ``take_along_axis`` gathers (shuffle + restore),
  both tiny next to the block matmuls.
* Encoder scopes are IDENTICAL to ``models/vit.py`` (``patch_embed``,
  ``cls_token``/``pos_embed`` at root, ``block{i}``, ``ln``), so a
  pretrained MAE encoder warm-starts a ViT classifier through the flat
  ``scope::name`` npz path (``export_encoder_npz`` +
  ``pretrained=dict(path=...)`` — models/pretrained.load_npz_weights
  does a subset restore; the classifier head stays fresh).
* The decoder is its own narrow transformer under the ``decoder`` scope
  (excluded from the export); reconstruction targets are (optionally
  per-patch-normalized) pixels, loss on masked patches only — computed
  in f32 by train/ssl.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import next_rng_key, param
from myconvnet_tpu.models.vit import VARIANTS, _block


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, N, patch*patch*C] (row-major patch order —
    matches the stride-p conv token order of the patch embedding)."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def unpatchify(p: jax.Array, patch: int, hw: tuple[int, int],
               channels: int = 3) -> jax.Array:
    """Inverse of :func:`patchify` — for reconstruction visualization."""
    b, n, _ = p.shape
    gh, gw = hw[0] // patch, hw[1] // patch
    x = p.reshape(b, gh, gw, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * patch, gw * patch, channels)


def random_masking(key: jax.Array, x: jax.Array, mask_ratio: float):
    """Per-image uniform random token masking (the paper's scheme).

    x: [B, N, D].  Returns (x_kept [B, K, D], mask [B, N] with 1 =
    masked, ids_restore [B, N]).  K = int(N * (1 - mask_ratio)) is
    static, so the program shape never depends on the draw.
    """
    b, n, _ = x.shape
    len_keep = max(int(n * (1.0 - mask_ratio)), 1)
    noise = jax.random.uniform(key, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)          # [B, N]
    ids_restore = jnp.argsort(ids_shuffle, axis=1)    # [B, N]
    ids_keep = ids_shuffle[:, :len_keep]
    x_kept = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    # 0 = kept, 1 = masked, in shuffled order; unshuffle to token order
    mask = jnp.concatenate(
        [jnp.zeros((b, len_keep), x.dtype),
         jnp.ones((b, n - len_keep), x.dtype)], axis=1)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_kept, mask, ids_restore


def mae(x: jax.Array, *, variant: str = "b16", mask_ratio: float = 0.75,
        decoder_dim: int = 512, decoder_depth: int = 8,
        decoder_heads: int = 16, norm_pix: bool = True,
        train: bool = False, features_only: bool = False):
    """MAE forward.  x: [B, H, W, 3] float (normalized pixels).

    Returns ``(pred [B, N, p*p*3], target [B, N, p*p*3], mask [B, N])``;
    the pretraining loss is the masked-patch MSE (train/ssl.py).

    ``features_only=True`` skips masking and the decoder and returns the
    mean-pooled encoder tokens [B, dim] (the paper's linear-probe /
    kNN-eval feature) — same parameters, second entry point.
    """
    if variant not in VARIANTS:
        raise ValueError(f"unknown ViT variant {variant!r}; "
                         f"valid: {sorted(VARIANTS)}")
    patch, dim, depth, heads, mlp_dim = VARIANTS[variant]
    b, h, w, c = x.shape
    if h % patch or w % patch:
        raise ValueError(f"input {h}x{w} not divisible by patch {patch}")

    # ---------------------------------------------------------- encoder
    # (scope names mirror models/vit.py exactly — warm-start contract)
    tok = nn.conv(x, dim, patch, stride=patch, padding="VALID",
                  name="patch_embed")
    tok = tok.reshape(b, -1, dim)                     # [B, N, dim]
    n = tok.shape[1]
    pos = param("pos_embed", (1, n + 1, dim), jnp.float32,
                init.normal(0.02))
    cls = param("cls_token", (1, 1, dim), jnp.float32, init.zeros)
    tok = tok + pos[:, 1:].astype(tok.dtype)

    if features_only:
        kept, mask, ids_restore = tok, None, None
    else:
        kept, mask, ids_restore = random_masking(
            next_rng_key(), tok, mask_ratio)
    cls_tok = (cls + pos[:, :1]).astype(tok.dtype)
    y = jnp.concatenate(
        [jnp.broadcast_to(cls_tok, (b, 1, dim)), kept], axis=1)
    for i in range(depth):
        y = _block(y, heads=heads, mlp_dim=mlp_dim, dropout=0.0,
                   attn_dropout=0.0, drop_path_rate=0.0, train=train,
                   name=f"block{i + 1}")
    y = nn.layer_norm(y, name="ln")

    if features_only:
        return jnp.mean(y[:, 1:], axis=1)             # pooled patch tokens

    # ---------------------------------------------------------- decoder
    with nn.scope_named("decoder"):
        y = nn.dense(y, decoder_dim, name="embed")    # [B, 1+K, dec]
        mask_token = param("mask_token", (1, 1, decoder_dim),
                           jnp.float32, init.normal(0.02))
        k = y.shape[1] - 1
        filled = jnp.concatenate(
            [y[:, 1:],
             jnp.broadcast_to(mask_token.astype(y.dtype),
                              (b, n - k, decoder_dim))], axis=1)
        filled = jnp.take_along_axis(filled, ids_restore[:, :, None],
                                     axis=1)          # token order
        y = jnp.concatenate([y[:, :1], filled], axis=1)
        dpos = param("pos_embed", (1, n + 1, decoder_dim), jnp.float32,
                     init.normal(0.02))
        y = y + dpos.astype(y.dtype)
        for i in range(decoder_depth):
            y = _block(y, heads=decoder_heads,
                       mlp_dim=4 * decoder_dim, dropout=0.0,
                       attn_dropout=0.0, drop_path_rate=0.0,
                       train=train, name=f"block{i + 1}")
        y = nn.layer_norm(y, name="ln")
        pred = nn.dense(y, patch * patch * c, name="pred")[:, 1:]

    target = patchify(x, patch)
    if norm_pix:
        # per-patch normalization (the paper's default target): predicts
        # local structure, not absolute brightness — in f32, the moment
        # sums over p*p*3 bf16 terms would lose mantissa
        t32 = target.astype(jnp.float32)
        mean = t32.mean(axis=-1, keepdims=True)
        var = t32.var(axis=-1, keepdims=True)
        target = ((t32 - mean) / jnp.sqrt(var + 1e-6)).astype(target.dtype)
    return pred, target, mask


def mae_b16(x, **kw):
    return mae(x, variant="b16", **kw)


def mae_l16(x, **kw):
    return mae(x, variant="l16", **kw)


def tinymae(x, **kw):
    """CPU-test scale: ViT 'test' variant encoder + 1-block decoder."""
    kw.setdefault("decoder_dim", 32)
    kw.setdefault("decoder_depth", 1)
    kw.setdefault("decoder_heads", 2)
    return mae(x, variant="test", **kw)
