"""Multi-head attention ops (the ViT family's compute core).

Two exact implementations of the same math:

* :func:`attention_reference` — plain einsum attention.  XLA fuses it
  well at short sequence lengths; it materializes the [B, H, L, L]
  probability tensor, which is also what attention dropout needs.
* :func:`ops.pallas.flash_attention.flash_attention` — the Pallas
  kernel that never writes scores to HBM (docstring there).

:func:`multi_head_attention` picks between them: flash on TPU for
sequences long enough that the [L, L] HBM traffic dominates, reference
otherwise (CPU tests, short sequences, or attn_dropout > 0 — dropping
score entries requires the scores).  Chip A/B (v5e, bf16, ViT shapes):
L=197 the two are equal (0.027 vs 0.025 ms fwd); L=1025 flash is 1.8x
fwd (2.55 -> 1.41 ms) and 1.7x bwd (7.26 -> 4.21 ms), so the dispatch
threshold is L >= 256.

Softmax statistics are always f32 (bf16 exp/sums over L terms lose
mantissa; same policy as the detection losses).

No reference counterpart (attention postdates the reference's scope;
mount empty, SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu.ops.pallas.flash_attention import flash_attention


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array, *,
                        scale: float | None = None,
                        dropout_rate: float = 0.0,
                        dropout_rng: jax.Array | None = None) -> jax.Array:
    """Einsum attention.  q, k, v: [B, H, L, D] -> [B, H, L, D]."""
    d = q.shape[-1]
    if scale is None:
        scale = float(d) ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, p.shape)
        p = jnp.where(mask, p / keep, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         scale: float | None = None,
                         dropout_rate: float = 0.0,
                         dropout_rng: jax.Array | None = None,
                         use_flash: bool | None = None) -> jax.Array:
    """Dispatching MHA: flash kernel when it applies, einsum otherwise."""
    if use_flash is None:
        use_flash = (jax.default_backend() == "tpu"
                     and dropout_rate == 0.0
                     and q.shape[-2] >= 256)
    if use_flash and dropout_rate > 0.0:
        raise ValueError("flash attention does not support attention-"
                         "probability dropout; use the reference path")
    if use_flash:
        return flash_attention(q, k, v, scale=scale)
    return attention_reference(q, k, v, scale=scale,
                               dropout_rate=dropout_rate,
                               dropout_rng=dropout_rng)
