"""Embedding networks for deep metric learning (tenth task family).

``embedding_net`` wraps ANY registered classifier backbone: the
backbone's final FC is re-purposed to emit a D-dim raw embedding
(``num_classes=embed_dim``), which is L2-normalized.  At train time the
margin heads ("arcface"/"cosface") return raw cosines against an
L2-normalized class-weight matrix — the angular/cosine margin itself is
applied in the LOSS (train/metric_losses.py), keeping this a pure
forward function; the "triplet" head has no class weights at all.  At
eval time every head returns the normalized embedding, which is what
retrieval evaluation, ``ConvNet.predict`` (= extract embeddings) and
serving consume — the margin head is a training-only artifact, exactly
the ArcFace deployment convention.

Rebuild note: the reference mount was empty (SURVEY.md §0); metric
learning is scoped from SURVEY.md §2#2's head-variant row and the
standard ArcFace/CosFace/triplet literature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu import nn
from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import param, scope
from myconvnet_tpu.core.precision import current_policy

_HEADS = ("arcface", "cosface", "triplet")


def l2_normalize(x: jax.Array, axis: int = -1,
                 eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                         axis=axis, keepdims=True) + eps)
    return (x.astype(jnp.float32) / n).astype(x.dtype)


def embedding_net(x: jax.Array, num_classes: int = 1000, *,
                  train: bool = False, backbone: str = "resnet50",
                  embed_dim: int = 512, head: str = "arcface",
                  backbone_kwargs: dict | None = None) -> jax.Array:
    """[N, H, W, 3] -> cosines [N, num_classes] (train, margin heads)
    or L2-normalized embeddings [N, embed_dim] (eval / triplet).

    ``num_classes`` is the identity count (margin-head classes)."""
    if head not in _HEADS:
        raise ValueError(f"unknown head {head!r}; valid: {_HEADS}")
    from myconvnet_tpu import models  # deferred: registry import cycle
    backbone_fn = models.get_model(backbone)
    with scope("backbone"):
        raw = backbone_fn(x, num_classes=embed_dim, train=train,
                          **(backbone_kwargs or {}))
    emb = l2_normalize(raw)
    emb = nn.tag_intermediate("embedding", emb)
    if head == "triplet" or not train:
        return emb
    with scope("margin_head"):
        pol = current_policy()
        w = param("w", (embed_dim, num_classes), pol.param_dtype,
                  init.glorot_uniform())
    # cos(theta): both sides unit-norm.  f32 dot — N*C cosines feed a
    # margin + log-softmax, where bf16 resolution visibly shifts the
    # loss (same reduction hazard as the detection losses).
    return emb.astype(jnp.float32) @ l2_normalize(
        w.astype(jnp.float32), axis=0)


def tinyembed(x: jax.Array, num_classes: int = 8, *,
              train: bool = False, head: str = "arcface",
              embed_dim: int = 32) -> jax.Array:
    """CPU-scale smoke variant (smallnet trunk, 32-d embedding)."""
    return embedding_net(x, num_classes, train=train,
                         backbone="smallnet", embed_dim=embed_dim,
                         head=head, backbone_kwargs={"width": 8})
