"""Metric-learning losses: ArcFace / CosFace margin softmax + batch-hard
triplet.

Tenth task family (deep metric learning / face recognition — the
classic companion workload to the reference's classification stack;
SURVEY.md §2#2's head variants).  Design notes:

* The margin losses consume RAW COSINES from ``models.embedding_net``
  (the model L2-normalizes both the embedding and the class-weight
  columns, so ``cos`` is exactly cos(theta)).  Applying the angular
  margin here — in the loss, on the target column only — keeps the
  model a pure forward function and the whole thing rides the standard
  ConvNet/Trainer path unchanged.
* Everything reduces in f32 (bf16 sums over N*C margin terms lose
  mantissa — the same hazard the detection losses hit, see
  train/detection.py).
* The triplet loss is the batch-hard form (Hermans et al., "In Defense
  of the Triplet Loss"): hardest positive / hardest negative per
  anchor via masked max/min over the in-batch pairwise distance matrix
  — all static-shape broadcast arithmetic, no sorting or gathers, so
  XLA fuses it into a few HBM sweeps.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def arcface_loss(cos: jax.Array, labels: jax.Array, *,
                 s: float = 64.0, m: float = 0.5) -> jax.Array:
    """Additive angular margin (ArcFace, Deng et al. 2019).

    ``cos``: [N, C] raw cosines in [-1, 1]; ``labels``: int [N].
    The target column becomes cos(theta + m); the official easy-margin
    guard keeps the logit monotonic where theta + m would pass pi
    (cos > cos(pi - m) -> margin form, else the linear fallback
    cos - m*sin(m)).
    """
    cos = cos.astype(jnp.float32)
    # lower clip bound: grad(sqrt) at exactly 0 is inf, and |cos| == 1
    # does occur (an embedding aligned with its weight column), so bound
    # sin away from 0 — the 1e-6 floor shifts phi by < 1e-6*sin(m)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 1e-12, 1.0))
    phi = cos * math.cos(m) - sin * math.sin(m)        # cos(theta + m)
    phi = jnp.where(cos > math.cos(math.pi - m),
                    phi, cos - math.sin(math.pi - m) * m)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=jnp.float32)
    logits = s * (onehot * phi + (1.0 - onehot) * cos)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def cosface_loss(cos: jax.Array, labels: jax.Array, *,
                 s: float = 30.0, m: float = 0.35) -> jax.Array:
    """Additive cosine margin (CosFace, Wang et al. 2018):
    target logit = s*(cos - m), the simpler linear-margin sibling."""
    cos = cos.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=jnp.float32)
    logits = s * (cos - m * onehot)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def pairwise_distances(emb: jax.Array, *,
                       squared: bool = False) -> jax.Array:
    """[N, N] Euclidean distances from [N, D] embeddings via the
    |a|^2 + |b|^2 - 2ab expansion (one matmul, MXU-friendly)."""
    emb = emb.astype(jnp.float32)
    dot = emb @ emb.T                                   # [N, N]
    sq = jnp.diagonal(dot)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * dot, 0.0)
    if squared:
        return d2
    # grad(sqrt) at exactly 0 is inf; the diagonal is always 0
    return jnp.sqrt(d2 + 1e-12)


def batch_hard_triplet_loss(emb: jax.Array, labels: jax.Array, *,
                            margin: float = 0.3,
                            soft: bool = False) -> jax.Array:
    """Batch-hard triplet loss over [N, D] embeddings / int [N] labels.

    Per anchor: hardest (farthest) same-class positive, hardest
    (nearest) different-class negative; hinge ``relu(hp - hn + margin)``
    or the soft-margin ``softplus(hp - hn)`` variant.  Anchors without
    at least one positive AND one negative in the batch are masked out
    of the mean (use the PK sampler — data.pipeline ``pk=(P, K)`` — to
    guarantee K same-identity samples per batch).
    """
    d = pairwise_distances(emb)
    same = (labels[:, None] == labels[None, :])
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    hardest_pos = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
    gap = jnp.where(valid, hardest_pos - hardest_neg, 0.0)
    if soft:
        per = jax.nn.softplus(gap)
    else:
        per = jax.nn.relu(gap + margin)
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
