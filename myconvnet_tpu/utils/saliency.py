"""Attribution maps: input-gradient, SmoothGrad, Integrated Gradients.

Model-inspection utilities of the reference's research-framework era,
expressed JAX-natively: every method is a pure function of
``forward(x) -> logits`` built from ``jax.grad`` w.r.t. the INPUT, so it
works on any model in the zoo with no hooks or model surgery (unlike
framework-specific CAM implementations).  All of it jits; the
SmoothGrad/IG sample loops are ``lax.scan``s so each method stays one
XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _score_fn(forward: Callable, class_idx):
    """d(score)/d(input) target: summed logit of the chosen class
    (argmax per-image when class_idx is None)."""

    def score(x):
        logits = forward(x).astype(jnp.float32)
        if class_idx is None:
            idx = jnp.argmax(logits, axis=-1)
        else:
            idx = jnp.full((logits.shape[0],), class_idx)
        return jnp.sum(jnp.take_along_axis(logits, idx[:, None],
                                           axis=-1))

    return score


def input_gradient(forward: Callable, x: jax.Array,
                   class_idx: int | None = None) -> jax.Array:
    """Vanilla saliency: |d score / d x|, channel-maxed -> [N, H, W]."""
    g = jax.grad(_score_fn(forward, class_idx))(x.astype(jnp.float32))
    return jnp.max(jnp.abs(g), axis=-1)


def smoothgrad(forward: Callable, x: jax.Array, key: jax.Array, *,
               samples: int = 16, noise_scale: float = 0.1,
               class_idx: int | None = None) -> jax.Array:
    """SmoothGrad (Smilkov et al.): average input-gradients over noisy
    copies.  noise_scale is relative to the input's value range."""
    xf = x.astype(jnp.float32)
    sigma = noise_scale * (jnp.max(xf) - jnp.min(xf))
    grad_fn = jax.grad(_score_fn(forward, class_idx))

    def body(acc, k):
        noisy = xf + sigma * jax.random.normal(k, xf.shape)
        return acc + grad_fn(noisy), None

    keys = jax.random.split(key, samples)
    total, _ = jax.lax.scan(body, jnp.zeros_like(xf), keys)
    return jnp.max(jnp.abs(total / samples), axis=-1)


def integrated_gradients(forward: Callable, x: jax.Array, *,
                         steps: int = 32, baseline: jax.Array | None = None,
                         class_idx: int | None = None) -> jax.Array:
    """Integrated Gradients (Sundararajan et al.): path integral of the
    gradient from baseline to input; attributions sum to
    score(x) - score(baseline) (completeness axiom — tested)."""
    xf = x.astype(jnp.float32)
    base = jnp.zeros_like(xf) if baseline is None \
        else baseline.astype(jnp.float32)
    grad_fn = jax.grad(_score_fn(forward, class_idx))
    # midpoint rule over alpha in (0, 1)
    alphas = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps

    def body(acc, a):
        return acc + grad_fn(base + a * (xf - base)), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(xf), alphas)
    return (xf - base) * total / steps


def normalize_map(sal: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Per-image [0, 1] normalization for visualization."""
    lo = jnp.min(sal, axis=tuple(range(1, sal.ndim)), keepdims=True)
    hi = jnp.max(sal, axis=tuple(range(1, sal.ndim)), keepdims=True)
    return (sal - lo) / jnp.maximum(hi - lo, eps)
