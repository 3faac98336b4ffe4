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


def grad_cam(model, params, state, x: jax.Array, *,
             tag: str = "features", class_idx: int | None = None
             ) -> jax.Array:
    """Grad-CAM (Selvaraju et al.) on any model that tags its feature map
    with ``core.tag_intermediate`` (the zoo backbones tag 'features').

    Mechanism: one apply under ``collecting`` captures the tagged map;
    a second under ``overriding`` substitutes it as a differentiable
    input, so ``jax.grad`` yields d(score)/d(features) with no hooks.
    Returns [N, H, W] maps upsampled to the input size.
    """
    from myconvnet_tpu.core.module import collecting, overriding
    from myconvnet_tpu.ops.resize import resize_bilinear

    with collecting() as captured:
        logits, _ = model.apply(params, state, None, x, False)
    matches = [k for k in captured if k.endswith("/" + tag) or k == tag]
    if not matches:
        raise ValueError(
            f"no intermediate tagged {tag!r}; found {sorted(captured)}")
    key = matches[-1]
    feats = captured[key]
    if class_idx is None:
        idx = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    else:
        idx = jnp.full((logits.shape[0],), class_idx)

    def score(f):
        with overriding({key: f}):
            out, _ = model.apply(params, state, None, x, False)
        out = out.astype(jnp.float32)
        return jnp.sum(jnp.take_along_axis(out, idx[:, None], axis=-1))

    g = jax.grad(score)(feats).astype(jnp.float32)       # [N,h,w,C]
    weights = jnp.mean(g, axis=(1, 2), keepdims=True)    # GAP of grads
    cam = jax.nn.relu(jnp.sum(weights * feats.astype(jnp.float32),
                              axis=-1))                  # [N,h,w]
    if cam.shape[1:] != x.shape[1:3]:
        cam = resize_bilinear(cam[..., None], x.shape[1:3])[..., 0]
    return cam


def normalize_map(sal: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Per-image [0, 1] normalization for visualization."""
    lo = jnp.min(sal, axis=tuple(range(1, sal.ndim)), keepdims=True)
    hi = jnp.max(sal, axis=tuple(range(1, sal.ndim)), keepdims=True)
    return (sal - lo) / jnp.maximum(hi - lo, eps)
