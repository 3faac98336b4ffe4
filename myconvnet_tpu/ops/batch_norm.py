"""Fused batch normalization, forward + hand-derived backward.

TPU-native replacement for the reference's ``tf.nn.fused_batch_norm``-based
helper (reference: convnet.py batch_norm; mount empty — SURVEY.md §2#1,
§7 hard-part #3).  Matches TF semantics:

* training: normalize by *biased* batch variance; return batch mean and
  biased variance for the caller's moving-average update
  (``moving = momentum * moving + (1-momentum) * batch``).
* inference: normalize by moving statistics.
* statistics and normalization math in float32 even under bf16 compute.

The backward pass is a hand-derived ``custom_vjp`` using the saved
(mean, rstd) residuals — the same residual strategy cuDNN/TF fused BN uses —
so the gradient recomputes nothing and XLA fuses it into two reductions
plus elementwise work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     eps: float = 1e-3):
    """Returns (y, batch_mean, batch_var); reduces over all but last axis."""
    y, mean, var, _ = _bn_fwd_impl(x, gamma, beta, eps)
    return y, mean, var


def _bn_fwd_impl(x, gamma, beta, eps):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype), mean, var, rstd


def _bn_train_fwd(x, gamma, beta, eps):
    y, mean, var, rstd = _bn_fwd_impl(x, gamma, beta, eps)
    return (y, mean, var), (x, gamma, mean, rstd)


def _bn_train_bwd(eps, residuals, cotangents):
    x, gamma, mean, rstd = residuals
    dy, _dmean, _dvar = cotangents  # stat cotangents unused (stats feed EMA)
    axes = tuple(range(x.ndim - 1))
    m = 1
    for a in axes:
        m *= x.shape[a]
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dbeta = jnp.sum(dyf, axis=axes)
    dgamma = jnp.sum(dyf * xhat, axis=axes)
    scale = gamma.astype(jnp.float32) * rstd / m
    dx = scale * (m * dyf - dbeta - xhat * dgamma)
    return (dx.astype(x.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(gamma.dtype))


batch_norm_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def batch_norm_inference(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                         mean: jax.Array, var: jax.Array,
                         eps: float = 1e-3) -> jax.Array:
    """Inference BN: a single fused scale+shift (XLA folds rstd into gamma)."""
    rstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = gamma.astype(jnp.float32) * rstd
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)
