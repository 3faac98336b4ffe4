"""Pooling ops via ``lax.reduce_window`` (VPU-friendly, NHWC).

Replaces the reference's ``tf.nn.max_pool`` / ``tf.nn.avg_pool`` helpers
(reference: convnet.py max_pool/avg_pool; mount empty — SURVEY.md §2#1).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

_IntOrPair = Union[int, Sequence[int]]


def _pair(v: _IntOrPair) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def max_pool2d(x: jax.Array, window: _IntOrPair = 2, stride: _IntOrPair = 2,
               padding: str = "SAME") -> jax.Array:
    wh, ww = _pair(window)
    sh, sw = _pair(stride)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding=padding)


def avg_pool2d(x: jax.Array, window: _IntOrPair = 2, stride: _IntOrPair = 2,
               padding: str = "SAME",
               count_include_pad: bool = False) -> jax.Array:
    wh, ww = _pair(window)
    sh, sw = _pair(stride)
    dims = (1, wh, ww, 1)
    strides = (1, sh, sw, 1)
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=dims, window_strides=strides, padding=padding)
    if padding == "VALID" or count_include_pad:
        out = summed / float(wh * ww)
    else:
        # TF-style SAME avg-pool divides by the number of *valid* elements.
        counts = lax.reduce_window(
            jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None],
            0.0, lax.add, window_dimensions=dims, window_strides=strides,
            padding=padding)
        out = summed / counts
    return out.astype(x.dtype)


def global_avg_pool(x: jax.Array, keepdims: bool = False) -> jax.Array:
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                    keepdims=keepdims).astype(x.dtype)


def adaptive_avg_pool2d(x: jax.Array,
                        output_hw: _IntOrPair) -> jax.Array:
    """Average pool to an exact output grid (torch AdaptiveAvgPool2d
    semantics: bin i spans [floor(i*S/B), ceil((i+1)*S/B))).

    TPU-native shape: the per-axis bin averaging is a tiny [B, S]
    matrix (rows = normalized bin-membership weights) applied as two
    einsum contractions — no gathers, no dynamic shapes, fuses with
    the surrounding convs like the matmul-form bilinear resize.
    """
    import numpy as np

    bh, bw = _pair(output_hw)
    n, h, w, c = x.shape

    def axis_matrix(size: int, bins: int) -> jax.Array:
        m = np.zeros((bins, size), np.float32)
        for i in range(bins):
            lo = (i * size) // bins
            hi = -(-(i + 1) * size // bins)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m)

    mh = axis_matrix(h, bh)
    mw = axis_matrix(w, bw)
    xf = x.astype(jnp.float32)
    y = jnp.einsum("bh,nhwc->nbwc", mh, xf, precision="highest")
    y = jnp.einsum("vw,nbwc->nbvc", mw, y, precision="highest")
    return y.astype(x.dtype)
