"""Bilinear / nearest resize, NHWC, as gather-free matmul resizes.

Replaces the reference's ``tf.image.resize`` usage (data pipeline) and
DeepLabv3+'s bilinear upsampling decoder (SURVEY.md §2#3, §7 hard-part #6).

Bilinear resize along one axis is a sparse linear map; on TPU we realize it
as a *dense matmul with a precomputed interpolation matrix* — H_out×H_in and
W_out×W_in matrices contracted on the MXU.  For typical image sizes these
matrices are tiny, the matmuls are large and batched, and XLA fuses the two
contractions; this beats gather-based interpolation on TPU, where dynamic
gathers are slow and matmuls are nearly free.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool,
                   half_pixel: bool) -> np.ndarray:
    """[out_size, in_size] bilinear interpolation weights (numpy, cached)."""
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        if align_corners or in_size == 1:
            w[0, 0] = 1.0
        else:
            src = (0.5 * in_size / out_size) - 0.5 if half_pixel else 0.0
            src = min(max(src, 0.0), in_size - 1)
            lo = int(np.floor(src))
            hi = min(lo + 1, in_size - 1)
            frac = src - lo
            w[0, lo] += 1.0 - frac
            w[0, hi] += frac
        return w
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        elif half_pixel:
            src = (i + 0.5) * in_size / out_size - 0.5
        else:
            src = i * in_size / out_size
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], *,
                    align_corners: bool = False,
                    half_pixel: bool = True) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) images via two MXU contractions."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    mh = jnp.asarray(_interp_matrix(h, oh, align_corners, half_pixel))
    mw = jnp.asarray(_interp_matrix(w, ow, align_corners, half_pixel))
    xf = x.astype(jnp.float32)
    # [N,H,W,C] -> [N,OH,W,C]: contract H with mh [OH,H].  HIGHEST keeps
    # the interpolation in true f32 on backends whose default lowers f32
    # dots to bf16 passes; the matrices are tiny so this costs nothing.
    y = jnp.einsum("oh,nhwc->nowc", mh, xf,
                   preferred_element_type=jnp.float32, precision="highest")
    # [N,OH,W,C] -> [N,OH,OW,C]
    y = jnp.einsum("pw,nowc->nopc", mw, y,
                   preferred_element_type=jnp.float32, precision="highest")
    y = y.astype(x.dtype)
    return y[0] if squeeze else y


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (static index take; no gather in hot loop)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = np.minimum((np.arange(oh) * h / oh).astype(np.int32), h - 1)
    cols = np.minimum((np.arange(ow) * w / ow).astype(np.int32), w - 1)
    y = jnp.take(x, jnp.asarray(rows), axis=1)
    y = jnp.take(y, jnp.asarray(cols), axis=2)
    return y[0] if squeeze else y


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Fast 2x nearest upsample via reshape/broadcast (no gather at all)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
