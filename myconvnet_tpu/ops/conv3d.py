"""3-D convolution + pooling ops, NDHWC, for the video task family
(no reference counterpart — the reference is image-only, SURVEY.md §2).

TPU mapping notes:

* NDHWC activations, DHWIO weights — the direct 3-D analogue of the
  NHWC/HWIO layout XLA:TPU tiles onto the MXU.  XLA lowers 3-D
  ``conv_general_dilated`` to MXU matmuls by unrolling the depth taps
  into the contraction (im2col over D*kh*kw*Cin), so a 3x3x3 conv is
  exactly as MXU-dense as a 27-tap 2-D conv.
* The decomposed R(2+1)D form (spatial 1xkxk then temporal kx1x1)
  usually beats full 3-D on TPU: two convs whose contractions are
  individually larger relative to their IO, and the intermediate
  channel width restores the parameter count (Tran et al., 2018).
* bf16 inputs accumulate in f32 inside the MXU, same as conv2d.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

# NDHWC activations, DHWIO kernel.
DIMENSION_NUMBERS_3D = ("NDHWC", "DHWIO", "NDHWC")

_IntOrTriple = Union[int, Sequence[int]]


def _triple(v: _IntOrTriple) -> tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    a, b, c = v
    return (int(a), int(b), int(c))


def conv3d(x: jax.Array, w: jax.Array, *, stride: _IntOrTriple = 1,
           padding: str | Sequence[tuple[int, int]] = "SAME",
           dilation: _IntOrTriple = 1, groups: int = 1,
           precision=None) -> jax.Array:
    """NDHWC conv. x: [N,D,H,W,Cin], w: [kd,kh,kw,Cin//groups,Cout]."""
    out = lax.conv_general_dilated(
        x, w,
        window_strides=_triple(stride),
        padding=padding,
        rhs_dilation=_triple(dilation),
        dimension_numbers=DIMENSION_NUMBERS_3D,
        feature_group_count=groups,
        precision=precision,
    )
    return out.astype(x.dtype)


def max_pool3d(x: jax.Array, window: _IntOrTriple = 2,
               stride: _IntOrTriple | None = None,
               padding: str = "SAME") -> jax.Array:
    kd, kh, kw = _triple(window)
    sd, sh, sw = _triple(stride if stride is not None else window)
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        lax.max, (1, kd, kh, kw, 1), (1, sd, sh, sw, 1), padding)


def avg_pool3d(x: jax.Array, window: _IntOrTriple = 2,
               stride: _IntOrTriple | None = None,
               padding: str = "SAME") -> jax.Array:
    kd, kh, kw = _triple(window)
    sd, sh, sw = _triple(stride if stride is not None else window)
    xf = x.astype(jnp.float32)
    summed = lax.reduce_window(xf, 0.0, lax.add, (1, kd, kh, kw, 1),
                               (1, sd, sh, sw, 1), padding)
    counts = lax.reduce_window(jnp.ones_like(xf), 0.0, lax.add,
                               (1, kd, kh, kw, 1), (1, sd, sh, sw, 1),
                               padding)
    return (summed / counts).astype(x.dtype)


def global_avg_pool3d(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """[N,D,H,W,C] -> [N,C] (f32 reduction)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3),
                    keepdims=keepdims).astype(x.dtype)
