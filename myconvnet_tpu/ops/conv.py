"""2-D convolution ops, NHWC, MXU-friendly.

Replaces the reference's ``tf.nn.conv2d`` / atrous-conv usage inside its
ConvNet layer helpers (reference: convnet.py conv_layer; mount empty —
SURVEY.md §0/§2#1) with ``lax.conv_general_dilated``:

* NHWC activations, HWIO weights — the layout XLA:TPU tiles onto the MXU
  without inserting transposes.
* ``dilation`` exposes atrous convolution for DeepLabv3+ (SURVEY §2#3).
* ``feature_group_count`` exposes depthwise/grouped conv.
* bf16 inputs accumulate in f32 *inside the MXU* automatically on TPU;
  ``accum_dtype`` is deliberately None on the training path because an
  explicit ``preferred_element_type`` breaks JAX's conv transpose rule
  under mixed dtypes (cotangent f32 vs primal bf16) — and adds nothing
  on TPU, where bf16 convs already use f32 accumulators.

Backward passes are left to XLA's autodiff of ``conv_general_dilated``,
which lowers to the same MXU conv kernels (transposed/dilated variants) a
hand-written backward would; there is no win in hand-rolling them.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernel.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")

_IntOrPair = Union[int, Sequence[int]]


def _pair(v: _IntOrPair) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d(x: jax.Array, w: jax.Array, *, stride: _IntOrPair = 1,
           padding: str | Sequence[tuple[int, int]] = "SAME",
           dilation: _IntOrPair = 1, groups: int = 1,
           accum_dtype=None, precision=None) -> jax.Array:
    """NHWC conv. x: [N,H,W,Cin], w: [kh,kw,Cin//groups,Cout]."""
    out = lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=padding,
        rhs_dilation=_pair(dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
        precision=precision,
    )
    return out.astype(x.dtype)


def conv2d_transpose(x: jax.Array, w: jax.Array, *, stride: _IntOrPair = 2,
                     padding: str = "SAME",
                     accum_dtype=None, precision=None) -> jax.Array:
    """Fractionally-strided conv (GAN generators). w: [kh,kw,Cin,Cout]."""
    out = lax.conv_transpose(
        x, w,
        strides=_pair(stride),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=accum_dtype,
        precision=precision,
    )
    return out.astype(x.dtype)


def depthwise_conv2d(x: jax.Array, w: jax.Array, *, stride: _IntOrPair = 1,
                     padding: str = "SAME", dilation: _IntOrPair = 1,
                     accum_dtype=None, precision=None) -> jax.Array:
    """Depthwise conv. w: [kh,kw,C,multiplier] reshaped to grouped form."""
    kh, kw, c, m = w.shape
    w = w.reshape(kh, kw, 1, c * m)
    return conv2d(x, w, stride=stride, padding=padding, dilation=dilation,
                  groups=c, accum_dtype=accum_dtype, precision=precision)
