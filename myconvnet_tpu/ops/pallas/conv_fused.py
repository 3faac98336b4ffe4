"""Fused 3x3 conv + BN-apply + ReLU as an implicit-GEMM Pallas kernel.

The VERDICT-r2 experiment: can a hand-written TPU kernel beat XLA's
conv fusion on the ResNet bottleneck 3x3 (stride 1, SAME, NHWC)?

Design (see PERF_NOTES round 3 for the measured verdict):

* grid over image groups; each program builds an **im2col patch matrix
  in VMEM** — 9 shifted/masked copies of the input block laid out as
  ``[G*H*W, 9*C]`` — then runs ONE MXU matmul against the ``[9*C, Cout]``
  weight matrix.  K = 9*C keeps the MXU's reduction dimension full even
  for C=64 stages (a bare shift-GEMM does 9 matmuls at K=C, quarter-
  filling the array).
* the shifts are rolls along the flattened row axis with boundary
  masking computed from broadcasted iotas (SAME zero padding falls out
  of the mask); rolls and masked writes are VPU work that overlaps the
  matmul pipeline.
* BN apply (y = conv*scale + bias, the inference/serving fold) + ReLU
  ride the f32 accumulator before the single bf16 output write — the
  elementwise epilogue costs no extra HBM pass.

Reference behavior: the reference framework's conv+BN+activation is
three TF graph ops (SURVEY.md §2#1 layer helpers); here the fused form
is one kernel, and the XLA baseline it is A/B'd against already fuses
BN into the conv's output pass (tools/ab_pallas_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _kernel(x_ref, w_ref, sb_ref, o_ref, col_ref, *, h, w, g):
    """One image-group: im2col into VMEM scratch, one matmul, epilogue.

    x_ref:  [G*H*W, C]  input rows (bf16)
    w_ref:  [9*C, Cout] stacked taps (bf16)
    sb_ref: [2, Cout]   scale row 0, bias row 1 (f32)
    o_ref:  [G*H*W, Cout]
    col_ref:[G*H*W, 9*C] scratch (bf16)
    """
    hw = h * w
    n_rows = g * hw
    c = x_ref.shape[-1]
    x = x_ref[0]
    # row -> (image, y, x) coordinates of the flattened layout
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    pix = row % hw
    yy = pix // w
    xx = pix % w
    zeros_c = jnp.zeros((1, c), x.dtype)
    for k, (dy, dx) in enumerate(_OFFSETS):
        t = dy * w + dx
        # static shift via slice+pad (Mosaic's rotate only handles
        # 32-bit element types; shifts here are compile-time constants)
        if t > 0:
            xs = jnp.concatenate(
                [x[t:], jnp.broadcast_to(zeros_c, (t, c))], axis=0)
        elif t < 0:
            xs = jnp.concatenate(
                [jnp.broadcast_to(zeros_c, (-t, c)), x[:n_rows + t]],
                axis=0)
        else:
            xs = x
        valid = ((yy + dy >= 0) & (yy + dy < h)
                 & (xx + dx >= 0) & (xx + dx < w))
        col_ref[:, k * c:(k + 1) * c] = jnp.where(valid, xs, 0)
    acc = jax.lax.dot(col_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)
    out = jnp.maximum(acc * sb_ref[0, :] + sb_ref[1, :], 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("images_per_block",))
def conv3x3_bn_relu(x, w3, scale, bias, *, images_per_block=1):
    """y = relu(conv3x3_same(x, w3) * scale + bias), NHWC bf16.

    x: [N, H, W, C] bf16; w3: [3, 3, C, Cout]; scale/bias: [Cout] f32.
    images_per_block groups G images per grid program (raises the
    matmul's M for small feature maps); N must divide by it.
    """
    n, h, w, c = x.shape
    cout = w3.shape[-1]
    g = images_per_block
    assert n % g == 0, (n, g)
    xf = x.reshape(n // g, g * h * w, c)
    wf = w3.astype(jnp.bfloat16).reshape(9 * c, cout)
    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)])
    flops = 2 * n * h * w * 9 * c * cout
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, g=g),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, g * h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g * h * w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // g, g * h * w, cout),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((g * h * w, 9 * c), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + wf.size * 2
            + n * h * w * cout * 2,
            transcendentals=0),
    )(xf, wf, sb)
    return out.reshape(n, h, w, cout)


def conv3x3_bn_relu_reference(x, w3, scale, bias):
    """XLA baseline: the identical math through lax.conv + epilogue."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w3.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y * scale + bias, 0.0).astype(jnp.bfloat16)
