"""Pallas TPU kernel: fused inference-BN (scale/shift) + activation.

At inference the BN collapses to ``y = act(x * a + b)`` with per-channel
``a = gamma*rstd``, ``b = beta - mean*a`` — pure VPU work whose only cost
is HBM traffic.  This kernel streams NHWC activations through VMEM in
lane-aligned blocks and applies scale/shift/activation in one pass:
read x once, write y once — the speed-of-light for this op.

Used by the serving path (``nn.batch_norm(..., train=False)`` lowers to
the same math; this kernel is the explicit fused form for
inference-optimized graphs).  Falls back to interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, b_ref, o_ref, *, act: str):
    x = x_ref[:]
    y = x.astype(jnp.float32) * a_ref[:] + b_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0.0, y, 0.2 * y)
    o_ref[:] = y.astype(o_ref.dtype)


def _row_block(rows: int, c: int, dtype) -> int:
    """Pick a row-block size that keeps ~2 buffers under a VMEM budget."""
    bytes_per_row = c * jnp.dtype(dtype).itemsize
    budget = 4 * 1024 * 1024  # half of VMEM, double-buffered by pallas
    blk = max(1, budget // max(bytes_per_row, 1))
    # sublane alignment: multiples of 8 (f32) / 16 (bf16)
    align = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    blk = max(align, (min(blk, rows) // align) * align)
    return min(blk, rows)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def fused_scale_shift_act(x: jax.Array, a: jax.Array, b: jax.Array,
                          act: str = "relu",
                          interpret: bool = False) -> jax.Array:
    """y = act(x * a + b), channels-last; one HBM pass.

    x: [..., C]; a, b: [C] float32.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, c)
    blk = _row_block(rows, c, x.dtype)
    grid = (pl.cdiv(rows, blk),)
    out = pl.pallas_call(
        functools.partial(_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((blk, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x2, a.astype(jnp.float32), b.astype(jnp.float32))
    return out.reshape(orig_shape)


def bn_inference_fused(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                       mean: jax.Array, var: jax.Array, eps: float = 1e-3,
                       act: str = "none",
                       interpret: bool = False) -> jax.Array:
    """Inference BN + activation as ONE fused pallas pass (the reference's
    fused_batch_norm(is_training=False) + relu pair)."""
    rstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = gamma.astype(jnp.float32) * rstd
    b = beta.astype(jnp.float32) - mean.astype(jnp.float32) * a
    return fused_scale_shift_act(x, a, b, act=act, interpret=interpret)
