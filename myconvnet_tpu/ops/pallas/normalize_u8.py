"""Pallas TPU kernel: one-pass uint8 -> normalized float image batches.

The transfer-side half of the augmentation story (SURVEY.md §7
hard-part #2): batches arrive in HBM as uint8 (4x smaller than f32 over
PCIe/DCN); this kernel streams them through VMEM once, applying
``(x/255 - mean)/std`` and the dtype cast in a single read-write pass —
no intermediate f32 image ever touches HBM.

Used by the eval path when no resize is needed and as the building block
for serving preprocessors.  The double-buffering between HBM and VMEM is
handled by the pallas pipeline (grid + BlockSpec), which overlaps the
block (i+1) DMA with block i compute automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, shift_ref, o_ref):
    # Mosaic has no direct uint8->f32 cast; widen through int32 (values
    # 0..255 are exactly representable either way)
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * scale_ref[:] + shift_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def normalize_u8(images: jax.Array, mean, std, out_dtype=jnp.float32,
                 interpret: bool = False) -> jax.Array:
    """[N,H,W,C] uint8 -> [N,H,W,C] out_dtype, (x/255 - mean)/std.

    Folds the /255 into the per-channel scale so the kernel is a single
    multiply-add per element.
    """
    n, h, w, c = images.shape
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    scale = 1.0 / (255.0 * std)
    shift = -mean / std
    rows = n * h * w
    x2 = images.reshape(rows, c)
    # block rows: uint8 in + f32 out per row = c*(1+4) bytes
    budget = 4 * 1024 * 1024
    blk = max(32, min(rows, budget // max(c * 5, 1)) // 32 * 32)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(rows, blk),),
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
    )(x2, scale, shift)
    return out.reshape(n, h, w, c)
