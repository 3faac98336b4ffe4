"""Pallas TPU kernel: fused CIFAR-style augmentation in one HBM pass.

uint8 [N,H,W,C] -> pad-by-p random crop (integer offsets) -> horizontal
flip -> (x/255 - mean)/std -> out dtype, with PER-IMAGE parameters
delivered via scalar prefetch (`PrefetchScalarGridSpec`): the offsets are
known before each grid step's DMA, so the pipeline overlaps image (i+1)'s
HBM->VMEM copy with image i's compute.

Mosaic-native realization of each stage (lax.rev and gathers are
unavailable on TPU Pallas):

* integer crop   = dynamic `pltpu.roll` + `broadcasted_iota` validity
  masks (zero fill outside the padded frame — the reference's
  pad-with-zeros-then-crop semantics);
* horizontal flip = one matmul with a constant [W*C, W*C] block-anti-
  diagonal permutation (channels stay interleaved, so no transpose);
* normalize      = per-channel scale/shift tiled across the W*C lanes.

The einsum-based `data/augment.py` path remains the default (resize-
capable, any-backend); this kernel is the fused integer-crop fast path
and the repo's demonstration of scalar-prefetch + dynamic-shift Pallas
patterns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(par_ref, x_ref, scale_ref, shift_ref, flipmat_ref, o_ref, *,
            h: int, w: int, c: int, pad: int):
    i = pl.program_id(0)
    sy = par_ref[i, 0]  # row shift in [-pad, pad]
    sx = par_ref[i, 1]  # col shift in [-pad, pad]
    flip = par_ref[i, 2]

    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [H, W*C]

    # out[r] = x[r + sy] with zero fill outside [0, H)
    x = pltpu.roll(x, -sy, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w * c), 0)
    x = jnp.where((rows + sy >= 0) & (rows + sy < h), x, 0.0)

    # columns move in whole pixels: shift by sx*C keeps channels aligned
    x = pltpu.roll(x, -sx * c, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w * c), 1) // c
    x = jnp.where((cols + sx >= 0) & (cols + sx < w), x, 0.0)

    # horizontal flip as a permutation matmul (no rev/gather on Mosaic)
    flipped = jax.lax.dot_general(
        x, flipmat_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = jnp.where(flip > 0, flipped, x)

    o_ref[0] = (x * scale_ref[:] + shift_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mean", "std", "pad", "out_dtype",
                                    "interpret"))
def pad_crop_flip_normalize(images: jax.Array, offsets: jax.Array,
                            flip: jax.Array, mean, std, *, pad: int = 4,
                            out_dtype=jnp.float32,
                            interpret: bool = False) -> jax.Array:
    """Fused integer pad-crop + flip + normalize.

    images: [N,H,W,C] uint8; offsets: [N,2] int32 in [-pad, pad];
    flip: [N] bool/int; mean/std: per-channel TUPLES (static).
    Returns [N,H,W,C] ``out_dtype``.
    """
    mean = tuple(float(m) for m in mean)
    std = tuple(float(s) for s in std)
    n, h, w, c = images.shape
    params = jnp.concatenate(
        [offsets.astype(jnp.int32),
         flip.astype(jnp.int32).reshape(n, 1)], axis=1)  # [N,3]

    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = np.tile(1.0 / (255.0 * std), w).astype(np.float32)   # [W*C]
    shift = np.tile(-mean / std, w).astype(np.float32)

    # block-anti-diagonal permutation: column w*C+c -> (W-1-w)*C+c
    j = np.zeros((w * c, w * c), np.float32)
    for wi in range(w):
        for ci in range(c):
            j[wi * c + ci, (w - 1 - wi) * c + ci] = 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c,), lambda i, par: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c,), lambda i, par: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c, w * c), lambda i, par: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i, par: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, pad=pad),
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(params, images.reshape(n, h, w * c), jnp.asarray(scale),
      jnp.asarray(shift), jnp.asarray(j))
    return out.reshape(n, h, w, c)


def reference_pad_crop_flip_normalize(images, offsets, flip, mean, std,
                                      pad=4):
    """numpy reference for tests: pad with zeros, crop, flip, normalize."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    padded = np.zeros((n, h + 2 * pad, w + 2 * pad, c), np.float32)
    padded[:, pad:pad + h, pad:pad + w] = images
    out = np.empty((n, h, w, c), np.float32)
    for i in range(n):
        oy = pad + int(offsets[i, 0])
        ox = pad + int(offsets[i, 1])
        crop = padded[i, oy:oy + h, ox:ox + w]
        if flip[i]:
            crop = crop[:, ::-1]
        out[i] = crop
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (out / 255.0 - mean) / std
