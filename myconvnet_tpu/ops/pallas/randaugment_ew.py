"""Pallas TPU kernel: one RandAugment layer of elementwise ops with TRUE
per-image branching.

The XLA formulation of RandAugment (data/randaugment.py) is a where-fold:
every pool op runs on every image and a select keeps the chosen one —
branch-free, but the batch pays |pool| HBM sweeps per layer (measured
14.6 ms at b256/224²; PERF_NOTES.md).  Inside a Pallas kernel the op
index is a *scalar* (prefetched to SMEM before the body runs), so
``lax.switch`` executes ONLY the selected branch on each image's tiles:
one read + one write per layer regardless of pool size.

Scope: the scalar-elementwise subset of the pool — identity, invert,
solarize, solarize_add, posterize, brightness, contrast, autocontrast.
The per-image statistics that contrast/autocontrast need (gray mean,
per-channel min/max) are precomputed by one fused XLA reduction pass and
arrive as scalars.  Ops that mix *across* pixels or lanes (color's
per-pixel gray, sharpness' 3x3 conv, the translate matmuls) stay in the
XLA path — lane-crossing work is what the where-fold does well.

Layout: [N,H,W,C] viewed as [N, H, W*C] — a free reshape (no
transpose); channel-of-lane = lane_index mod C, which is how
autocontrast picks its per-channel scale with a 3-way select.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# op order is the kernel's switch order — keep in sync with PALLAS_POOL
PALLAS_POOL = ("identity", "autocontrast", "invert", "posterize",
               "solarize", "solarize_add", "contrast", "brightness")


def _kernel(idx_ref, par_ref, x_ref, o_ref, *, channels: int):
    i = pl.program_id(0)
    op = idx_ref[i]
    mag = par_ref[i, 0]          # signed magnitude in [-1, 1]
    gray_mean = par_ref[i, 1]
    x = x_ref[:].astype(jnp.float32)

    # lane -> channel id (layout [1, Hblk, W*C]); used by autocontrast
    lanes = x.shape[-1]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2) % channels

    def op_identity(x):
        return x

    def op_autocontrast(x):
        # per-lane lo/hi via channel select (3-way for RGB)
        lo = par_ref[i, 2] * jnp.ones_like(x)
        hi = par_ref[i, 2 + channels] * jnp.ones_like(x)
        for c in range(1, channels):
            lo = jnp.where(ch == c, par_ref[i, 2 + c], lo)
            hi = jnp.where(ch == c, par_ref[i, 2 + channels + c], hi)
        scale = 1.0 / jnp.maximum(hi - lo, 1e-5)
        stretched = jnp.clip((x - lo) * scale, 0.0, 1.0)
        return jnp.where(hi > lo, stretched, x)

    def op_invert(x):
        return 1.0 - x

    def op_posterize(x):
        bits = 8.0 - jnp.abs(mag) * 4.0
        levels = jnp.exp2(jnp.floor(bits))
        step = 256.0 / levels
        return jnp.clip(jnp.floor(x * 255.0 / step) * step / 255.0,
                        0.0, 1.0)

    def op_solarize(x):
        thresh = 1.0 - jnp.abs(mag)
        return jnp.where(x < thresh, x, 1.0 - x)

    def op_solarize_add(x):
        add = jnp.abs(mag) * (110.0 / 255.0)
        return jnp.where(x < 0.5, jnp.clip(x + add, 0.0, 1.0), x)

    def op_contrast(x):
        f = 1.0 + 0.9 * mag
        return jnp.clip(gray_mean + (x - gray_mean) * f, 0.0, 1.0)

    def op_brightness(x):
        return jnp.clip(x * (1.0 + 0.9 * mag), 0.0, 1.0)

    y = jax.lax.switch(op, [op_identity, op_autocontrast, op_invert,
                            op_posterize, op_solarize, op_solarize_add,
                            op_contrast, op_brightness], x)
    o_ref[:] = y.astype(o_ref.dtype)


def _image_stats(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N, 2+2C] params rows: [mag placeholder, gray_mean,
    lo_0..lo_{C-1}, hi_0..hi_{C-1}] (mag filled by caller)."""
    coef = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    xf = x.astype(jnp.float32)
    gray_mean = jnp.mean(jnp.sum(xf * coef, -1), axis=(1, 2))
    lo = jnp.min(xf, axis=(1, 2))
    hi = jnp.max(xf, axis=(1, 2))
    zeros = jnp.zeros_like(gray_mean)
    return jnp.concatenate([zeros[:, None], gray_mean[:, None], lo, hi],
                           axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_layer(x: jax.Array, op_idx: jax.Array, signed_mag: jax.Array,
                *, interpret: bool = False) -> jax.Array:
    """One RandAugment layer over the PALLAS_POOL: x [N,H,W,C] float in
    [0,1], op_idx [N] int32 into PALLAS_POOL, signed_mag [N] in [-1,1].
    """
    n, h, w, c = x.shape
    params = _image_stats(x).at[:, 0].set(signed_mag.astype(jnp.float32))
    xv = x.reshape(n, h, w * c)
    # block: one image's row-tile; W*C lanes (pallas pads to 128)
    blk_h = max(8, min(h, (2 * 1024 * 1024) // max(w * c * 8, 1)))
    out = pl.pallas_call(
        functools.partial(_kernel, channels=c),
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, pl.cdiv(h, blk_h)),
            in_specs=[
                pl.BlockSpec((1, blk_h, w * c), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_h, w * c),
                                   lambda i, j, *_: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(op_idx.astype(jnp.int32), params, xv)
    return out.reshape(n, h, w, c)
