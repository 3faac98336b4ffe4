"""Pallas TPU kernel: per-image affine resampling (shear / rotate).

Closes the RandAugment geometry gap (rotate, shear-x, shear-y — VERDICT
r1 next #6).  Mosaic has no vector gather, so arbitrary bilinear warps
can't be sampled directly; the TPU-native shape of the op:

* a SHEAR's source offset is constant along each row (``src_x = x +
  slope*y + offset``), so one row needs only two lane-rolls (floor and
  floor+1 of its shift) blended by the fractional part;
* the kernel sweeps the bounded integer-shift range with a
  ``fori_loop`` of dynamic ``pltpu.roll``s over [row-block, W*C] tiles
  in VMEM, accumulating each row's two contributions via per-row
  one-hot weights — the sweep is per ROW-BLOCK (32 rows), whose shift
  span is only |slope|*31, so the trip count stays ~18 instead of
  |slope|*H; ZERO extra HBM traffic (the alternative, a [H,W,W]
  interpolation-matrix einsum in XLA, moves W-times the image per
  pass);
* a Y-shear is the same kernel on the transposed image; ROTATION is the
  classic 3-shear decomposition  R(th) = ShX(-tan th/2) . ShY(sin th)
  . ShX(-tan th/2)  — three kernel passes + two XLA transposes.

Out-of-frame pixels take ``fill`` (AutoAugment's gray).  All shifts are
per-image (scalar-prefetched), slopes bounded statically by the op's
magnitude range so the roll sweep has a static trip count.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROW_BLOCK = 32


def _kernel(par_ref, x_ref, o_ref, *, rh: int, w: int, c: int,
            wc_pad: int, r_max: int, fill: float):
    i = pl.program_id(0)                   # image
    j = pl.program_id(1)                   # row block
    s = par_ref[i, 0]                      # pixels of x-shift per row
    t = par_ref[i, 1]                      # x-shift at row 0

    # The roll sweep is per ROW-BLOCK: within rh rows the shift only
    # spans |slope|*(rh-1), so r_max stays ~18 at rh=32 instead of the
    # full-image ~|slope|*H — ~6x less VPU work than the whole-image
    # sweep, with [rh, wc_pad] blocks that barely touch VMEM.
    #
    # Lane dim padded to a multiple of 128: Mosaic's dynamic_rotate
    # rejects padded vector layouts, so the caller pads W*C -> wc_pad.
    # Padding that rolls into frame positions is provably masked: a
    # position x' receives source x' + k*c, and x' + k*c >= w*c  <=>
    # cols_pix(x') + k >= w (r < c keeps the pixel index exact), which
    # the validity test zeroes; same for wrap-around at negative k.
    x = x_ref[0].astype(jnp.float32)       # [rh, wc_pad]
    y0 = (j * rh).astype(jnp.float32)
    rows = y0 + jax.lax.broadcasted_iota(
        jnp.int32, (rh, wc_pad), 0).astype(jnp.float32)
    shift = s * rows + t                   # source offset, constant/row
    base = jnp.floor(shift)
    frac = shift - base
    base_i = base.astype(jnp.int32)
    # shift is linear in y: its floor-min is at one end of the block
    dmin = jnp.floor(jnp.minimum(s * y0 + t,
                                 s * (y0 + rh - 1) + t)).astype(jnp.int32)
    cols_pix = jax.lax.broadcasted_iota(jnp.int32, (rh, wc_pad), 1) // c

    def body(d, carry):
        acc, cov = carry
        k = dmin + d
        rolled = pltpu.roll(x, -k * c, 1)  # lanes move whole pixels
        valid = ((cols_pix + k >= 0) & (cols_pix + k < w)) \
            .astype(jnp.float32)
        wgt = jnp.where(base_i == k, 1.0 - frac, 0.0) \
            + jnp.where(base_i == k - 1, frac, 0.0)
        wv = wgt * valid
        return acc + rolled * wv, cov + wv

    acc, cov = jax.lax.fori_loop(
        0, r_max, body,
        (jnp.zeros((rh, wc_pad), jnp.float32),
         jnp.zeros((rh, wc_pad), jnp.float32)))
    o_ref[0] = (acc + (1.0 - cov) * fill).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_abs_slope", "fill",
                                             "interpret"))
def shear_rows(x: jax.Array, slope: jax.Array, offset: jax.Array, *,
               max_abs_slope: float,
               fill: float = 0.5, interpret: bool = False) -> jax.Array:
    """``out[n,y,x'] = in[n,y, x' + slope[n]*y + offset[n]]`` with
    bilinear blending; ``fill`` outside the frame.

    x: [N,H,W,C] float; slope/offset: [N] f32 (pixels).  The roll sweep
    covers only the shift RANGE |slope|*(h-1) (the offset moves the
    whole range, which the dynamic ``dmin`` absorbs), so the static
    bound is just ``max_abs_slope``.
    """
    n, h, w, c = x.shape
    params = jnp.stack([slope.astype(jnp.float32),
                        offset.astype(jnp.float32)], axis=1)
    rh = min(_ROW_BLOCK, h)
    r_max = int(math.ceil(max_abs_slope * (rh - 1))) + 2
    wc = w * c
    wc_pad = -(-wc // 128) * 128           # Mosaic dynamic-rotate needs
    xf = x.reshape(n, h, wc)               # an unpadded lane layout
    if wc_pad != wc:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, wc_pad - wc)))
    h_pad = -(-h // rh) * rh
    if h_pad != h:
        xf = jnp.pad(xf, ((0, 0), (0, h_pad - h), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, h_pad // rh),
        in_specs=[pl.BlockSpec((1, rh, wc_pad),
                               lambda i, j, par: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rh, wc_pad),
                               lambda i, j, par: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rh=rh, w=w, c=c, wc_pad=wc_pad,
                          r_max=r_max, fill=float(fill)),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, wc_pad), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(params, xf)
    return out[:, :h, :wc].reshape(n, h, w, c)


def _centered(slope, size_along):
    """Offset that keeps the shear centered: shift = slope*(y - cy)
    expressed as slope*y + offset with zero net shift at the center."""
    cy = (size_along - 1) / 2.0
    return -slope * cy


def shear_x(x: jax.Array, slope: jax.Array, *, max_abs_slope: float,
            fill: float = 0.5, interpret: bool = False) -> jax.Array:
    """Horizontal shear about the image center (PIL AFFINE
    ``(1, s, 0, 0, 1, 0)`` convention up to centering)."""
    off = _centered(slope, x.shape[1])
    return shear_rows(x, slope, off, max_abs_slope=max_abs_slope,
                      fill=fill, interpret=interpret)


def shear_y(x: jax.Array, slope: jax.Array, *, max_abs_slope: float,
            fill: float = 0.5, interpret: bool = False) -> jax.Array:
    """Vertical shear = the row kernel on the transposed image."""
    xt = jnp.swapaxes(x, 1, 2)
    out = shear_x(xt, slope, max_abs_slope=max_abs_slope, fill=fill,
                  interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


def rotate(x: jax.Array, radians: jax.Array, *, max_abs_radians: float,
           fill: float = 0.5, interpret: bool = False) -> jax.Array:
    """Rotate about the center (counter-clockwise, PIL convention) via
    the 3-shear decomposition — three bilinear passes, so slightly
    softer than a single-resample rotation (tests bound the
    difference)."""
    if max_abs_radians >= math.pi / 2:
        raise ValueError("3-shear rotation needs |angle| < 90 degrees")
    # inverse-sampling shears: verified against a direct single-resample
    # CCW rotation reference (tests/test_affine.py)
    a = jnp.tan(radians / 2.0)
    b = -jnp.sin(radians)
    max_a = math.tan(max_abs_radians / 2.0)
    max_b = math.sin(max_abs_radians)
    x = shear_x(x, a, max_abs_slope=max_a, fill=fill, interpret=interpret)
    x = shear_y(x, b, max_abs_slope=max_b, fill=fill, interpret=interpret)
    return shear_x(x, a, max_abs_slope=max_a, fill=fill,
                   interpret=interpret)
