"""Single-pass Pallas correlation (cost) volume — EXPERIMENT, not adopted.

Round-3 finding (PERF_NOTES): the XLA formulation (ops/correlation.py,
81 padded-slice multiplies) is NOT bandwidth-bound as its ~80x
traffic-over-floor ratio suggested — it is bound by the windowed-shift
+ per-pixel channel-reduction VPU pattern itself.  Three hand-written
formulations confirmed the same ceiling on the chip at PWC-Net level
shapes ([8,96,128,128], d=4):

* this kernel (halo via manual HBM->VMEM DMA, per-k full-tile writes,
  [K, th, W] output layout): 5.16 ms vs XLA 5.66 ms (~1.1x) — the
  naive [th, W, K]-stacked variant demanded 135 MB of register spills;
* a lane-major [.., C, W] transposed variant (sublane reduction):
  0.9x — lane-offset window slices cost more than the cheaper reduce;
* an MXU banded-matmul sketch was analyzed and rejected: extracting
  the (2d+1) diagonals re-introduces the identical per-pixel lane
  reduction, plus ~15x wasted FLOPs.

The backward (windowed accumulation over 81 taps) additionally blows
Mosaic's VMEM stack when unrolled (each tap's 2 MB product stays live)
— so only the FORWARD kernel ships, as the reference pattern for
windowed-halo DMA kernels; training keeps the XLA op.  Semantics match
ops/correlation.correlation_volume exactly (bit-identical on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(h: int) -> int:
    for th in (32, 24, 16, 8):
        if h % th == 0:
            return th
    return h


def _corr_fwd_kernel(f1_ref, f2p_ref, o_ref, scratch, sem, *, th, w, d):
    # output layout [K, th, W]: k on the OUTER dim makes each channel a
    # full [th, W] tile write and keeps exactly ONE product live (the
    # [th, W, K]-stacked form spilled ~135 MB of registers)
    i = pl.program_id(1)
    n = pl.program_id(0)
    dma = pltpu.make_async_copy(
        f2p_ref.at[n, pl.ds(i * th, th + 2 * d)], scratch, sem)
    dma.start()
    dma.wait()
    a = f1_ref[0].astype(jnp.float32)              # [th, W, C]
    c = a.shape[-1]
    k = 0
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            win = scratch[dy:dy + th, dx:dx + w, :].astype(jnp.float32)
            o_ref[0, k] = jnp.sum(a * win, axis=-1) * (1.0 / c)
            k += 1


def _pad_hw(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


def pallas_correlation_volume(f1, f2, max_displacement: int = 4):
    """``[N,H,W,C] x [N,H,W,C] -> [N,H,W,(2d+1)^2]`` f32 cost volume.

    FORWARD only (see module docstring: the measured verdict keeps the
    XLA op for training).  Semantics identical to
    :func:`ops.correlation.correlation_volume` (channel
    k = dy*(2d+1)+dx, zero padding outside the frame).
    """
    return _corr_fwd(f1, f2, max_displacement)


def _corr_fwd(f1, f2, d):
    if f1.shape != f2.shape:
        raise ValueError(f"feature shapes differ: {f1.shape} vs "
                         f"{f2.shape}")
    n, h, w, c = f1.shape
    k = (2 * d + 1) ** 2
    th = _row_tile(h)
    f2p = _pad_hw(f2, d)
    kern = functools.partial(_corr_fwd_kernel, th=th, w=w, d=d)
    out = pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, k, th, w), lambda ni, i: (ni, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, w + 2 * d, c), f2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * k * c,
            bytes_accessed=f1.size * f1.dtype.itemsize * 2
            + n * h * w * k * 4,
            transcendentals=0),
    )(f1, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))


