"""Two-conv VMEM-resident pair: conv1x1 + BN + ReLU + conv3x3 + BN +
ReLU in ONE Pallas kernel, intermediate never touching HBM.

The VERDICT-r4 experiment (weak #2): the round-3 single-conv A/B
(conv_fused.py) still round-trips its output through HBM, so it could
not measure the one traffic-reducing lever XLA cannot reach — XLA
never fuses conv->conv, so the bottleneck block's [N, H, W, Cm]
intermediate between the 1x1 reduce and the 3x3 is always written and
re-read (a 51 MB sweep each way at the stage-1 shape, mb128).  This
kernel keeps it resident:

* grid over image groups; per program: one ``[G*H*W, Cin] @ [Cin, Cm]``
  MXU matmul (K = Cin = 256 fills the reduction dim), BN-apply + ReLU
  on the f32 accumulator into a VMEM ``inter`` scratch (bf16);
* the 3x3 as NINE accumulated shifted dots over the RESIDENT
  intermediate (the conv_fused.py shift+mask construction, K = Cm per
  tap) + second BN/ReLU epilogue, single bf16 output write.  The
  round-3 kernel's im2col-to-``[.., 9*Cm]`` layout fills the MXU
  reduction dim better but its col scratch + per-tap temporaries blow
  the 16 MB VMEM budget at the 56² shape this experiment targets —
  and the lever under test is TRAFFIC, not MXU fill.

HBM traffic: read x + read weights + write out — the intermediate's
write+read sweep is GONE.  BN here is the inference/serving fold
(scale/bias); train-path batch stats would need a second pass and are
out of scope for the measurement (PERF_NOTES round 5 records the
verdict either way, same discipline as the round-3 negatives).

Reference behavior: the reference framework chains separate conv/BN/
activation graph ops (SURVEY.md §2#1); no reference analogue of a
fused pair exists — this is a TPU-native experiment above that
surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _kernel(x_ref, w1_ref, sb1_ref, w3_ref, sb3_ref, o_ref,
            inter_ref, *, h, w, g, strip):
    """x_ref:   [1, G*H*W, Cin]  input rows (bf16)
    w1_ref:  [Cin, Cm]         1x1 weights (bf16)
    sb1_ref: [2, Cm]           BN1 scale row 0, bias row 1 (f32)
    w3_ref:  [9*Cm, Cout]      stacked 3x3 taps (bf16)
    sb3_ref: [2, Cout]         BN2 scale/bias (f32)
    o_ref:   [1, G*H*W, Cout]
    inter_ref: [G*H*W + 2*W + 2, Cm]  resident intermediate with W+1
             rows of slack each side, so every tap window is an
             in-bounds STATIC slice (slack rows are never written —
             the per-tap validity mask kills exactly the taps that
             would read them)

    The 3x3 runs strip-by-strip (``strip`` image rows at a time) so
    the shifted-window temporaries stay strip-sized: the whole-image
    unrolled-tap form stack-allocates all nine windows at once and
    blows the 16 MB VMEM budget at 56².
    """
    hw = h * w
    n_rows = g * hw
    cm = inter_ref.shape[-1]
    base = w + 1
    # ---- conv1x1 + BN + ReLU into the resident intermediate
    acc1 = jax.lax.dot(x_ref[0], w1_ref[:],
                       preferred_element_type=jnp.float32)
    inter_ref[base:base + n_rows, :] = jnp.maximum(
        acc1 * sb1_ref[0, :] + sb1_ref[1, :], 0.0).astype(inter_ref.dtype)
    # ---- conv3x3 as 9 accumulated shifted dots, strip-wise
    rows_per_strip = strip * w
    for s in range(g * h // strip):
        p0 = s * rows_per_strip
        row = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_strip, 1), 0) + p0
        pix = row % hw
        yy = pix // w
        xx = pix % w
        acc = None
        for k, (dy, dx) in enumerate(_OFFSETS):
            t = dy * w + dx
            xs = inter_ref[base + p0 + t:base + p0 + t + rows_per_strip,
                           :]
            valid = ((yy + dy >= 0) & (yy + dy < h)
                     & (xx + dx >= 0) & (xx + dx < w))
            tap = jax.lax.dot(jnp.where(valid, xs, 0),
                              w3_ref[k * cm:(k + 1) * cm, :],
                              preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap
        out = jnp.maximum(acc * sb3_ref[0, :] + sb3_ref[1, :], 0.0)
        o_ref[0, p0:p0 + rows_per_strip, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("images_per_block", "strip"))
def conv1x1_conv3x3_bn_relu(x, w1, scale1, bias1, w3, scale3, bias3, *,
                            images_per_block=1, strip=None):
    """y = relu(bn3(conv3x3(relu(bn1(conv1x1(x, w1))), w3))), NHWC.

    x: [N, H, W, Cin] bf16; w1: [1, 1, Cin, Cm] (or [Cin, Cm]);
    w3: [3, 3, Cm, Cout]; scales/biases: f32 per-channel folds.
    The [N, H, W, Cm] intermediate stays in VMEM scratch.  ``strip``:
    image rows per 3x3 inner step (must divide G*H; default = the
    largest divisor <= 8 — bounds the tap temporaries).
    """
    n, h, w, cin = x.shape
    g_rows = images_per_block * h
    if strip is None:
        strip = max(s for s in range(1, 9) if g_rows % s == 0)
    assert g_rows % strip == 0, (g_rows, strip)
    w1m = w1.reshape(w1.shape[-2], w1.shape[-1]).astype(jnp.bfloat16)
    cm = w1m.shape[-1]
    cout = w3.shape[-1]
    g = images_per_block
    assert n % g == 0, (n, g)
    xf = x.reshape(n // g, g * h * w, cin)
    w3f = w3.astype(jnp.bfloat16).reshape(9 * cm, cout)
    sb1 = jnp.stack([scale1.astype(jnp.float32),
                     bias1.astype(jnp.float32)])
    sb3 = jnp.stack([scale3.astype(jnp.float32),
                     bias3.astype(jnp.float32)])
    flops = 2 * n * h * w * cm * (cin + 9 * cout)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, g=g, strip=strip),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, g * h * w, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cm, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g * h * w, cout),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // g, g * h * w, cout),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((g * h * w + 2 * w + 2, cm), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + w1m.size * 2 + w3f.size * 2
            + n * h * w * cout * 2,
            transcendentals=0),
    )(xf, w1m, sb1, w3f, sb3)
    return out.reshape(n, h, w, cout)


def conv_pair_reference(x, w1, scale1, bias1, w3, scale3, bias3):
    """XLA baseline: identical math as two lax.convs with fused
    epilogues — the intermediate round-trips HBM between them."""
    w1m = w1.reshape(1, 1, w1.shape[-2], w1.shape[-1])
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w1m.astype(jnp.bfloat16), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale1 + bias1, 0.0).astype(jnp.bfloat16)
    z = jax.lax.conv_general_dilated(
        y, w3.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(z * scale3 + bias3, 0.0).astype(jnp.bfloat16)
