#!/usr/bin/env python
"""A/B: NHWC vs NCHW layout family for the flagship's hot conv stages.

The last open lever in PERF_NOTES round 5 §5 is "layout-family changes
(NCHW-class tiling of the 56² stages)".  This measures it instead of
speculating: a full ResNet-50 bottleneck block (1x1 reduce -> BN ->
ReLU -> 3x3 -> BN -> ReLU -> 1x1 expand -> BN -> residual add -> ReLU,
training-mode batch stats) with fwd+bwd through ``jax.value_and_grad``,
built natively in each layout (inputs created in-layout, no transposes
inside the timed program):

* NHWC / HWIO — the repo's layout (`ops/conv.py:31`): channels on
  lanes, the MXU contraction axis for 1x1 convs.
* NCHW / OIHW — the CUDA-native family the reference would have used:
  spatial on lanes.

Timing: DEVICE-TRACE op durations (tools/profile_step.load_device_events)
— host clocks on this transport cannot resolve kernel time
(PERF_NOTES round 5 §1).

    python tools/ab_layout_nchw.py            # on-chip A/B
    python tools/ab_layout_nchw.py --check    # CPU numerics parity only
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

EPS = 1e-5


def bottleneck(layout, x, params):
    """One training-mode bottleneck block in the given layout family."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if layout == "NHWC":
        dn = ("NHWC", "HWIO", "NHWC")
        caxis, raxes = 3, (0, 1, 2)
    else:
        dn = ("NCHW", "OIHW", "NCHW")
        caxis, raxes = 1, (0, 2, 3)

    dtype = x.dtype

    def bn_relu(h, scale, bias, relu=True):
        h32 = h.astype(jnp.float32)
        mean = jnp.mean(h32, axis=raxes)
        var = jnp.mean(jnp.square(h32), axis=raxes) - jnp.square(mean)
        shp = [1] * 4
        shp[caxis] = h.shape[caxis]
        inv = (scale * lax.rsqrt(var + EPS)).reshape(shp)
        off = (bias - mean * scale * lax.rsqrt(var + EPS)).reshape(shp)
        y = h32 * inv + off
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(dtype)

    w1, s1, b1, w2, s2, b2, w3, s3, b3 = params
    h = lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                 dimension_numbers=dn)
    h = bn_relu(h, s1, b1)
    h = lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                 dimension_numbers=dn)
    h = bn_relu(h, s2, b2)
    h = lax.conv_general_dilated(h, w3, (1, 1), "SAME",
                                 dimension_numbers=dn)
    h = bn_relu(h, s3, b3, relu=False)
    return jnp.maximum(h + x.astype(jnp.float32), 0.0).astype(x.dtype)


def make_inputs(layout, n, hw, c, cm, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    if layout == "NHWC":
        x = rng.randn(n, hw, hw, c) * 0.1
        w1 = rng.randn(1, 1, c, cm) * 0.05
        w2 = rng.randn(3, 3, cm, cm) * 0.05
        w3 = rng.randn(1, 1, cm, c) * 0.05
    else:
        x = rng.randn(n, c, hw, hw) * 0.1
        w1 = rng.randn(cm, c, 1, 1) * 0.05
        w2 = rng.randn(cm, cm, 3, 3) * 0.05
        w3 = rng.randn(c, cm, 1, 1) * 0.05
    bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    f32 = lambda k: jnp.asarray(rng.rand(k) * 0.5 + 0.75, jnp.float32)
    z32 = lambda k: jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
    params = (bf(w1), f32(cm), z32(cm), bf(w2), f32(cm), z32(cm),
              bf(w3), f32(c), z32(c))
    return bf(x), params


def train_step(layout):
    """loss + grads wrt x and all conv weights: fwd AND bwd convs."""
    import jax
    import jax.numpy as jnp

    def loss_fn(x, params):
        out = bottleneck(layout, x, params)
        return jnp.sum(jnp.square(out.astype(jnp.float32))) * 1e-6

    return jax.value_and_grad(loss_fn, argnums=(0, 1))


def device_time(fn, args, tag, iters=12):
    from tools.profile_step import device_time as dt
    return dt(fn, args, f"nchw_{tag}", iters=iters)


def check_parity():
    """CPU: the two layouts must compute the same block (transposed)."""
    import jax.numpy as jnp
    n, hw, c, cm = 4, 8, 32, 8
    x_a, p_a = make_inputs("NHWC", n, hw, c, cm)
    out_a = bottleneck("NHWC", x_a, p_a)
    x_b = jnp.transpose(x_a, (0, 3, 1, 2))
    w1, s1, b1, w2, s2, b2, w3, s3, b3 = p_a
    p_b = (jnp.transpose(w1, (3, 2, 0, 1)), s1, b1,
           jnp.transpose(w2, (3, 2, 0, 1)), s2, b2,
           jnp.transpose(w3, (3, 2, 0, 1)), s3, b3)
    out_b = bottleneck("NCHW", x_b, p_b)
    d = float(jnp.max(jnp.abs(
        out_a.astype(jnp.float32)
        - jnp.transpose(out_b, (0, 2, 3, 1)).astype(jnp.float32))))
    print(f"layout parity max|diff| = {d:.6f}")
    assert d < 1e-2, d
    print("OK")


def main():
    if "--check" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        check_parity()
        return

    # Flagship stage shapes (ResNet-50 b128 microbatch, PERF_NOTES
    # reconciliation table rows): (label, N, H=W, Cexpand, Cmid).
    shapes = [
        ("stage1 56² 256/64", 128, 56, 256, 64),
        ("stage2 28² 512/128", 128, 28, 512, 128),
        ("stage3 14² 1024/256", 128, 14, 1024, 256),
    ]
    # fwd FLOPs of the three convs; bwd ~2x (dx + dw per conv).
    print(f"{'shape':<22} {'NHWC ms':>9} {'NCHW ms':>9} "
          f"{'NCHW/NHWC':>10} {'NHWC TF/s':>10}")
    for label, n, hw, c, cm in shapes:
        fwd_flops = 2 * n * hw * hw * (c * cm + 9 * cm * cm + cm * c)
        flops = 3 * fwd_flops
        row = {}
        for layout in ("NHWC", "NCHW"):
            x, params = make_inputs(layout, n, hw, c, cm)
            step = train_step(layout)
            try:
                row[layout] = device_time(
                    step, (x, params),
                    f"{layout}_{hw}")
            except Exception as e:
                print(f"  [{layout} failed: {type(e).__name__}: "
                      f"{str(e)[:140]}]")
                row[layout] = None
        a, b = row["NHWC"], row["NCHW"]
        if a and b:
            print(f"{label:<22} {a:>9.3f} {b:>9.3f} {b/a:>10.2f} "
                  f"{flops/(a/1e3)/1e12:>10.1f}")
        else:
            print(f"{label:<22} {a} {b}")


if __name__ == "__main__":
    main()
