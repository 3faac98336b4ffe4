#!/usr/bin/env python
"""A/B: VMEM-resident conv1x1+BN+ReLU+conv3x3+BN+ReLU Pallas pair vs
XLA's two-dispatch chain (VERDICT r4 weak #2 — the intermediate's HBM
round-trip is the one traffic XLA cannot eliminate).

Timing: DEVICE-TRACE durations, not host clocks — this transport's
per-dispatch/sync latency pollutes host timing (PERF_NOTES round 5:
the 411 GB/s "measured bandwidth" artifact).  Each variant runs
``iters`` dispatches under jax.profiler.trace; the per-op self time of
the dominant kernel is the number.

    python tools/ab_pallas_conv_pair.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def device_time(fn, args, tag, iters=12):
    """Total device-op ms/iter from a profiler trace (relay-immune)."""
    from tools.profile_step import device_time as dt
    return dt(fn, args, f"pair_{tag}", iters=iters)


def main():
    import jax.numpy as jnp

    from myconvnet_tpu.ops.pallas.conv_pair import (
        conv1x1_conv3x3_bn_relu, conv_pair_reference)

    shapes = [
        # (label, N, H, W, Cin, Cm, Cout, g list)
        ("stage1 56² 256->64->64", 128, 56, 56, 256, 64, 64, (1,)),
        ("stage2 28² 512->128->128", 128, 28, 28, 512, 128, 128,
         (1, 2)),
        ("stage3 14² 1024->256->256", 128, 14, 14, 1024, 256, 256,
         (1, 2, 4)),
    ]
    print(f"{'shape':<28} {'XLA ms':>8} {'XLA TF/s':>9}  "
          f"{'pallas(g) ms':>24} {'best TF/s':>9}")
    for label, n, h, w, cin, cm, co, gs in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, h, w, cin) * 0.1, jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(1, 1, cin, cm) * 0.05, jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(3, 3, cm, co) * 0.05, jnp.bfloat16)
        s1 = jnp.asarray(rng.rand(cm) * 0.5 + 0.75, jnp.float32)
        b1 = jnp.asarray(rng.randn(cm) * 0.1, jnp.float32)
        s3 = jnp.asarray(rng.rand(co) * 0.5 + 0.75, jnp.float32)
        b3 = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        flops = 2 * n * h * w * cm * (cin + 9 * co)
        t_xla = device_time(
            conv_pair_reference, (x, w1, s1, b1, w3, s3, b3),
            f"xla_{h}")
        res = []
        for g in gs:
            try:
                t = device_time(
                    lambda *a, g_=g: conv1x1_conv3x3_bn_relu(
                        *a, images_per_block=g_),
                    (x, w1, s1, b1, w3, s3, b3), f"pl_{h}_{g}")
                res.append((g, t))
            except Exception as e:
                res.append((g, None))
                print(f"  [g={g} failed: {type(e).__name__}: "
                      f"{str(e)[:120]}]")
        ok = [t for _, t in res if t is not None]
        best = min(ok) if ok else float("nan")
        pl_s = " ".join(f"g{g}:{t:.2f}" if t else f"g{g}:FAIL"
                        for g, t in res)
        print(f"{label:<28} {t_xla:>8.2f} "
              f"{flops/(t_xla/1e3)/1e12:>9.1f}  {pl_s:>24} "
              f"{flops/(best/1e3)/1e12:>9.1f}")

        import jax.numpy as jnp2
        out_p = conv1x1_conv3x3_bn_relu(x, w1, s1, b1, w3, s3, b3,
                                        images_per_block=gs[0])
        out_r = conv_pair_reference(x, w1, s1, b1, w3, s3, b3)
        d = float(jnp2.max(jnp2.abs(out_p.astype(jnp2.float32)
                                    - out_r.astype(jnp2.float32))))
        m = float(jnp2.max(jnp2.abs(out_r.astype(jnp2.float32))))
        print(f"    [max|diff| {d:.4f} vs max|ref| {m:.2f}]")


if __name__ == "__main__":
    main()
