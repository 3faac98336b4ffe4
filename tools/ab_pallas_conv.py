#!/usr/bin/env python
"""A/B: Pallas fused im2col conv3x3+BN+ReLU vs XLA's conv fusion.

The VERDICT-r2 experiment on the ResNet bottleneck shapes.  Timing
discipline per PERF_NOTES: 20-dispatch chains under one value-fetch
sync (the relay acks block_until_ready early), inputs evolve through
the chain (x = f(x, ...) — SAME/stride-1/Cin==Cout keeps shapes), round
0 discarded, best of 3.

    python tools/ab_pallas_conv.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


INNER = 8  # convs per dispatch: the relay has a ~2 ms per-dispatch
#            floor that swamps a single ~0.2 ms conv; chaining inside
#            the jitted program amortizes it away


def timed_chain(f, args, chain=10, rounds=3):
    """f applied INNER times inside one jit; per-op time returned."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rep(x, *rest):
        for _ in range(INNER):
            x = f(x, *rest)
        return x

    x = args[0]
    out = rep(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = None
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        y = x
        for _ in range(chain):
            y = rep(y, *args[1:])
        float(jnp.sum(y.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / (chain * INNER)
        if r == 0:
            continue
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu.ops.pallas.conv_fused import (
        conv3x3_bn_relu, conv3x3_bn_relu_reference)

    shapes = [
        # (label, N, H, W, C, images_per_block list)
        ("stage1 3x3  56x56x64", 128, 56, 56, 64, (1, 2)),
        ("stage2 3x3  28x28x128", 128, 28, 28, 128, (1, 2, 4)),
        ("stage3 3x3  14x14x256", 128, 14, 14, 256, (1, 4, 8)),
        ("stage4 3x3  7x7x512", 128, 7, 7, 512, (4, 8, 16)),
    ]
    xla_ref = jax.jit(conv3x3_bn_relu_reference)
    print(f"{'shape':<24} {'XLA ms':>8} {'XLA TF/s':>9}  "
          f"{'pallas(g) ms':>28} {'best TF/s':>9}")
    for label, n, h, w, c, gs in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, h, w, c) * 0.1, jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        sc = jnp.asarray(rng.rand(c) * 0.5 + 0.75, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        flops = 2 * n * h * w * 9 * c * c
        t_xla = timed_chain(xla_ref, (x, w3, sc, b))
        res = []
        for g in gs:
            try:
                f = lambda x_, w_, s_, b_, g_=g: conv3x3_bn_relu(  # noqa
                    x_, w_, s_, b_, images_per_block=g_)
                t = timed_chain(f, (x, w3, sc, b))
                res.append((g, t))
            except Exception as e:
                res.append((g, None))
                print(f"  [g={g} failed: {type(e).__name__}: "
                      f"{str(e)[:120]}]")
        ok = [t for _, t in res if t is not None]
        best = min(ok) if ok else float("nan")
        pl_s = " ".join(
            f"g{g}:{t*1e3:.2f}" if t else f"g{g}:FAIL" for g, t in res)
        print(f"{label:<24} {t_xla*1e3:>8.2f} {flops/t_xla/1e12:>9.1f}  "
              f"{pl_s:>28} {flops/best/1e12:>9.1f}")

        # numerics sanity on-chip (first shape only, cheap)
        out_p = conv3x3_bn_relu(x, w3, sc, b, images_per_block=gs[0])
        out_r = xla_ref(x, w3, sc, b)
        d = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                  - out_r.astype(jnp.float32))))
        m = float(jnp.max(jnp.abs(out_r.astype(jnp.float32))))
        print(f"    [max|diff| {d:.4f} vs max|ref| {m:.2f}]")


if __name__ == "__main__":
    main()
