#!/usr/bin/env python
"""Device-trace HBM bandwidth probe — the honest chip constant.

Round-5 finding (PERF_NOTES): bench.py's dispatch-chain probe reads
~411 GB/s on this stack, but that number is a TRANSPORT artifact —
host-clock timing through the axon relay pays per-dispatch/sync
latency that chaining cannot amortize.  Timing the same 2-read+1-write
sweep INSIDE one program (a lax.scan whose carry forces a fresh sweep
per iteration, un-fusable across iterations) and reading the per-
iteration duration from the DEVICE trace measures the memory system
itself: ~650 GB/s bf16 / ~700 GB/s f32 on this v5e — ~80-86% of the
819 GB/s nominal, not the 50% the old probe implied.

    python tools/measure_bw.py [--mib 205] [--length 32]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def scan_probe_device(shape, dtype, length=32, tag="bw"):
    """Per-iteration device time of c = c*k + b over ``length``
    serially-dependent sweeps; returns achieved GB/s (3 sweeps/iter:
    read c, read b, write c)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tools.profile_step import load_device_events

    n = int(np.prod(shape))
    b = jnp.ones(shape, dtype)
    a = (jnp.arange(n, dtype=jnp.float32).reshape(shape)
         * 1e-9).astype(dtype)

    @jax.jit
    def f(a, b):
        def body(c, _):
            return c * dtype(1.000001) + b, ()
        c, _ = lax.scan(body, a, None, length=length)
        return c

    a = f(a, b)
    float(jnp.sum(a[:1]))
    tdir = f"/tmp/bw_trace_{tag}"
    with jax.profiler.trace(tdir):
        a = f(a, b)
        float(jnp.sum(a[:1]))
    dev = load_device_events(tdir)
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in dev:
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.isdigit() or nm == "while":
            continue
        agg[nm] += float(e.get("dur", 0.0))
        cnt[nm] += 1
    # the scan body fusion: of the ops that ran ~length times, take
    # the one DOMINATING total device time — a per-iteration counter/
    # predicate fusion also repeats `length` times but costs ~1 us, so
    # picking by min per-occurrence duration would report absurd GB/s
    body_ops = [(d, d / cnt[nm], nm) for nm, d in agg.items()
                if cnt[nm] >= length]
    if not body_ops:
        raise RuntimeError(f"no scan-body op in trace: {dict(cnt)}")
    per_us = max(body_ops)[1]
    return 3 * n * np.dtype(dtype).itemsize / (per_us * 1e-6) / 1e9


def main():
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=205,
                    help="array size in MiB (bf16 elements)")
    ap.add_argument("--length", type=int, default=32)
    args = ap.parse_args()
    n = args.mib * (1 << 20) // 2
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        m = n if dt == jnp.bfloat16 else n // 2
        gbps = scan_probe_device((m,), dt, length=args.length,
                                 tag=name)
        print(f"{name}: {gbps:.1f} GB/s sustained "
              f"({3 * m * np.dtype(dt).itemsize / 1e6:.0f} MB/sweep-"
              f"set, {args.length} serial iters, device-trace timed)")


if __name__ == "__main__":
    main()
