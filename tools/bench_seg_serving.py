#!/usr/bin/env python
"""DeepLabv3+ serving rows (VERDICT r3 missing #3's perf criterion).

Measures the EXACT export_segmentation chain — normalize -> forward ->
(upsample) -> argmax + confidence — on chip at the recipe resolution,
in three precisions:

* f32        — the artifact as exported (parity-grade)
* bf16       — the forward under the BF16 policy (serving default)
* int8 calib — conv/dense on the int8 MXU path with baked static
               activation scales (core.quantize), like the ResNet-50
               serving rows in PERF_NOTES

Timing discipline per PERF_NOTES: K-deep value-evolving chains with a
single terminal value fetch (the relay acks block_until_ready early and
memoizes value-stationary chains), best of 3.  One JSON line per row.

    python tools/bench_seg_serving.py [--hw 513] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=513)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.core.precision import BF16, policy_scope
    from myconvnet_tpu.data.augment import normalize

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    hw, batch = args.hw, args.batch
    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)

    def make_chain(precision):
        def fwd(x, train=False):
            if precision == "bf16":
                with policy_scope(BF16):
                    return models.deeplab_v3_plus(
                        x.astype(jnp.bfloat16), 21,
                        train=train).astype(jnp.float32)
            return models.deeplab_v3_plus(x, 21, train=train)

        net = transform(fwd)
        x0 = jnp.zeros((batch, hw, hw, 3))
        params, state = net.init(jax.random.key(0), x0, False)

        scales = None
        if precision == "int8":
            from myconvnet_tpu.core.quantize import calibration_scope
            scales = {}
            cal = jax.random.uniform(jax.random.key(1),
                                     (batch, hw, hw, 3))
            with calibration_scope(scales):
                net.apply(params, state, None,
                          normalize(cal, mean, std), False)

        def chain(x):
            xn = normalize(x, mean, std)
            if precision == "int8":
                from myconvnet_tpu.core.quantize import int8_scope
                with int8_scope(scales=scales):
                    logits, _ = net.apply(params, state, None, xn, False)
            else:
                logits, _ = net.apply(params, state, None, xn, False)
            logits = jnp.asarray(logits, jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            classes = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return classes, jnp.max(probs, axis=-1)

        return jax.jit(chain)

    rng = np.random.RandomState(0)
    for precision in ("f32", "bf16", "int8"):
        chain = make_chain(precision)
        x = jax.device_put(rng.uniform(
            0, 1, (batch, hw, hw, 3)).astype(np.float32))
        cls, conf = chain(x)
        float(jnp.sum(conf))           # warm + settle
        best = None
        for _ in range(args.rounds):
            # evolve the input each dispatch so the relay cannot
            # memoize the chain; sync once per window via a value fetch
            t0 = time.perf_counter()
            xi = x
            for i in range(args.steps):
                xi = xi * np.float32(1.0 + 1e-6)
                cls, conf = chain(xi)
            float(jnp.sum(conf))
            dt = (time.perf_counter() - t0) / args.steps
            best = dt if best is None else min(best, dt)
        from myconvnet_tpu.utils.mfu import device_peak_flops
        try:
            comp = chain.lower(x).compile()
            an = comp.cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            fl = float(an.get("flops", 0.0))
        except Exception:
            fl = 0.0
        peak = device_peak_flops(
            dtype="int8" if precision == "int8" else "bf16")
        print(json.dumps({
            "row": f"deeplabv3plus_serving_{precision}",
            "hw": hw, "batch": batch,
            "ms_per_batch": round(best * 1e3, 2),
            "images_per_sec": round(batch / best, 1),
            "mfu_nominal": round(fl / best / peak, 3) if fl else None,
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
