#!/usr/bin/env python
"""Flow-family benchmark: FlowNetS/C train-step throughput on the chip.

Builds the recipe exactly as train.py would (recipes.build_flow on the
synthetic corpus at FlyingChairs resolution 384x512), times the fused
train step — uint8 frame pairs in HBM -> paired hflip + photometric
jitter -> forward -> Charbonnier EPE -> backward -> update — with
value-fetch sync (this relay acks block_until_ready before execution
finishes; a scalar fetch cannot lie).  One JSON line per model:

    python bench_flow.py                 # flownet_s + flownet_c
    python bench_flow.py flownet_c       # a subset
    BENCH_FLOW_BATCH=16 python bench_flow.py flownet_s

MFU is XLA-cost-analysis flops/step over the 197 Tflop/s nominal bf16
peak — the same convention as the PERF_NOTES detection tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# model -> (batch, hw): FlyingChairs is uniform 384x512; both paper
# nets train at batch 8 there
SWEEP = {
    "flownet_s": (8, (384, 512)),
    "flownet_c": (8, (384, 512)),
    "pwcnet": (8, (384, 512)),
}


def bench_one(name: str, batch: int, hw, steps: int = 20):
    import jax

    from myconvnet_tpu import recipes

    cfg = dict(
        task="flow", model=name, dataset="flow", data_dir=None,
        input_hw=hw, max_motion=16, synthetic_n=batch,
        batch_size=batch, precision="bf16",
        optimizer=dict(name="adam", lr=dict(kind="constant", lr=1e-4)),
        seed=0)
    net, train_set, _va = recipes.build_flow(cfg, synthetic=True)
    net.build(recipes.make_optimizer(cfg["optimizer"]), batch_size=batch)
    trainer = net._make_trainer(None)
    state = net.state
    x, y = train_set.source.get_batch(np.arange(batch))
    batch_t = (jax.device_put(x), jax.device_put(y))

    t0 = time.perf_counter()
    for _ in range(2):
        state, m = trainer._train_step(state, batch_t)
    float(m["loss"])
    compile_s = time.perf_counter() - t0

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = trainer._train_step(state, batch_t)
        float(m["loss"])  # value fetch = real sync
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    flops = 0.0
    try:
        comp = trainer._train_step.lower(state, batch_t).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        flops = float(an.get("flops", 0.0))
    except Exception:
        pass
    return {
        "model": name, "batch": batch, "input_hw": list(hw),
        "step_ms": round(best * 1e3, 1),
        "images_per_sec": round(batch / best, 1),
        "flops_per_step_T": round(flops / 1e12, 2),
        "mfu_nominal": round(flops / best / 197e12, 3) if flops else None,
        "compile_warmup_s": round(compile_s, 1),
        "loss": round(float(m["loss"]), 4),
    }


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    names = sys.argv[1:] or list(SWEEP)
    force_batch = os.environ.get("BENCH_FLOW_BATCH")
    for name in names:
        if name not in SWEEP:
            raise SystemExit(f"unknown model {name!r}; "
                             f"valid: {sorted(SWEEP)}")
        batch, hw = SWEEP[name]
        if force_batch:
            batch = int(force_batch)
        print(json.dumps(bench_one(name, batch, hw)), flush=True)


if __name__ == "__main__":
    main()
