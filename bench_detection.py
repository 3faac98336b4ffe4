#!/usr/bin/env python
"""Detection-family benchmark: train-step throughput per architecture.

Reproduces the PERF_NOTES.md detection tables: builds each recipe
exactly as train.py would (recipes.build_detector on the synthetic
sources at the real input size), times the fused train step with
value-fetch sync (this relay acks block_until_ready before execution
finishes — a scalar fetch cannot lie), and prints one JSON line per
model:

    python bench_detection.py                 # the default sweep
    python bench_detection.py ssd300 fcos     # a subset
    BENCH_DET_BATCH=8 python bench_detection.py faster_rcnn

MFU is XLA-cost-analysis flops/step over the 197 Tflop/s nominal bf16
peak — the same convention as the PERF_NOTES tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# model -> (batch, recipe overrides)
SWEEP = {
    "ssd300": (32, {}),
    "ssd512": (16, {}),
    "retinanet": (16, {}),
    # the shipped FCOS recipe carries clip_norm (it diverges without
    # warmup+clipping); the bench reproduces that
    "fcos": (16, dict(optimizer=dict(
        name="momentum", momentum_coef=0.9, weight_decay=1e-4,
        clip_norm=1.0, lr=dict(kind="constant", lr=1e-3)))),
    "faster_rcnn": (8, {}),
    "mask_rcnn": (8, {}),
    "keypoint_rcnn": (8, dict(model_kwargs=dict(num_keypoints=17))),
    "panoptic_fpn": (8, {}),
}


def bench_one(name: str, batch: int, overrides: dict, steps: int = 20):
    import jax

    from myconvnet_tpu import models, recipes

    model_fn = models.get_model(name)
    cfg = dict(
        task="detection", model=name, dataset="voc", data_dir=None,
        num_classes=21, input_hw=tuple(model_fn.input_hw),
        max_boxes=8, batch_size=batch, total_steps=steps,
        precision="bf16",
        optimizer=dict(name="momentum", momentum_coef=0.9,
                       weight_decay=1e-4,
                       lr=dict(kind="constant", lr=1e-3)),
        augment=dict(flip=True), seed=0, **overrides)
    if name in ("keypoint_rcnn",):
        cfg.update(dataset="coco", num_classes=2)
    state, step, _predict, train_set, _ = recipes.build_detector(
        cfg, synthetic=True)
    batch_t = next(iter(train_set.train_iter(batch, prefetch=0)))
    batch_t = tuple(jax.device_put(np.asarray(t)) for t in batch_t)

    t0 = time.perf_counter()
    for _ in range(2):
        state, m = step(state, batch_t)
    float(m["loss"])
    compile_s = time.perf_counter() - t0

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch_t)
        float(m["loss"])  # value fetch = real sync
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    flops = 0.0
    try:
        comp = step.lower(state, batch_t).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        flops = float(an.get("flops", 0.0))
    except Exception:
        pass
    return {
        "model": name, "batch": batch,
        "input_hw": list(model_fn.input_hw),
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
    force_batch = os.environ.get("BENCH_DET_BATCH")
    for name in names:
        if name not in SWEEP:
            raise SystemExit(f"unknown model {name!r}; "
                             f"valid: {sorted(SWEEP)}")
        batch, overrides = SWEEP[name]
        if force_batch:
            batch = int(force_batch)
        print(json.dumps(bench_one(name, batch, overrides)), flush=True)


if __name__ == "__main__":
    main()
