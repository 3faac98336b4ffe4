#!/usr/bin/env python
"""ViT-family benchmark: supervised and self-supervised train-step
throughput on the chip.

Same measurement discipline as bench_detection.py: fused step (on-device
augmentation + fwd + bwd + optimizer) exactly as the shipped recipe
builds it, value-fetch sync, best of 3 windows; MFU = XLA-costed
flops/step over the 197 Tflop/s nominal bf16 peak.

    python bench_vit.py                    # full sweep
    python bench_vit.py vit_b16 mae_b16    # subset
    BENCH_VIT_BATCH=64 python bench_vit.py mae_b16

The interesting comparison is mae_b16 vs vit_b16 at equal batch: MAE's
encoder sees only the 25% visible tokens, so its step moves far fewer
flops per image — the measured ratio quantifies the pretraining
throughput win on this hardware.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# name -> (batch, kind)
SWEEP = {
    "vit_s16": (256, "supervised"),
    "vit_b16": (128, "supervised"),
    "mae_b16": (128, "mae"),
    "simclr_r50": (128, "simclr"),
}


def _classifier_step(model_name: str, batch: int):
    """The imagenet_vit recipe's hot loop: RandAugment-free variant
    (crop/flip/jitter) so the timing isolates the model family."""
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.core.precision import get_policy, policy_scope
    from myconvnet_tpu.data.augment import AugmentConfig, augment_train
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train.trainer import init_train_state

    pol = get_policy("bf16")
    model_fn = models.get_model(model_name)

    def fwd(x, train=False):
        with policy_scope(pol):
            x = pol.cast_to_compute(x)
            out = model_fn(x, 1000, train=train, drop_path_rate=0.1)
            return pol.cast_to_output(out)

    model = transform(fwd)
    opt = optim.adamw(1e-3, weight_decay=0.05,
                      weight_decay_exclude=optim.norm_and_bias_exclusion)
    cfg = AugmentConfig(out_hw=(224, 224), area_range=(0.08, 1.0),
                        flip=True, out_dtype="bfloat16")
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros((batch, 224, 224, 3),
                                       jnp.bfloat16))

    def step(state, raw, labels):
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        k_aug, k_model = jax.random.split(key)

        def loss_fn(params, mstate):
            x = augment_train(k_aug, raw, cfg)
            logits, new_mstate = model.apply(params, mstate, k_model, x,
                                             True)
            return softmax_cross_entropy(logits, labels,
                                          label_smoothing=0.1), new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.model_state)
        new_params, new_opt = opt.update(grads, state.opt_state,
                                         state.params, state.step)
        return state._replace(params=new_params, model_state=new_mstate,
                              opt_state=new_opt,
                              step=state.step + 1), {"loss": loss}

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    labels = rng.randint(0, 1000, batch)
    import jax as _jax
    args = (_jax.device_put(raw), _jax.device_put(labels))
    jitted = _jax.jit(step, donate_argnums=(0,))
    return state, jitted, args, batch


def _ssl_step(name: str, batch: int):
    from myconvnet_tpu import recipes

    cfg_path = {"mae_b16": "configs/imagenet_mae_vit_b16.py",
                "simclr_r50": "configs/imagenet_simclr_resnet50.py"}[name]
    cfg = recipes.load_config(cfg_path)
    cfg.update(batch_size=batch)
    state, step, _tr, _va, _f, _ = recipes.build_ssl(cfg, synthetic=True)
    import jax
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(0, 256, (batch, 224, 224, 3),
                                   dtype=np.uint8))
    return state, step, (x,), batch


def bench_one(name: str, batch: int, kind: str, steps: int = 20):
    if kind == "supervised":
        state, step, args, batch = _classifier_step(name, batch)
    else:
        state, step, args, batch = _ssl_step(name, batch)

    t0 = time.perf_counter()
    for _ in range(2):
        state, m = step(state, *args)
    float(m["loss"])
    compile_s = time.perf_counter() - t0

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, *args)
        float(m["loss"])  # value fetch = real sync
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    flops = 0.0
    try:
        comp = step.lower(state, *args).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        flops = float(an.get("flops", 0.0))
    except Exception:
        pass
    return {
        "model": name, "batch": batch, "kind": kind,
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
    force_batch = os.environ.get("BENCH_VIT_BATCH")
    for name in names:
        if name not in SWEEP:
            raise SystemExit(f"unknown model {name!r}; "
                             f"valid: {sorted(SWEEP)}")
        batch, kind = SWEEP[name]
        if force_batch:
            batch = int(force_batch)
        print(json.dumps(bench_one(name, batch, kind)), flush=True)


if __name__ == "__main__":
    main()
