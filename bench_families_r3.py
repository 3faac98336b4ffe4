#!/usr/bin/env python
"""Round-3 perf rows: the families VERDICT r2 flagged as unmeasured.

    python bench_families_r3.py [pix2pix deeplab ocr depth tracking]

* pix2pix — BASELINE config #5 (the one config with no on-chip number):
  the fused dual-optimizer step at the recipe's b16 256².
* deeplab — BASELINE config #4 re-measure at the recipe's 513x513 b16
  (round 2 carried only a round-1 number), plus the remat A/B at the
  memory-critical resolution.
* ocr / depth / tracking — first on-chip rows for the
  CRNN / DispNet-UNet / SiamFC recipes at their config sizes.

Timing discipline per PERF_NOTES: 20-step windows, value-fetch sync,
best of 3, one fixed device-resident batch (input variation is not the
quantity under test; the relay memoizes only value-stationary CHAINS,
and the evolving train state defeats that).
One JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sync_fetch(metrics):
    v = next(iter(metrics.values())) if isinstance(metrics, dict) \
        else metrics
    return float(np.asarray(v).sum())


def _time_step(step_fn, state, batch, steps=20, rounds=3):
    for _ in range(2):
        state, m = step_fn(state, batch)
    _sync_fetch(m)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step_fn(state, batch)
        _sync_fetch(m)
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    return best, state, m


def _flops(step_fn, state, batch):
    try:
        comp = step_fn.lower(state, batch).compile()
        an = comp.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def _convnet_row(label, build, cfg, batch):
    import jax

    from myconvnet_tpu import recipes

    net, train_set, _va = build(cfg, synthetic=True)
    net.build(recipes.make_optimizer(cfg["optimizer"]),
              batch_size=batch)
    trainer = net._make_trainer(None)
    bt = tuple(jax.device_put(t) for t in
               train_set.source.get_batch(np.arange(batch)))
    bt = bt if len(bt) > 1 else bt[0]
    best, state, m = _time_step(
        lambda s, b: trainer._train_step(s, b), net.state, bt)
    fl = _flops(trainer._train_step, state, bt)
    return {"row": label, "batch": batch,
            "step_ms": round(best * 1e3, 1),
            "images_per_sec": round(batch / best, 1),
            "flops_per_step_T": round(fl / 1e12, 2),
            "mfu_nominal": round(fl / best / 197e12, 3) if fl else None}


def bench_pix2pix():
    import jax

    from myconvnet_tpu import recipes

    cfg = recipes.load_config("configs/pix2pix.py")
    cfg.update(total_steps=100)
    state, step, data_iter_fn, kind = recipes.build_gan(cfg,
                                                        synthetic=True)
    it = data_iter_fn()
    batch = next(it)
    if hasattr(it, "close"):
        it.close()
    batch = jax.tree.map(jax.device_put, batch)
    best, state, m = _time_step(step, state, batch)
    fl = _flops(step, state, batch)
    b = cfg["batch_size"]
    return {"row": f"pix2pix fused G+D step b{b} "
                   f"{cfg['image_size']}² {cfg['precision']}",
            "batch": b, "step_ms": round(best * 1e3, 1),
            "images_per_sec": round(b / best, 1),
            "flops_per_step_T": round(fl / 1e12, 2),
            "mfu_nominal": round(fl / best / 197e12, 3) if fl else None}


def bench_deeplab():
    from myconvnet_tpu import recipes

    rows = []
    for remat in (False, True):
        cfg = recipes.load_config("configs/voc_deeplabv3plus.py")
        cfg.update(total_steps=100, remat=remat, precision="bf16")
        # the synthetic-fallback shrink in build_segmenter is for CPU
        # smoke; measuring the RECIPE resolution needs the real 513
        cfg["augment"]["out_hw"] = (513, 513)
        import jax

        net, train_set, _ = _build_seg_fullres(cfg)
        b = cfg["batch_size"]
        net.build(recipes.make_optimizer(cfg["optimizer"]),
                  batch_size=b)
        trainer = net._make_trainer(None)
        bt = tuple(jax.device_put(t) for t in
                   train_set.source.get_batch(np.arange(b)))
        best, state, m = _time_step(
            lambda s, x: trainer._train_step(s, x), net.state, bt)
        fl = _flops(trainer._train_step, state, bt)
        rows.append({
            "row": f"deeplabv3+ xception65 513² b{b} bf16"
                   + (" remat" if remat else ""),
            "batch": b, "step_ms": round(best * 1e3, 1),
            "images_per_sec": round(b / best, 1),
            "flops_per_step_T": round(fl / 1e12, 2),
            "mfu_nominal": round(fl / best / 197e12, 3) if fl else None})
    return rows


def _build_seg_fullres(cfg):
    """build_segmenter shrinks synthetic runs to 96x96 for CPU smoke;
    clone its wiring at the recipe's true resolution for the chip."""
    import jax.numpy as jnp

    from myconvnet_tpu import models, recipes
    from myconvnet_tpu.data.pipeline import DataSet
    from myconvnet_tpu.models.base import ConvNet
    from myconvnet_tpu.subsets import voc
    from myconvnet_tpu.train.losses import pixel_cross_entropy

    aug = recipes.make_augment(cfg.get("augment"))
    model_fn = models.get_model(cfg["model"])
    loss = lambda logits, y: pixel_cross_entropy(  # noqa: E731
        logits, y, ignore_label=cfg.get("ignore_label", 255))
    net = ConvNet(model_fn, input_shape=(*aug.out_hw, 3),
                  num_classes=cfg["num_classes"],
                  precision=cfg.get("precision", "f32"), loss_fn=loss,
                  augment=aug, paired_targets=True,
                  seed=0, remat=cfg.get("remat", False),
                  **dict(cfg.get("model_kwargs", {})))
    # full-resolution synthetic masks (make_source's synthetic branch
    # pins 96x96 for CPU smoke)
    src = voc.PairArraySource(*voc.synthetic_subset(
        cfg["batch_size"], (550, 550), 0))
    return net, DataSet(src), None


def bench_ocr():
    from myconvnet_tpu import recipes

    cfg = recipes.load_config("configs/mjsynth_crnn.py")
    cfg.update(total_steps=100, synthetic_n=256)
    return _convnet_row(
        f"crnn ocr {tuple(cfg['input_hw'])} b{cfg['batch_size']} "
        f"{cfg.get('precision', 'f32')}",
        recipes.build_ocr, cfg, cfg["batch_size"])


def bench_depth():
    from myconvnet_tpu import recipes

    cfg = recipes.load_config("configs/nyu_depth_unet.py")
    cfg.update(total_steps=100, synthetic_n=64)
    return _convnet_row(
        f"dispnet-unet depth {tuple(cfg['input_hw'])} "
        f"b{cfg['batch_size']} {cfg.get('precision', 'f32')}",
        recipes.build_depth, cfg, cfg["batch_size"])


def bench_tracking():
    from myconvnet_tpu import recipes

    cfg = recipes.load_config("configs/got10k_siamfc.py")
    cfg.update(total_steps=100, synthetic_n=64)
    return _convnet_row(
        f"siamfc w48 search128 b{cfg['batch_size']} "
        f"{cfg.get('precision', 'f32')}",
        recipes.build_tracking, cfg, cfg["batch_size"])


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
    table = {"pix2pix": bench_pix2pix, "deeplab": bench_deeplab,
             "ocr": bench_ocr, "depth": bench_depth,
             "tracking": bench_tracking}
    names = sys.argv[1:] or list(table)
    for name in names:
        out = table[name]()
        for row in (out if isinstance(out, list) else [out]):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
