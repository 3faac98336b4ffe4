#!/usr/bin/env python
"""Training entry point (reference: train.py at repo root — SURVEY.md
§2#9).

    python train.py --config configs/cifar10_smallnet.py [--synthetic]
        [--steps N] [--batch N] [--data_dir D] [--out runs/name]

Wires config -> DataSet -> model -> Evaluator -> trainer and runs the
jitted step loop with periodic validation and best-checkpoint retention.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--synthetic", action="store_true",
                    help="use generated data (no corpus required)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None,
                    help="train for N epochs of the train split "
                         "(overrides total_steps)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--out", default=None, help="run dir (ckpts + logs)")
    ap.add_argument("--val_every", type=int, default=None)
    ap.add_argument("--accum_steps", type=int, default=None,
                    help="gradient-accumulation microbatches per step")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward in backward "
                         "(activation-memory saver)")
    ap.add_argument("--mesh", nargs="?", const="auto", default=None,
                    metavar="DxM",
                    help="train over a device mesh: bare --mesh = all "
                         "devices data-parallel; '4x2' = 4-way data x "
                         "2-way model; overrides the config's mesh= "
                         "block")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --out")
    ap.add_argument("--max_restarts", type=int, default=0,
                    help="on crash, restart from the latest checkpoint "
                         "up to N times (single-process failure "
                         "recovery; SURVEY.md §5)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files under --out")
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of the run under "
                         "--out/trace (open in TensorBoard/Perfetto)")
    ap.add_argument("--summary", action="store_true",
                    help="print the model's per-scope parameter table "
                         "(+XLA-costed GFLOPs) before training")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--set", action="append", default=None,
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any config entry (repeatable; values "
                         "parse as Python literals, dotted keys reach "
                         "nested dicts: --set optimizer.name=sgd)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from myconvnet_tpu import recipes
    from myconvnet_tpu.parallel import make_mesh
    from myconvnet_tpu.utils.logging import MetricLogger

    cfg = recipes.load_config(args.config, total_steps=args.steps,
                              epochs=args.epochs,
                              batch_size=args.batch,
                              data_dir=args.data_dir,
                              val_every=args.val_every,
                              accum_steps=args.accum_steps,
                              remat=(True if args.remat else None))
    cfg = recipes.apply_overrides(cfg, args.overrides)
    out = args.out or os.path.join(
        "runs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(out, exist_ok=True)
    # reproducibility: persist the RESOLVED config (file + CLI overrides)
    import json
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1, default=str)
    mesh_spec = args.mesh or cfg.get("mesh")
    if mesh_spec is None:
        mesh = None
    elif mesh_spec == "auto" or mesh_spec is True:
        mesh = make_mesh()          # all devices data-parallel
    elif isinstance(mesh_spec, str):
        d, _, m = mesh_spec.partition("x")
        mesh = make_mesh(int(d), int(m or 1))
    else:                           # config block: mesh=dict(data=, model=)
        mesh = make_mesh(int(mesh_spec.get("data")) if
                         mesh_spec.get("data") else None,
                         int(mesh_spec.get("model", 1)))

    if cfg["task"] == "gan":
        run_gan(cfg, args, out)
        return
    if cfg["task"] == "detection":
        run_detection(cfg, args, out, mesh)
        return
    if cfg["task"] == "ssl":
        run_ssl(cfg, args, out, mesh)
        return
    if cfg["task"] == "diffusion":
        run_diffusion(cfg, args, out, mesh)
        return
    if cfg["task"] == "semisup":
        run_semisup(cfg, args, out, mesh)
        return
    if cfg["task"] == "distill":
        run_distill(cfg, args, out, mesh)
        return
    if cfg["task"] == "style":
        run_style(cfg, args, out)
        return

    if cfg.get("pipeline"):
        # pipeline-parallel path: staged model over a 'model'-axis mesh
        # (train/pipeline_driver.py)
        if mesh_spec is not None:
            raise SystemExit(
                "--mesh/config mesh= conflicts with pipeline=: the "
                "pipelined driver builds its own 'model'-axis mesh of "
                "pipeline.stages devices (data x pipeline composition "
                "is not wired through this entry point)")
        from myconvnet_tpu.train.pipeline_driver import run_pipelined
        run_pipelined(cfg, args, out, synthetic=args.synthetic)
        return

    attempts = 0
    while True:
        try:
            run_supervised(cfg, args, out, mesh,
                           resume=args.resume or attempts > 0)
            return
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception as e:  # crash -> resume from latest checkpoint
            attempts += 1
            if attempts > args.max_restarts:
                raise
            print(f"[restart {attempts}/{args.max_restarts}] after "
                  f"{type(e).__name__}: {e}; resuming from latest "
                  f"checkpoint in {out}")


def run_supervised(cfg, args, out, mesh, resume: bool):
    from myconvnet_tpu import recipes
    from myconvnet_tpu.utils.logging import MetricLogger

    builder = {"segmentation": recipes.build_segmenter,
               "sr": recipes.build_sr,
               "video": recipes.build_video,
               "audio": recipes.build_audio,
               "ocr": recipes.build_ocr,
               "depth": recipes.build_depth,
               "flow": recipes.build_flow,
               "tracking": recipes.build_tracking,
               "metric": recipes.build_metric}.get(cfg["task"],
                                                   recipes.build_classifier)
    net, train_set, val_set = builder(cfg, synthetic=args.synthetic,
                                      ckpt_dir=out, log_dir=out, mesh=mesh)
    from myconvnet_tpu.utils.preemption import PreemptionGuard
    guard = PreemptionGuard().__enter__()
    net.preemption_guard = guard
    if args.tensorboard:
        net.logger = MetricLogger(log_dir=out, tensorboard=True)
    if cfg.get("epochs"):
        # resolve epochs BEFORE the optimizer builds so step-horizon
        # schedules (cosine/poly/warmup totals) match the actual run
        spe = max(len(train_set) // cfg["batch_size"], 1)
        cfg["total_steps"] = int(cfg["epochs"]) * spe
        lr = cfg.get("optimizer", {}).get("lr")
        if isinstance(lr, dict) and "total_steps" in lr:
            lr["total_steps"] = cfg["total_steps"]
        import json
        with open(os.path.join(out, "config.json"), "w") as f:
            json.dump(cfg, f, indent=1, default=str)
    evaluator = recipes.build_evaluator(cfg)
    optimizer = recipes.make_optimizer(cfg["optimizer"])
    if args.summary:
        net.build(optimizer)
        net.summary()
    if cfg.get("pretrained") and not resume:
        # warm-start (fine-tuning workflow): torch state_dict file or
        # flat npz into the fresh params; resume skips it (the
        # checkpoint already carries the trained weights)
        net.build(optimizer)
        recipes.apply_pretrained(net, cfg)
    if resume:
        from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
        if ckpt_lib.latest_checkpoint(out):
            net.build(optimizer)
            net.restore(out)
            print(f"resumed from step {int(net.state.step)}")
    if getattr(args, "trace", False):
        from myconvnet_tpu.utils.profiling import trace
        with trace(os.path.join(out, "trace")):
            net.train(train_set, val_set, batch_size=cfg["batch_size"],
                      total_steps=cfg["total_steps"], optimizer=optimizer,
                      evaluator=evaluator,
                      val_every=cfg.get("val_every", 0),
                      early_stop_patience=cfg.get("early_stop_patience",
                                                  0),
                      plateau_factor=cfg.get("plateau_factor", 0.0),
                      plateau_patience=cfg.get("plateau_patience", 0))
        print(f"trace: {os.path.join(out, 'trace')}")
    else:
        net.train(train_set, val_set, batch_size=cfg["batch_size"],
                  total_steps=cfg["total_steps"], optimizer=optimizer,
                  evaluator=evaluator, val_every=cfg.get("val_every", 0),
                  early_stop_patience=cfg.get("early_stop_patience", 0),
                  plateau_factor=cfg.get("plateau_factor", 0.0),
                  plateau_patience=cfg.get("plateau_patience", 0))
    # fault injection for testing the crash-resume path: crash exactly
    # once after training (a checkpoint exists), before evaluation
    if os.environ.get("MYCONVNET_FAULT_ONCE"):
        marker = os.path.join(out, ".fault_injected")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected fault (MYCONVNET_FAULT_ONCE)")
    score = net.evaluate(val_set, evaluator,
                         batch_size=cfg["batch_size"])
    print(f"final val {evaluator.name}: {score:.4f}")
    net.save()
    try:
        from myconvnet_tpu.utils.plots import plot_curves
        curves = plot_curves(os.path.join(out, "train.jsonl"))
        print(f"curves: {curves}")
    except Exception:
        pass


def ckpt_lib_latest(out):
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    return ckpt_lib.latest_checkpoint(out)


def run_detection(cfg, args, out, mesh=None):
    """Detection training loop (the fourth task family): fused jitted
    step + periodic mAP validation with best-checkpoint retention —
    same driver shape as run_gan.  With --mesh the batch shards over
    the data axis (GSPMD data parallelism, like every other family)."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=args.synthetic, mesh=mesh)
    put_fn = None
    if mesh is not None:
        from myconvnet_tpu.parallel import shard_batch
        put_fn = lambda b: shard_batch(mesh, b)  # noqa: E731
    if args.resume and ckpt_lib.latest_checkpoint(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed detection from step {int(state.step)}")
    evaluator = recipes.build_evaluator(cfg)
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name="detection")
    log_every = cfg.get("log_every", 100)
    val_every = cfg.get("val_every", 0)
    total = cfg["total_steps"]
    batch = cfg["batch_size"]
    best = evaluator.worst_score()
    start = int(state.step)
    it = train_set.train_iter(batch, device_put_fn=put_fn)
    for i, b in enumerate(it):
        i = start + i
        if i >= total or guard.preempted:
            break
        state, metrics = step(state, b)
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if val_every and (i + 1) % val_every == 0:
            score = recipes.evaluate_detection(state, predict, val_set,
                                               batch, evaluator,
                                               mesh=mesh)
            logger.log(i + 1, {"val_mAP": score})
            print(f"step {i + 1}: val mAP {score:.4f}")
            if evaluator.is_better(score, best):
                best = score
                ckpt_lib.save_checkpoint(out, i + 1, state._asdict(),
                                         keep=2, metric=score,
                                         is_best=True)
    if hasattr(it, "close"):
        it.close()
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    score = recipes.evaluate_detection(state, predict, val_set, batch,
                                       evaluator, mesh=mesh)
    print(f"final val mAP: {score:.4f}")


def run_ssl(cfg, args, out, mesh=None):
    """Self-supervised pretraining loop (the fifth task family): fused
    jitted MAE/SimCLR step + periodic kNN-probe validation — same
    driver shape as run_detection.  Ends by exporting the encoder as
    ``<out>/encoder.npz`` for ``pretrained=`` warm starts (the
    pretrain -> fine-tune workflow)."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.train import ssl as ssl_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, train_set, val_set, feats_fn, kind = recipes.build_ssl(
        cfg, synthetic=args.synthetic, mesh=mesh)
    put_fn = None
    if mesh is not None:
        from myconvnet_tpu.parallel import shard_batch
        put_fn = lambda b: shard_batch(mesh, b)  # noqa: E731
    if args.resume and ckpt_lib.latest_checkpoint(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed ssl from step {int(state.step)}")
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name=f"ssl_{kind}")
    log_every = cfg.get("log_every", 100)
    val_every = cfg.get("val_every", 0)
    total = cfg["total_steps"]
    batch = cfg["batch_size"]
    knn_kw = dict(k=cfg.get("knn_k", 20),
                  num_classes=cfg["num_classes"],
                  max_bank=cfg.get("knn_bank", 4096),
                  max_query=cfg.get("knn_query", 2048))

    def probe():
        return ssl_lib.knn_eval(feats_fn, state,
                                train_set.eval_iter(batch),
                                val_set.eval_iter(batch), **knn_kw)

    start = int(state.step)
    it = train_set.train_iter(batch, device_put_fn=put_fn)
    for i, b in enumerate(it):
        i = start + i
        if i >= total or guard.preempted:
            break
        state, metrics = step(state, b)
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if val_every and (i + 1) % val_every == 0:
            knn = probe()
            logger.log(i + 1, {"knn_top1": knn})
            print(f"step {i + 1}: kNN top-1 {knn:.4f}")
    if hasattr(it, "close"):
        it.close()
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    knn = probe()
    print(f"final kNN top-1: {knn:.4f}")
    enc = ssl_lib.export_encoder_npz(state.params,
                                     os.path.join(out, "encoder.npz"))
    print(f"encoder exported: {enc}")


def run_semisup(cfg, args, out, mesh=None):
    """FixMatch loop (eighth task family): fused
    labeled+weak+strong step, periodic EMA-accuracy validation with
    best-checkpoint retention — the run_ssl driver shape."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, data_iter_fn, val_set, eval_fn = recipes.build_semisup(
        cfg, synthetic=args.synthetic, mesh=mesh)
    if args.resume and ckpt_lib_latest(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed semisup from step {int(state.step)}")
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name="semisup_fixmatch")
    log_every = cfg.get("log_every", 100)
    val_every = cfg.get("val_every", 0)
    eval_batch = cfg.get("eval_batch", cfg["batch_size"])
    best = -1.0
    total = cfg["total_steps"]
    start = int(state.step)
    it = data_iter_fn()
    for i, batch in enumerate(it):
        if start + i >= total:
            break
        if guard.preempted:
            logger.log(start + i, {"preempted": 1.0})
            break
        state, metrics = step(state, batch)
        i = start + i
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if val_every and (i + 1) % val_every == 0:
            acc = eval_fn(state, val_set.eval_iter(eval_batch))
            logger.log(i + 1, {"val_acc": acc})
            print(f"[step {i + 1}] val_acc={acc:.4f}")
            if acc > best:
                best = acc
                ckpt_lib.save_checkpoint(out, i + 1, state._asdict(),
                                         keep=2, metric=acc, is_best=True)
    it.close()  # releases the two prefetch workers (try/finally inside)
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    acc = eval_fn(state, val_set.eval_iter(eval_batch))
    print(f"semisup done at step {int(state.step)}; "
          f"final EMA val_acc={acc:.4f} (best {max(best, acc):.4f})")


def run_distill(cfg, args, out, mesh=None):
    """Knowledge-distillation loop: the fused teacher+student step
    (train/distill.py) under the run_semisup driver shape — periodic
    student validation with best-checkpoint retention.  The teacher
    rides inside the checkpoint state, so crash-resume restores the
    exact same supervision."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, data_iter_fn, val_set, eval_fn = recipes.build_distill(
        cfg, synthetic=args.synthetic, mesh=mesh)
    if args.resume and ckpt_lib_latest(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed distill from step {int(state.student.step)}")
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name="distill")
    log_every = cfg.get("log_every", 100)
    val_every = cfg.get("val_every", 0)
    eval_batch = cfg.get("eval_batch", cfg["batch_size"])
    best = -1.0
    total = cfg["total_steps"]
    start = int(state.student.step)
    it = data_iter_fn()
    for i, batch in enumerate(it):
        if start + i >= total:
            break
        if guard.preempted:
            logger.log(start + i, {"preempted": 1.0})
            break
        state, metrics = step(state, batch)
        i = start + i
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if val_every and (i + 1) % val_every == 0:
            acc = eval_fn(state, val_set.eval_iter(eval_batch))
            logger.log(i + 1, {"val_acc": acc})
            print(f"[step {i + 1}] val_acc={acc:.4f}")
            if acc > best:
                best = acc
                ckpt_lib.save_checkpoint(out, i + 1, state._asdict(),
                                         keep=2, metric=acc, is_best=True)
    it.close()
    ckpt_lib.save_checkpoint(out, int(state.student.step),
                             state._asdict(), keep=2)
    acc = eval_fn(state, val_set.eval_iter(eval_batch))
    print(f"distill done at step {int(state.student.step)}; "
          f"student val_acc={acc:.4f} (best {max(best, acc):.4f})")


def run_diffusion(cfg, args, out, mesh=None):
    """Diffusion training loop (seventh task family): the fused DDPM
    noise-prediction step + EMA, same driver shape as run_gan, with
    periodic DDIM sample grids from the EMA weights."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, data_iter_fn, kind = recipes.build_diffusion(
        cfg, synthetic=args.synthetic, mesh=mesh)
    if args.resume and ckpt_lib_latest(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed diffusion from step {int(state.step)}")
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name=f"diffusion_{kind}")
    log_every = cfg.get("log_every", 100)
    sample_every = cfg.get("sample_every", 0)
    sampler = (recipes.make_diffusion_sampler(cfg)
               if sample_every else None)
    total = cfg["total_steps"]
    start = int(state.step)
    it = data_iter_fn()
    for i, batch in enumerate(it):
        if start + i >= total:
            break
        if guard.preempted:
            logger.log(start + i, {"preempted": 1.0})
            break
        state, metrics = step(state, batch)
        i = start + i
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if sampler is not None and (i + 1) % sample_every == 0:
            from myconvnet_tpu.utils.images import make_grid
            logger.log_image(i + 1, "samples",
                             make_grid(sampler(state, 16, seed=0)))
    it.close()  # releases the prefetch worker (try/finally inside)
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    print(f"diffusion training done at step {int(state.step)}")


def run_style(cfg, args, out):
    """Fast style transfer loop (twelfth task family): the fused
    perceptual-loss step (train/style.py), same driver shape as
    run_diffusion, with periodic content|stylized grid artifacts."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    state, step, data_iter_fn, kind = recipes.build_style(
        cfg, synthetic=args.synthetic)
    if args.resume and ckpt_lib_latest(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed style from step {int(state.step)}")
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name=f"style_{kind}")
    log_every = cfg.get("log_every", 100)
    sample_every = cfg.get("sample_every", 0)
    total = cfg["total_steps"]
    start = int(state.step)
    it = data_iter_fn()
    vis_batch = None
    # built once: params ride as arguments, so sampling mid-training
    # never retraces (run_diffusion's sampler discipline)
    stylize = recipes.make_stylizer_fn(cfg) if sample_every else None
    for i, batch in enumerate(it):
        if start + i >= total:
            break
        if guard.preempted:
            logger.log(start + i, {"preempted": 1.0})
            break
        if vis_batch is None:
            vis_batch = batch[:8]
        state, metrics = step(state, batch)
        i = start + i
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if sample_every and (i + 1) % sample_every == 0:
            import numpy as np

            from myconvnet_tpu.utils.images import make_grid
            styled = stylize(state.params, state.model_state, vis_batch)
            pair = np.concatenate([np.asarray(vis_batch),
                                   np.asarray(styled)])
            pair_u8 = (np.clip(pair, 0.0, 1.0) * 255).astype(np.uint8)
            logger.log_image(i + 1, "stylized", make_grid(pair_u8))
    it.close()
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    print(f"style training done at step {int(state.step)}")


def run_gan(cfg, args, out):
    import jax

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger

    state, step, data_iter_fn, kind = recipes.build_gan(
        cfg, synthetic=args.synthetic)
    if getattr(args, "summary", False):
        import numpy as np
        for tag, tree in (("generator", state.g_params),
                          ("discriminator", state.d_params)):
            n = sum(int(np.prod(p.shape))
                    for b in jax.tree.leaves(tree) if hasattr(b, "shape")
                    for p in [b])
            print(f"{tag:<14} params: {n:,}")
    if args.resume and ckpt_lib_latest(out):
        restored = __import__(
            "myconvnet_tpu.ckpt.checkpoint",
            fromlist=["restore_checkpoint"]).restore_checkpoint(
                out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed GAN from step {int(state.step)}")
    from myconvnet_tpu.utils.preemption import PreemptionGuard
    guard = PreemptionGuard().__enter__()
    logger = MetricLogger(log_dir=out, name=f"gan_{kind}")
    log_every = cfg.get("log_every", 100)
    # periodic sample-grid artifacts under <out>/images (0 disables)
    sample_every = cfg.get("sample_every", 0)
    sampler = recipes.make_gan_sampler(cfg) if sample_every else None
    vis_batch = None  # pix2pix: fixed inputs so grids are comparable
    total = cfg["total_steps"]
    it = data_iter_fn()
    start = int(state.step)
    for i, batch in enumerate(it):
        if start + i >= total:
            break
        if guard.preempted:
            logger.log(start + i, {"preempted": 1.0})
            break
        if sampler is not None and kind != "dcgan" and vis_batch is None:
            vis_batch = batch[0][:16]
        state, metrics = step(state, batch)
        i = start + i
        if (i + 1) % log_every == 0:
            logger.log(i + 1, {k: float(v) for k, v in metrics.items()})
            ckpt_lib.save_checkpoint(out, i + 1, state._asdict(), keep=2)
        if sampler is not None and (i + 1) % sample_every == 0:
            from myconvnet_tpu.utils.images import make_grid
            imgs = (sampler(state, 16, seed=0) if kind == "dcgan"
                    else sampler(state, vis_batch))
            logger.log_image(i + 1, "samples", make_grid(imgs))
    ckpt_lib.save_checkpoint(out, int(state.step), state._asdict(), keep=2)
    print(f"gan training done at step {int(state.step)}")


if __name__ == "__main__":
    main()
