#!/usr/bin/env python
"""Training entry point (reference: train.py at repo root — SURVEY.md
§2#9).

    python train.py --config configs/cifar10_smallnet.py [--synthetic]
        [--steps N] [--batch N] [--data_dir D] [--out runs/name]

Wires config -> DataSet -> model -> Evaluator -> trainer and runs the
jitted step loop with periodic validation and best-checkpoint retention.
ConvNet-API families ride the shared Trainer (run_supervised); fused
state+step families (GAN, detection, SSL, diffusion, ...) ride ONE
generic step loop (run_steploop) parameterized by a small per-task
adapter — the family registry decides which (recipes/registry.py).
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

    kind = recipes.TASKS.get(cfg["task"])
    if kind is None:
        raise SystemExit(f"unknown task {cfg['task']!r}; valid: "
                         f"{sorted(recipes.TASKS)}")
    if kind != "convnet":
        run_steploop(cfg, args, out, mesh, STEPLOOP_ADAPTERS[kind])
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
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    builder = recipes.convnet_builder(cfg["task"])
    net, train_set, val_set = builder(cfg, synthetic=args.synthetic,
                                      ckpt_dir=out, log_dir=out, mesh=mesh)
    with PreemptionGuard() as guard:
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
        train_kw = dict(batch_size=cfg["batch_size"],
                        total_steps=cfg["total_steps"],
                        optimizer=optimizer, evaluator=evaluator,
                        val_every=cfg.get("val_every", 0),
                        early_stop_patience=cfg.get("early_stop_patience",
                                                    0),
                        plateau_factor=cfg.get("plateau_factor", 0.0),
                        plateau_patience=cfg.get("plateau_patience", 0))
        if getattr(args, "trace", False):
            from myconvnet_tpu.utils.profiling import trace
            with trace(os.path.join(out, "trace")):
                net.train(train_set, val_set, **train_kw)
            print(f"trace: {os.path.join(out, 'trace')}")
        else:
            net.train(train_set, val_set, **train_kw)
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


def run_steploop(cfg, args, out, mesh, adapter):
    """ONE driver for every fused state+step family.

    ``adapter(cfg, args, out, mesh)`` normalizes a family to a spec
    dict; the loop below owns resume, preemption, logging, periodic
    checkpoints, validation with best-retention, sample artifacts and
    the final checkpoint — logic the seven per-task loops this replaces
    each restated (VERDICT r2 weak #3).

    Spec keys: name, state, step, make_iter; optional get_step,
    validate (state -> (metric_name, score)), is_better
    (score, best -> bool), sample (state, i, logger, first_batch),
    sample_every, finalize (state), val_every.
    """
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.utils.logging import MetricLogger
    from myconvnet_tpu.utils.preemption import PreemptionGuard

    spec = adapter(cfg, args, out, mesh)
    state, step = spec["state"], spec["step"]
    get_step = spec.get("get_step", lambda s: int(s.step))
    if args.resume and ckpt_lib.latest_checkpoint(out):
        restored = ckpt_lib.restore_checkpoint(out, state._asdict())
        state = type(state)(**restored)
        print(f"resumed {spec['name']} from step {get_step(state)}")
    log_every = cfg.get("log_every", 100)
    val_every = spec.get("val_every", cfg.get("val_every", 0))
    sample_every = spec.get("sample_every", 0)
    validate = spec.get("validate")
    is_better = spec.get("is_better",
                         lambda score, best: best is None or score > best)
    sample = spec.get("sample")
    total = cfg["total_steps"]
    best = None
    first_batch = None
    logger = MetricLogger(log_dir=out, name=spec["name"])
    # periodic saves ride a background writer (device->host snapshot
    # synchronous, npz+rename off-thread) — the Trainer's
    # async_checkpoints discipline for the step-loop families
    ckpts = ckpt_lib.AsyncCheckpointer()
    with PreemptionGuard() as guard:
        start = get_step(state)
        it = spec["make_iter"]()
        try:
            for i, batch in enumerate(it):
                i = start + i
                if i >= total:
                    break
                if guard.preempted:
                    logger.log(i, {"preempted": 1.0})
                    break
                if sample is not None and first_batch is None:
                    # retain only the slice the sample hooks visualize
                    # (<=16 rows; a full pix2pix-scale device batch
                    # would otherwise stay pinned all run — ADVICE r3)
                    import jax as _jax
                    first_batch = _jax.tree.map(lambda a: a[:16], batch)
                state, metrics = step(state, batch)
                if (i + 1) % log_every == 0:
                    logger.log(i + 1,
                               {k: float(v) for k, v in metrics.items()})
                    ckpts.save(out, i + 1, state._asdict(), keep=2)
                if validate is not None and val_every \
                        and (i + 1) % val_every == 0:
                    name, score = validate(state)
                    shown = spec.get("display", {}).get(name, name)
                    logger.log(i + 1, {name: score})
                    print(f"step {i + 1}: {shown} {score:.4f}")
                    if is_better(score, best):
                        best = score
                        ckpts.save(out, i + 1, state._asdict(), keep=2,
                                   metric=score, is_best=True)
                if sample is not None and sample_every \
                        and (i + 1) % sample_every == 0:
                    sample(state, i + 1, logger, first_batch)
        finally:
            # a crashing step must not abandon the in-flight write:
            # the synchronous saves this replaced guaranteed the last
            # periodic checkpoint was on disk before any later crash.
            # Join here; surface a write failure only when the loop
            # itself did not raise (never mask the step's exception).
            import sys
            loop_raised = sys.exc_info()[1] is not None
            try:
                ckpts.wait()
            except Exception:
                if not loop_raised:
                    raise
                # the step's exception wins, but the operator must
                # still learn the last periodic checkpoint is missing
                # or partial (ADVICE r3)
                import traceback
                print("WARNING: background checkpoint write also "
                      "failed while the step was raising:",
                      file=sys.stderr)
                traceback.print_exc()
            if hasattr(it, "close"):
                it.close()
        ckpt_lib.save_checkpoint(out, get_step(state), state._asdict(),
                                 keep=2)
        if validate is not None:
            name, score = validate(state)
            shown = spec.get("display", {}).get(name, name)
            # "best" honors the spec's is_better (not max): lower-is-
            # better evaluators report their true best
            top = (best if best is not None
                   and not is_better(score, best) else score)
            extra = f" (best {top:.4f})" if best is not None else ""
            print(f"final {shown}: {score:.4f}{extra}")
        if spec.get("finalize") is not None:
            spec["finalize"](state)
    print(f"{spec['name']} training done at step {get_step(state)}")


# --- per-task adapters -------------------------------------------------

def _mesh_put(mesh):
    if mesh is None:
        return None
    from myconvnet_tpu.parallel import shard_batch
    return lambda b: shard_batch(mesh, b)


def adapt_detection(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, predict, train_set, val_set = recipes.build_detector(
        cfg, synthetic=args.synthetic, mesh=mesh)
    evaluator = recipes.build_evaluator(cfg)
    batch = cfg["batch_size"]

    def validate(s):
        return "val_mAP", recipes.evaluate_detection(
            s, predict, val_set, batch, evaluator, mesh=mesh)

    return dict(name="detection", state=state, step=step,
                make_iter=lambda: train_set.train_iter(
                    batch, device_put_fn=_mesh_put(mesh)),
                validate=validate, display={"val_mAP": "val mAP"},
                is_better=lambda s, b: b is None or evaluator.is_better(
                    s, b))


def adapt_ssl(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    from myconvnet_tpu.train import ssl as ssl_lib
    state, step, train_set, val_set, feats_fn, kind = recipes.build_ssl(
        cfg, synthetic=args.synthetic, mesh=mesh)
    batch = cfg["batch_size"]
    knn_kw = dict(k=cfg.get("knn_k", 20),
                  num_classes=cfg["num_classes"],
                  max_bank=cfg.get("knn_bank", 4096),
                  max_query=cfg.get("knn_query", 2048))

    def validate(s):
        return "knn_top1", ssl_lib.knn_eval(
            feats_fn, s, train_set.eval_iter(batch),
            val_set.eval_iter(batch), **knn_kw)

    def finalize(s):
        enc = ssl_lib.export_encoder_npz(
            s.params, os.path.join(out, "encoder.npz"))
        print(f"encoder exported: {enc}")

    return dict(name=f"ssl_{kind}", state=state, step=step,
                make_iter=lambda: train_set.train_iter(
                    batch, device_put_fn=_mesh_put(mesh)),
                validate=validate, display={"knn_top1": "kNN top-1"},
                finalize=finalize)


def adapt_semisup(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, data_iter_fn, val_set, eval_fn = recipes.build_semisup(
        cfg, synthetic=args.synthetic, mesh=mesh)
    eval_batch = cfg.get("eval_batch", cfg["batch_size"])
    return dict(name="semisup_fixmatch", state=state, step=step,
                make_iter=data_iter_fn,
                validate=lambda s: ("val_acc", eval_fn(
                    s, val_set.eval_iter(eval_batch))))


def adapt_distill(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, data_iter_fn, val_set, eval_fn = recipes.build_distill(
        cfg, synthetic=args.synthetic, mesh=mesh)
    eval_batch = cfg.get("eval_batch", cfg["batch_size"])
    return dict(name="distill", state=state, step=step,
                make_iter=data_iter_fn,
                get_step=lambda s: int(s.student.step),
                validate=lambda s: ("val_acc", eval_fn(
                    s, val_set.eval_iter(eval_batch))))


def adapt_diffusion(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, data_iter_fn, kind = recipes.build_diffusion(
        cfg, synthetic=args.synthetic, mesh=mesh)
    sample_every = cfg.get("sample_every", 0)
    sampler = (recipes.make_diffusion_sampler(cfg)
               if sample_every else None)

    def sample(s, i, logger, _first):
        from myconvnet_tpu.utils.images import make_grid
        logger.log_image(i, "samples", make_grid(sampler(s, 16, seed=0)))

    return dict(name=f"diffusion_{kind}", state=state, step=step,
                make_iter=data_iter_fn, sample_every=sample_every,
                sample=sample if sampler else None)


def adapt_style(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, data_iter_fn, kind = recipes.build_style(
        cfg, synthetic=args.synthetic)
    sample_every = cfg.get("sample_every", 0)
    # built once: params ride as arguments, so sampling mid-training
    # never retraces
    stylize = recipes.make_stylizer_fn(cfg) if sample_every else None

    def sample(s, i, logger, first_batch):
        import numpy as np

        from myconvnet_tpu.utils.images import make_grid
        vis = first_batch[:8]
        styled = stylize(s.params, s.model_state, vis)
        pair = np.concatenate([np.asarray(vis), np.asarray(styled)])
        pair_u8 = (np.clip(pair, 0.0, 1.0) * 255).astype(np.uint8)
        logger.log_image(i, "stylized", make_grid(pair_u8))

    return dict(name=f"style_{kind}", state=state, step=step,
                make_iter=data_iter_fn, sample_every=sample_every,
                sample=sample if stylize else None)


def adapt_gan(cfg, args, out, mesh):
    from myconvnet_tpu import recipes
    state, step, data_iter_fn, kind = recipes.build_gan(
        cfg, synthetic=args.synthetic)
    if getattr(args, "summary", False):
        import jax
        import numpy as np
        for tag, tree in (("generator", state.g_params),
                          ("discriminator", state.d_params)):
            n = sum(int(np.prod(p.shape))
                    for p in jax.tree.leaves(tree) if hasattr(p, "shape"))
            print(f"{tag:<14} params: {n:,}")
    sample_every = cfg.get("sample_every", 0)
    sampler = recipes.make_gan_sampler(cfg) if sample_every else None

    def sample(s, i, logger, first_batch):
        from myconvnet_tpu.utils.images import make_grid
        imgs = (sampler(s, 16, seed=0) if kind == "dcgan"
                else sampler(s, first_batch[0][:16]))
        logger.log_image(i, "samples", make_grid(imgs))

    return dict(name=f"gan_{kind}", state=state, step=step,
                make_iter=data_iter_fn, sample_every=sample_every,
                sample=sample if sampler else None)


STEPLOOP_ADAPTERS = {
    "detection": adapt_detection,
    "ssl": adapt_ssl,
    "semisup": adapt_semisup,
    "distill": adapt_distill,
    "diffusion": adapt_diffusion,
    "style": adapt_style,
    "gan": adapt_gan,
}


if __name__ == "__main__":
    main()
