"""Pipeline-parallel training driver: real models through the
heterogeneous GPipe (parallel/pipeline.py), recipe-driven.

The reference has no pipeline parallelism (SURVEY.md §2 absences); this
is a rebuild extension.  A recipe opts in with::

    config = dict(..., model="vgg16",
                  pipeline=dict(stages=2, microbatches=4))

and train.py routes here: the model is split into contiguous stages
(models/staged.py), stage params flatten into one [S, maxP] array
sharded over a ``model``-axis mesh, and each optimizer step runs the
whole fwd+bwd pipeline + elementwise update as ONE XLA program.  The
step includes the same on-device augmentation chain as the standard
trainer.  Checkpoints store the stacked flat params + optimizer state +
step and resume exactly.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from myconvnet_tpu.data.augment import augment_eval, augment_train
from myconvnet_tpu.data.pipeline import DataSet


def _stages_for(cfg):
    from myconvnet_tpu.models.staged import vgg_stages
    name = cfg["model"]
    n = int(cfg["pipeline"]["stages"])
    if name.startswith("vgg"):
        depth = int(name[3:])
        return vgg_stages(cfg["num_classes"], depth, n)
    raise ValueError(
        f"no pipeline stage split registered for model {name!r} "
        "(models/staged.py; vgg11/vgg16/vgg19 supported)")


def run_pipelined(cfg, args, out, *, synthetic: bool) -> float:
    """Train a staged model pipelined; returns final val accuracy."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.models.staged import init_stage_params
    from myconvnet_tpu.parallel.pipeline import (
        make_pipelined_train_step, pipeline_hetero, stack_stage_params)
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.utils.logging import MetricLogger

    pp = cfg["pipeline"]
    n_stages = int(pp["stages"])
    microbatches = int(pp.get("microbatches", 4))
    # fail fast on optimizers that are not elementwise: the pipelined
    # update runs on the stacked [S, maxP] flat buffer, which would
    # silently couple unrelated parameters (and padding lanes) under
    # shampoo/LARS-style per-matrix/per-layer methods
    opt_name = cfg["optimizer"]["name"].lower()
    elementwise = {"sgd", "momentum", "adam", "adamw", "rmsprop",
                   "adagrad"}
    if opt_name not in elementwise:
        raise SystemExit(
            f"pipeline training needs an elementwise optimizer (got "
            f"{opt_name!r}); valid: {sorted(elementwise)} — per-matrix "
            "preconditioners would mix stages on the stacked buffer")
    path_opts = [k for k in ("freeze", "wd_exclude_norms",
                             "weight_decay_exclude")
                 if cfg["optimizer"].get(k)]
    if path_opts:
        raise SystemExit(
            f"optimizer options {sorted(path_opts)} select parameters "
            "by scope path, which the stacked [S, maxP] pipeline buffer "
            "does not carry — they would silently no-op/misapply; "
            "remove them from the pipeline recipe")
    devices = jax.devices()
    # pipeline=dict(..., data_parallel=D): 2-D pipeline x data mesh —
    # the batch shards over D replicas of the S-stage pipeline
    n_data = int(pp.get("data_parallel", 1))
    if len(devices) < n_stages * n_data:
        raise SystemExit(
            f"pipeline needs {n_stages * n_data} devices "
            f"({n_stages} stages x {n_data} data), have {len(devices)} "
            "(test with XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    if n_data > 1:
        mesh = Mesh(np.array(devices[:n_stages * n_data]).reshape(
            n_data, n_stages), ("data", "model"))
        data_axis = "data"
    else:
        mesh = Mesh(np.array(devices[:n_stages]), ("model",))
        data_axis = None

    from myconvnet_tpu.data.augment import AugmentConfig
    stage_aps, stage_inits = _stages_for(cfg)
    acfg = (recipes.make_augment(cfg.get("augment"))
            or AugmentConfig(out_hw=tuple(cfg["input_hw"])))
    batch = cfg["batch_size"]
    hw = tuple(cfg["input_hw"])
    mb = batch // microbatches
    assert batch % microbatches == 0, (batch, microbatches)

    sample = jnp.zeros((mb, *hw, 3), jnp.float32)
    params = init_stage_params(stage_aps, stage_inits,
                               jax.random.key(cfg.get("seed", 0)), sample)
    flat, metas = stack_stage_params(params)
    opt = recipes.make_optimizer(cfg["optimizer"])
    opt_state = opt.init(flat)
    step_i = 0

    # exact resume from the stacked-flat checkpoint
    ckpt_path = os.path.join(out, "pipeline_ckpt.npz")
    if getattr(args, "resume", False) and os.path.exists(ckpt_path):
        with np.load(ckpt_path) as d:
            if "opt_leaves" in getattr(d, "files", ()):
                raise SystemExit(
                    f"{ckpt_path} uses the pre-release 'opt_leaves' "
                    "layout (unreadable object array); re-run without "
                    "--resume to restart cleanly")
            flat = jnp.asarray(d["flat"])
            n_leaves = len(jax.tree.leaves(opt_state))
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state),
                [jnp.asarray(d[f"opt_{i}"]) for i in range(n_leaves)])
            step_i = int(d["step"])
        print(f"resumed pipelined run at step {step_i}")

    loss_fn = lambda lg, y: softmax_cross_entropy(  # noqa: E731
        lg, y, label_smoothing=cfg.get("label_smoothing", 0.0))

    if data_axis is not None and (batch // microbatches) % n_data:
        raise SystemExit(
            f"microbatch size {batch // microbatches} must divide by "
            f"data_parallel={n_data}")
    jit_step = make_pipelined_train_step(
        mesh, stage_aps, metas, loss_fn, opt,
        microbatches=microbatches, data_axis=data_axis,
        preprocess=lambda k, raw: augment_train(k, raw, acfg)
        .astype(jnp.float32),
        seed=cfg.get("seed", 0) + 1)

    from jax.sharding import NamedSharding, PartitionSpec as P
    pspec = NamedSharding(mesh, P("model"))

    def eval_logits(flat_p, raw):
        x = augment_eval(raw, acfg).astype(jnp.float32)
        return pipeline_hetero(mesh, stage_aps, flat_p, metas, x,
                               microbatches=microbatches,
                               data_axis=data_axis)

    jit_eval = jax.jit(eval_logits, in_shardings=(pspec, None))

    train_src, val_src = recipes.make_sources(cfg, synthetic)
    train_set = DataSet(train_src, acfg)
    val_set = DataSet(val_src, acfg)
    logger = MetricLogger(log_dir=out)
    flat = jax.device_put(flat, pspec)

    def save_ckpt():
        # atomic write (tmp + rename) of the stacked-flat layout
        tmp = ckpt_path + ".tmp.npz"   # np.savez appends .npz otherwise
        np.savez(tmp, flat=np.asarray(flat), step=step_i,
                 **{f"opt_{i}": np.asarray(x) for i, x in
                    enumerate(jax.tree.leaves(opt_state))})
        os.replace(tmp, ckpt_path)

    total = int(cfg["total_steps"])
    ckpt_every = int(cfg.get("ckpt_every", 200))
    it = train_set.train_iter(batch)
    t0 = time.time()
    last_logged = step_i
    loss = jnp.zeros(())
    while step_i < total:
        raw, labels = next(it)
        flat, opt_state, loss = jit_step(flat, opt_state, raw, labels,
                                         jnp.asarray(step_i, jnp.int32))
        step_i += 1
        if step_i % max(cfg.get("log_every", 50), 1) == 0 \
                or step_i == total:
            dt = time.time() - t0
            window = step_i - last_logged
            logger.log(step_i, {
                "loss": float(loss),
                "images_per_sec": batch * window / max(dt, 1e-9),
                "pipeline_stages": n_stages,
                "microbatches": microbatches})
            t0 = time.time()
            last_logged = step_i
        if ckpt_every > 0 and step_i % ckpt_every == 0 \
                and step_i < total:
            # periodic checkpoint so --resume recovers interrupted runs
            save_ckpt()

    save_ckpt()
    print(f"checkpoint: {ckpt_path}")

    # validation accuracy through the pipelined forward
    correct = n = 0
    for raw, labels in val_set.eval_iter(batch, drop_remainder=True,
                                         prefetch=0):
        lg = np.asarray(jit_eval(flat, raw))
        correct += int((lg.argmax(-1) == np.asarray(labels)).sum())
        n += len(labels)
    acc = correct / max(n, 1)
    print(f"final val accuracy (pipelined, {n_stages} stages): {acc:.4f}")
    return acc
