#!/usr/bin/env python
"""Library tour: every public surface in one runnable script (CPU-OK).

    python examples/library_tour.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("KEEP_PLATFORM"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import models, serving
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.quantize import int8_scope
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.data.pipeline import ArraySource, DataSet
from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.models.folding import verify_folding
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.train import optim


def main():
    out = tempfile.mkdtemp()
    aug = AugmentConfig(out_hw=(32, 32), area_range=None, pad=2, flip=True,
                        mean=cifar10.MEAN, std=cifar10.STD)
    train_set = DataSet(ArraySource(*cifar10.synthetic_subset(256, 0)),
                        augment=aug)
    val_set = DataSet(ArraySource(*cifar10.synthetic_subset(128, 1)),
                      augment=aug)

    # 1. the reference-compatible ConvNet API
    net = ConvNet(lambda x, n, train=False: models.smallnet(
        x, n, train=train, width=16, dropout_rate=0.0),
        input_shape=(32, 32, 3), num_classes=10, augment=aug,
        ckpt_dir=out, seed=0)
    net.logger.stdout = False
    net.train(train_set, val_set, batch_size=64, total_steps=300,
              optimizer=optim.momentum(optim.cosine_decay(0.05, 300), 0.9,
                                       weight_decay=1e-4),
              val_every=100)
    acc = net.evaluate(val_set, AccuracyEvaluator(), batch_size=64)
    print(f"[train] val accuracy after 300 steps: {acc:.3f}")

    # 2. checkpoint roundtrip
    net.save()
    net2 = ConvNet(lambda x, n, train=False: models.smallnet(
        x, n, train=train, width=16, dropout_rate=0.0),
        input_shape=(32, 32, 3), num_classes=10, augment=aug, ckpt_dir=out)
    net2.build(optim.momentum(0.05, 0.9))
    net2.restore()
    print(f"[ckpt] restored step {int(net2.state.step)}")

    # 3. BN folding + serving export
    model = net2._transformed
    err = verify_folding(model, net2.state.params, net2.state.model_state,
                         jnp.zeros((2, 32, 32, 3)), atol=1e-3, eps=1e-3)
    path = os.path.join(out, "frozen.stablehlo")
    size = serving.export_inference(model, net2.state.params,
                                    net2.state.model_state,
                                    jnp.zeros((2, 32, 32, 3)), path,
                                    bn_eps=1e-3)
    fn = serving.load_inference(path)
    print(f"[serve] folded (err {err:.1e}), exported {size} bytes, "
          f"reloaded -> {fn(jnp.zeros((2, 32, 32, 3))).shape}")

    # 4. int8 quantized inference
    x = jnp.asarray(val_set.source.images[:16].astype(np.float32) / 255.0)
    with int8_scope():
        y_q, _ = model.apply(net2.state.params, net2.state.model_state,
                             None, x, False)
    print(f"[int8] quantized logits: {y_q.shape}")

    # 5. batch-mixing regularizers + TTA prediction
    from myconvnet_tpu.data.mix import MixConfig
    net3 = ConvNet(lambda x, n, train=False: models.smallnet(
        x, n, train=train, width=8, dropout_rate=0.0),
        input_shape=(32, 32, 3), num_classes=10, augment=aug,
        mix=MixConfig(mixup_alpha=0.2, cutmix_alpha=1.0), erase_prob=0.25,
        seed=1)
    net3.logger.stdout = False
    net3.train(train_set, batch_size=64, total_steps=20,
               optimizer=optim.lars(0.1, eta=0.01))
    logp = net3.predict(val_set.source.images[:8], batch_size=8,
                        tta="ten_crop")
    print(f"[mix+tta] mixup/cutmix/erase trained 20 steps (LARS), "
          f"10-crop log-probs {logp.shape}")

    # 6. spatial + pipeline parallelism on the virtual mesh
    if len(jax.devices()) >= 8:
        import functools
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P
        from myconvnet_tpu.parallel import halo_conv2d, make_mesh
        from myconvnet_tpu.parallel.pipeline import run_pipeline
        mesh8 = make_mesh(4, 2)
        xs = jnp.asarray(np.random.RandomState(0)
                         .randn(2, 16, 8, 3).astype(np.float32))
        w = jnp.asarray(np.random.RandomState(1)
                        .randn(3, 3, 3, 4).astype(np.float32))
        f = shard_map(functools.partial(halo_conv2d, axis_name="data"),
                      mesh=mesh8, in_specs=(P(None, "data"), P()),
                      out_specs=P(None, "data"))
        y_sp = jax.jit(f)(xs, w)
        ws = jnp.asarray(np.random.RandomState(2)
                         .randn(2, 8, 8).astype(np.float32) * 0.3)
        bs = jnp.zeros((2, 8))
        y_pp = run_pipeline(mesh8, lambda p, x: jax.nn.relu(
            x @ p[0] + p[1]), (ws, bs),
            jnp.ones((4, 8)), microbatches=2)
        print(f"[parallel] halo conv {y_sp.shape} on dp-sharded H, "
              f"2-stage pipeline {y_pp.shape}")

    # 7. model inspection: Grad-CAM + features + saliency
    from myconvnet_tpu.utils.saliency import grad_cam, input_gradient
    x8 = jnp.asarray(val_set.source.images[:4].astype(np.float32) / 255.0)
    cam = grad_cam(net2._transformed, net2.state.params,
                   net2.state.model_state, x8)
    feats = net2.features(val_set.source.images[:4], batch_size=4)
    print(f"[inspect] grad-cam {cam.shape}, features {feats.shape}")
    del input_gradient

    # 8. knowledge distillation (teacher: the trained net2)
    from myconvnet_tpu.train.distill import DistillState, \
        make_distill_step
    from myconvnet_tpu.train.trainer import init_train_state
    student = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    s_opt = optim.momentum(0.1, 0.9)
    s_state = init_train_state(student, s_opt, jax.random.key(5),
                               jnp.zeros((16, 32, 32, 3)))
    dstate = DistillState(s_state, net2.state.params,
                          net2.state.model_state)
    dstep = make_distill_step(student, net2._transformed, s_opt,
                              temperature=4.0, alpha=0.9)
    xb = jnp.asarray(
        train_set.source.images[:16].astype(np.float32) / 255.0)
    yb = jnp.asarray(train_set.source.labels[:16])
    for _ in range(5):
        dstate, dm = dstep(dstate, (xb, yb))
    print(f"[distill] 5 fused KD steps: loss={float(dm['loss']):.3f} "
          f"agreement={float(dm['teacher_agreement']):.2f}")

    # 9. fused GAN step
    from myconvnet_tpu.train import gan
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=32, base_features=64))
    disc = transform(lambda i, train: models.dcgan_discriminator(
        i, train=train, base_features=32))
    go, do = optim.adam(2e-4, b1=0.5), optim.adam(2e-4, b1=0.5)
    gstate = gan.init_gan_state(gen, disc, go, do, jax.random.key(0),
                                jnp.zeros((8, 64)),
                                (jnp.zeros((8, 32, 32, 3)),))
    step = gan.make_dcgan_step(gen, disc, go, do, latent_dim=64)
    real = jnp.asarray(
        train_set.source.images[:8].astype(np.float32) / 127.5 - 1.0)
    for _ in range(3):
        gstate, m = step(gstate, real)
    print(f"[gan] fused dual-opt step x3: d_loss={float(m['d_loss']):.3f} "
          f"g_loss={float(m['g_loss']):.3f}")

    # 10. today's extras: RandAugment, confusion report, plateau LR,
    # checkpoint averaging, sample grids
    from myconvnet_tpu.data.randaugment import rand_augment
    xs = jnp.asarray(train_set.source.images[:8].astype(np.float32) / 255.)
    ra = rand_augment(jax.random.key(0), xs, num_layers=2, magnitude=9.0)
    print(f"[randaugment] 2 layers @ M=9 on 8 images -> "
          f"range [{float(ra.min()):.2f}, {float(ra.max()):.2f}]")

    from myconvnet_tpu.eval.evaluators import ConfusionMatrixEvaluator
    ev = ConfusionMatrixEvaluator(10)
    logits = net2.predict(train_set.source.images[:64])
    ev.update(jnp.asarray(logits), train_set.source.labels[:64])
    print("[confusion] macro F1 on 64 train images: "
          f"{ev.macro_f1():.3f}")

    plat = optim.with_plateau(optim.momentum(0.05, 0.9))
    ps = plat.init(net2.state.params)
    ps = optim.set_plateau_scale(ps, 0.1)
    print(f"[plateau] lr scale now {optim.plateau_scale(ps):.2f} "
          "(host-adjusted, no recompile)")

    from myconvnet_tpu.ckpt.checkpoint import average_checkpoints
    avg = average_checkpoints(out, net2.state._asdict(), n_last=2)
    print(f"[ckpt-avg] averaged params over last 2 snapshots "
          f"(step {int(avg['step'])})")

    from myconvnet_tpu.utils.images import make_grid, to_uint8
    fake = gen.apply(gstate.g_params, gstate.g_state, None,
                     jax.random.normal(jax.random.key(1), (9, 64)),
                     False)[0]
    grid = make_grid(to_uint8(np.asarray(fake)))
    print(f"[images] 9-sample grid: {grid.shape}")

    # 11. fine-tuning: freeze everything but the head, few steps
    frozen_opt = optim.with_frozen(optim.momentum(0.05, 0.9),
                                   lambda path, p: "logits" not in path)
    head_before = np.asarray(net2.state.params["logits"]["w"]).copy()
    fstate = net2.state._replace(opt_state=frozen_opt.init(
        net2.state.params))
    x8 = jnp.asarray(train_set.source.images[:8], jnp.float32) / 255.0

    def head_loss(p):
        logits, _ = net2._transformed.apply(p, fstate.model_state, None,
                                            x8, False)
        return jnp.mean(logits ** 2)

    g = jax.grad(head_loss)(fstate.params)
    new_p, _ = frozen_opt.update(g, fstate.opt_state, fstate.params,
                                 jnp.asarray(0))
    moved = float(np.abs(np.asarray(new_p["logits"]["w"])
                         - head_before).sum())
    stem_moved = float(sum(np.abs(np.asarray(new_p[k][n])
                                  - np.asarray(fstate.params[k][n])).sum()
                           for k in fstate.params if k != "logits"
                           for n in fstate.params[k]))
    print(f"[finetune] head moved {moved:.2e}, frozen rest moved "
          f"{stem_moved:.1e}")

    # 12. calibration + serving SLOs
    from myconvnet_tpu.eval.calibration import (
        expected_calibration_error, fit_temperature)
    lg = net2.predict(val_set.source.images[:128])
    temp = fit_temperature(lg, val_set.source.labels[:128])
    print(f"[calibrate] T={temp:.2f} ece "
          f"{expected_calibration_error(lg, val_set.source.labels[:128]):.3f}"
          f" -> {expected_calibration_error(lg, val_set.source.labels[:128], temperature=temp):.3f}")
    from myconvnet_tpu.serving import make_batched_server, measure_latency
    fn3 = serving.make_inference_fn(net2._transformed, net2.state.params,
                                    net2.state.model_state)
    srv = make_batched_server(fn3, batch_sizes=(8, 32))
    lat = measure_latency(srv, (32, 32, 3), request_sizes=(1, 8),
                          iters=5, warmup=1)
    print(f"[serve] p50@1={lat[1]['p50']:.1f}ms "
          f"p50@8={lat[8]['p50']:.1f}ms")
    # 13. round-2 additions: pipelined training, ZeRO state sharding,
    # SAM, Lookahead, canonical RandAugment geometry, torch round-trip
    from myconvnet_tpu.data.randaugment import (CANONICAL_OPS,
                                                rand_augment)
    x01 = jnp.asarray(np.random.RandomState(0)
                      .rand(4, 24, 24, 3).astype(np.float32))
    ra = rand_augment(jax.random.key(0), x01, num_layers=1, magnitude=9,
                      ops=CANONICAL_OPS)
    print(f"[randaugment] canonical 14-op pool (rotate/shear/equalize "
          f"included): out range [{float(ra.min()):.2f}, "
          f"{float(ra.max()):.2f}]")

    la_opt = optim.with_lookahead(optim.momentum(0.05, 0.9))
    sam_net = ConvNet(lambda x, n, train=False: models.smallnet(
        x, n, train=train, width=8, dropout_rate=0.0),
        input_shape=(32, 32, 3), num_classes=10, augment=aug,
        sam_rho=0.05, seed=3)
    sam_net.logger.stdout = False
    sam_net.train(train_set, val_set, batch_size=64, total_steps=30,
                  optimizer=la_opt)
    print("[sam+lookahead] 30 SAM steps under a Lookahead-wrapped "
          "optimizer: ok")

    if len(jax.devices()) >= 2:
        from jax.sharding import Mesh
        from myconvnet_tpu.models.staged import (init_stage_params,
                                                 vgg_stages)
        from myconvnet_tpu.parallel.pipeline import (
            make_pipelined_train_step, stack_stage_params)
        from myconvnet_tpu.train.losses import softmax_cross_entropy
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("model",))
        aps, inits = vgg_stages(10, 16, 2)
        xs = jnp.asarray(np.random.RandomState(1)
                         .rand(8, 16, 16, 3).astype(np.float32))
        ys = jnp.asarray(np.random.RandomState(2).randint(0, 10, 8))
        sp = init_stage_params(aps, inits, jax.random.key(0), xs[:2])
        flat, metas = stack_stage_params(sp)
        popt = optim.momentum(0.05, 0.9)
        pstep = make_pipelined_train_step(mesh, aps, metas,
                                          softmax_cross_entropy, popt,
                                          microbatches=4)
        flat, _, ploss = pstep(flat, popt.init(flat), xs, ys,
                               jnp.asarray(0, jnp.int32))
        print(f"[pipeline] 2-stage VGG-16 GPipe step: loss "
              f"{float(ploss):.3f}")
    else:
        print("[pipeline] skipped (needs >=2 devices; set XLA_FLAGS="
              "--xla_force_host_platform_device_count=2)")

    # --- detection: the fourth task family in six lines -------------
    from myconvnet_tpu import recipes
    det_cfg = dict(task="detection", model="tinydet", dataset="voc",
                   data_dir=None, num_classes=21, max_boxes=8,
                   batch_size=4, total_steps=4,
                   optimizer=dict(name="momentum", momentum_coef=0.9,
                                  lr=dict(kind="constant", lr=0.05)),
                   augment=dict(flip=True, iou_crop=True,
                                expand_prob=0.5), seed=0)
    dstate, dstep, dpredict, dtrain, dval = recipes.build_detector(
        det_cfg, synthetic=True)
    for batch in dtrain.train_iter(4, prefetch=0):
        dstate, dmetrics = dstep(dstate, batch)
        break
    ev = recipes.build_evaluator(det_cfg)
    dmap = recipes.evaluate_detection(dstate, dpredict, dval, 4, ev)
    print(f"[detection] fused SSD step (expand/IoU-crop/flip on-device) "
          f"loss {float(dmetrics['loss']):.2f}, mAP {dmap:.4f}")

    # --- panoptic: the richest family, same six-line shape ----------
    pan_cfg = dict(task="detection", model="tinypan", dataset="voc",
                   data_dir=None, num_classes=21, max_boxes=8,
                   batch_size=4, total_steps=2,
                   optimizer=dict(name="momentum", momentum_coef=0.9,
                                  lr=dict(kind="constant", lr=0.005)),
                   augment=dict(flip=True), seed=0)
    pstate, pstep, ppredict, ptrain, pval = recipes.build_detector(
        pan_cfg, synthetic=True)
    for batch in ptrain.train_iter(4, prefetch=0):
        pstate, pm = pstep(pstate, batch)
        break
    pq = recipes.evaluate_detection(
        pstate, ppredict, pval, 4, recipes.build_evaluator(pan_cfg))
    print(f"[panoptic] RPN+box+mask+semantic in ONE program: loss "
          f"{float(pm['loss']):.2f} (sem {float(pm['sem_loss']):.2f}), "
          f"PQ {pq:.4f}")

    # --- diffusion: train 3 fused DDPM steps, sample via one scan ---
    ddpm_cfg = dict(task="diffusion", model="tinyddpm",
                    dataset="cifar10", data_dir=None, image_size=8,
                    diffusion_steps=10, sample_steps=4, batch_size=4,
                    total_steps=3,
                    optimizer=dict(name="adam", lr=1e-3),
                    precision="f32", seed=0)
    dfstate, dfstep, dfiter, _ = recipes.build_diffusion(ddpm_cfg,
                                                         synthetic=True)
    dfit = dfiter()
    for _ in range(3):
        dfstate, dfm = dfstep(dfstate, next(dfit))
    dfit.close()
    grid = recipes.make_diffusion_sampler(ddpm_cfg)(dfstate, 4, 0)
    print(f"[diffusion] 3 fused noise-prediction steps "
          f"(loss {float(dfm['loss']):.3f}), 4-step DDIM scan -> "
          f"{grid.shape} uint8 samples")

    # --- fixmatch: labeled + weak + strong in ONE program ------------
    fm_cfg = dict(task="semisup", model="smallnet", model_kwargs={},
                  dataset="cifar10", data_dir=None, num_classes=10,
                  labeled_per_class=2, mu=2, threshold=0.95,
                  batch_size=4, total_steps=2,
                  optimizer=dict(name="momentum", momentum_coef=0.9,
                                 lr=0.05),
                  augment=dict(out_hw=(32, 32), area_range=None, pad=4,
                               flip=True,
                               mean=(0.4914, 0.4822, 0.4465),
                               std=(0.2470, 0.2435, 0.2616)),
                  augment_strong=dict(randaugment=(2, 10)),
                  precision="f32", seed=0)
    fstate, fstep, fiter, fval, feval = recipes.build_semisup(
        fm_cfg, synthetic=True)
    fit = fiter()
    fstate, fm = fstep(fstate, next(fit))
    fit.close()
    facc = feval(fstate, fval.eval_iter(8))
    print(f"[fixmatch] fused labeled+weak+strong step: sup "
          f"{float(fm['sup_loss']):.2f}, mask rate "
          f"{float(fm['mask_rate']):.2f}, EMA val acc {facc:.3f}")

    print("tour complete")


if __name__ == "__main__":
    main()
