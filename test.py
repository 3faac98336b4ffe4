#!/usr/bin/env python
"""Evaluation entry point (reference: test.py at repo root — SURVEY.md
§2#9, §3.3): restore a checkpoint and score the test split.

    python test.py --config configs/cifar10_smallnet.py --ckpt runs/x
        [--synthetic] [--best]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True, help="checkpoint dir or file")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--best", action="store_true",
                    help="restore best.npz instead of latest")
    ap.add_argument("--average", type=int, default=0, metavar="N",
                    help="average the params of the last N checkpoints "
                         "(eval-time Polyak ensemble)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tta", default=None,
                    choices=("flip", "ten_crop", "x8"),
                    help="classification test-time augmentation")
    ap.add_argument("--ema", action="store_true",
                    help="evaluate the Polyak-averaged parameters "
                         "(requires optimizer.ema_decay in the config)")
    ap.add_argument("--topk", type=int, default=1,
                    help="score top-k accuracy (classification)")
    ap.add_argument("--export", default=None, metavar="PATH",
                    help="freeze the checkpoint as a StableHLO "
                         "artifact, then exit (no scoring).  "
                         "classification (incl. RepVGG deploy fold) "
                         "-> serve.py; detection (normalize -> "
                         "forward -> decode -> NMS) -> serve.py "
                         "--detect; tracking (blob -> peak offset) -> "
                         "serve.py --track; segmentation (normalize "
                         "-> forward -> upsample -> argmax) -> "
                         "serve.py --segment; sr/style/gan "
                         "([0,1]-in/[0,1]-out image-to-image; dcgan "
                         "takes latents, cyclegan writes both "
                         "directions) -> serve.py --translate / "
                         "--sample")
    ap.add_argument("--int8", action="store_true",
                    help="with --export: quantize the backbone through "
                         "the int8 MXU path, calibrating static "
                         "activation scales on val batches")
    ap.add_argument("--coco", action="store_true",
                    help="detection: report COCO-style mAP@[.5:.95] "
                         "(plus the per-threshold curve) instead of "
                         "VOC mAP@0.5")
    ap.add_argument("--report", action="store_true",
                    help="print the per-class precision/recall/F1 report "
                         "(classification)")
    ap.add_argument("--calibrate", action="store_true",
                    help="fit a softmax temperature on the val split and "
                         "report ECE before/after (classification)")
    ap.add_argument("--fid", action="store_true",
                    help="GAN configs: compute FID between generated "
                         "samples and the real split through a feature "
                         "extractor (see --fid_extractor)")
    ap.add_argument("--fid_extractor", default=None, metavar="SPEC",
                    help="feature extractor for --fid: "
                         "'CONFIG:CKPT_DIR' of any trained classifier "
                         "(its tagged backbone features are the "
                         "embedding), or 'inception:WEIGHTS.npz' for the "
                         "canonical Inception-v3 slot once weights are "
                         "available offline")
    ap.add_argument("--fid_samples", type=int, default=256,
                    help="sample count per side for --fid")
    ap.add_argument("--scales", default=None,
                    help="segmentation multi-scale eval, e.g. "
                         "'0.75,1.0,1.25' (implies flip averaging)")
    ap.add_argument("--save_preds", default=None, metavar="DIR",
                    help="segmentation: write colorized prediction masks "
                         "and input overlays as PNGs")
    ap.add_argument("--set", action="append", default=None,
                    metavar="KEY=VALUE", dest="overrides",
                    help="override any config entry (repeatable, "
                         "Python-literal values, dotted keys)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from myconvnet_tpu import recipes

    cfg = recipes.load_config(args.config, batch_size=args.batch,
                              data_dir=args.data_dir)
    cfg = recipes.apply_overrides(cfg, args.overrides)
    # Table-driven task dispatch (mirrors train.py's TASKS registry —
    # VERDICT r4 weak #4): families with their own eval drivers live in
    # TASK_EVAL; everything else rides the generic ConvNet path, whose
    # per-family exporters are export_cli.CONVNET_EXPORTERS.
    handler = TASK_EVAL.get(cfg["task"])
    if handler is not None:
        return handler(cfg, args)
    return eval_convnet(cfg, args)


def eval_diffusion(cfg, args):
    from myconvnet_tpu import export_cli
    if args.export:
        return export_cli.export_diffusion(cfg, args)
    if args.fid:
        return eval_gan_fid(cfg, args)
    raise SystemExit("diffusion checkpoints: use generate.py for "
                     "sample grids, test.py --fid "
                     "--fid_extractor CONFIG:CKPT to score, or "
                     "--export for a StableHLO DDIM sampler "
                     "artifact (serve.py --sample)")


def eval_gan(cfg, args):
    from myconvnet_tpu import export_cli
    if args.export:
        return export_cli.export_gan(cfg, args)
    if args.fid:
        return eval_gan_fid(cfg, args)
    if cfg.get("gan_kind") == "pix2pix":
        return eval_pix2pix(cfg, args)
    if cfg.get("gan_kind") == "srgan":
        return eval_srgan(cfg, args)
    raise SystemExit("unconditional GAN checkpoints: use generate.py "
                     "(sample grids) or test.py --fid "
                     "--fid_extractor CONFIG:CKPT; paired "
                     "translation (pix2pix) is scored here with "
                     "PSNR/SSIM; --export writes a generator "
                     "StableHLO artifact")


def eval_style(cfg, args):
    from myconvnet_tpu import export_cli
    if args.export:
        return export_cli.export_style(cfg, args)
    raise SystemExit("style checkpoints: use generate.py "
                     "--config CONFIG --ckpt DIR [--input IMGDIR] "
                     "to write content|stylized grids, or test.py "
                     "--export for a StableHLO stylizer artifact")


def eval_convnet(cfg, args):
    """The generic ConvNet-API eval path: restore -> (export | score)
    -> optional reports; every TASKS row without a TASK_EVAL entry
    lands here."""
    from myconvnet_tpu import export_cli, recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    builder = recipes.convnet_builder(cfg["task"])
    net, _train_set, val_set = builder(cfg, synthetic=args.synthetic,
                                       ckpt_dir=args.ckpt)
    evaluator = recipes.build_evaluator(cfg)
    if args.topk > 1 and cfg["task"] == "classification":
        from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
        evaluator = AccuracyEvaluator(k=args.topk)
    if args.report and cfg["task"] == "classification":
        from myconvnet_tpu.eval.evaluators import (
            ConfusionMatrixEvaluator, JointEvaluator)
        cm = ConfusionMatrixEvaluator(cfg["num_classes"])
        # with --topk: score top-k, accumulate the confusion report in
        # the same pass (JointEvaluator) rather than silently replacing
        # the requested metric with top-1
        evaluator = (JointEvaluator(evaluator, cm)
                     if args.topk > 1 else cm)
    net.build(recipes.make_optimizer(cfg["optimizer"]))
    path = args.ckpt
    if args.best:
        best = ckpt_lib.best_checkpoint(args.ckpt)
        if best is None:
            raise SystemExit(f"no best.npz under {args.ckpt!r}")
        path = best
    if args.average > 1:
        import os
        ckpt_dir = (os.path.dirname(args.ckpt)
                    if os.path.isfile(args.ckpt) else args.ckpt)
        restored = ckpt_lib.average_checkpoints(
            ckpt_dir, net.state._asdict(), n_last=args.average)
        net.state = type(net.state)(**restored)
        print(f"averaged params over the last "
              f"{min(args.average, len(ckpt_lib.all_steps(ckpt_dir)))} "
              "checkpoints")
    else:
        net.restore(path)
    if args.ema:
        import jax
        from myconvnet_tpu.train import optim as optim_lib
        ema = optim_lib.extract_ema(net.state.opt_state)
        net.state = net.state._replace(params=jax.tree.map(
            lambda p, e: e.astype(p.dtype), net.state.params, ema))
        print("evaluating EMA parameters")
    if args.export:
        exporter = export_cli.CONVNET_EXPORTERS.get(cfg["task"])
        if exporter is None:
            raise SystemExit(
                f"no --export implemented for task {cfg['task']!r}; "
                f"available: {sorted(export_cli.CONVNET_EXPORTERS)}")
        return exporter(cfg, args, net, val_set)
    batch = cfg["batch_size"]
    if args.tta and cfg["task"] == "classification":
        evaluator.reset()
        for x, y in val_set.eval_iter(batch, prefetch=0):
            logp = net.predict(x, batch_size=len(x), tta=args.tta)
            evaluator.update(logp, y)
        score = evaluator.score()
    elif args.tta and cfg["task"] == "sr":
        # geometric self-ensemble ('flip' x2 / 'x8' — EDSR's eval
        # protocol): synthesize LR with the SAME shared transforms as
        # net.evaluate's eval_fn, predict with inverse-transformed
        # view averaging, score against the HR patch
        import numpy as np

        from myconvnet_tpu.models.sr import area_downsample, center_crop_hw
        scale = int(cfg.get("scale", 4))
        hr_size = int(cfg["hr_size"])
        evaluator.reset()
        for x, _ in val_set.eval_iter(batch, prefetch=0):
            hr01 = center_crop_hw(np.asarray(x), hr_size) \
                .astype(np.float32) / 255.0
            # predict_fn divides by 255: hand it the [0,255] LR frame
            pred = net.predict(area_downsample(hr01, scale) * 255.0,
                               batch_size=batch, tta=args.tta)
            evaluator.update(pred, hr01)
        score = evaluator.score()
    elif args.scales and cfg["task"] == "segmentation":
        scales = tuple(float(s) for s in args.scales.split(","))
        evaluator.reset()
        for x, y in val_set.eval_iter(batch, prefetch=0):
            import numpy as np
            pred = net.predict_segmentation(np.asarray(x), scales=scales,
                                            flip=True, batch_size=len(x))
            evaluator.update(pred, y)
        score = evaluator.score()
    else:
        score = net.evaluate(val_set, evaluator, batch_size=batch)
    print(f"{evaluator.name}: {score:.4f}")
    if args.calibrate and cfg["task"] == "classification":
        import os

        import numpy as np

        from myconvnet_tpu.eval.calibration import (
            expected_calibration_error, fit_temperature)
        logits, labels = [], []
        for x, yv in val_set.eval_iter(batch, prefetch=0):
            logits.append(net.predict(np.asarray(x), batch_size=len(x)))
            labels.append(np.asarray(yv))
        logits = np.concatenate(logits)
        labels = np.concatenate(labels)
        temp = fit_temperature(logits, labels)
        ece_raw = expected_calibration_error(logits, labels)
        ece_cal = expected_calibration_error(logits, labels,
                                             temperature=temp)
        print(f"temperature: {temp:.3f}  "
              f"ece: {ece_raw:.4f} -> {ece_cal:.4f}")
        out_dir = (args.ckpt if os.path.isdir(args.ckpt)
                   else os.path.dirname(args.ckpt) or ".")
        import json
        cal_path = os.path.join(out_dir, "calibration.json")
        with open(cal_path, "w") as f:
            json.dump({"temperature": temp, "ece_raw": ece_raw,
                       "ece_calibrated": ece_cal}, f)
        print(f"wrote {cal_path}")
    if args.report and hasattr(evaluator, "report"):
        names = getattr(val_set.source, "class_names", None)
        print(evaluator.report(names))
    if args.save_preds and cfg["task"] == "segmentation":
        import os

        import numpy as np

        from myconvnet_tpu.utils.images import (colorize_mask,
                                                overlay_mask, save_png)
        ignore = cfg.get("ignore_label", 255)
        scales = (tuple(float(s) for s in args.scales.split(","))
                  if args.scales else (1.0,))
        idx = 0
        for x, _y in val_set.eval_iter(batch, prefetch=0):
            x = np.asarray(x)
            pred = net.predict_segmentation(x, scales=scales,
                                            flip=bool(args.scales),
                                            batch_size=len(x))
            img_u8 = (x if x.dtype == np.uint8
                      else np.clip(x, 0, 255).astype(np.uint8))
            for j in range(len(x)):
                save_png(os.path.join(args.save_preds,
                                      f"{idx:05d}_mask.png"),
                         colorize_mask(pred[j], ignore_label=ignore))
                save_png(os.path.join(args.save_preds,
                                      f"{idx:05d}_overlay.png"),
                         overlay_mask(img_u8[j], pred[j],
                                      ignore_label=ignore))
                idx += 1
        print(f"wrote {idx} prediction pairs to {args.save_preds}")
    if args.save_preds and cfg["task"] == "depth":
        import os

        import numpy as np

        from myconvnet_tpu.utils.images import save_png
        max_depth = float(cfg.get("max_depth", 10.0))
        # write with the corpus's own integer scale (NYU mm = 1000,
        # KITTI = 256) so DepthPairSource can re-read what we save
        depth_scale = float(cfg.get("depth_scale", 1000.0))
        idx = 0
        for x, _y in val_set.eval_iter(batch, prefetch=0):
            x = np.asarray(x)
            pred = np.asarray(net.predict(x, batch_size=len(x)))
            for j in range(len(x)):
                d = pred[j, ..., 0]
                mm = np.clip(d * depth_scale, 0, 65535).astype(np.uint16)
                save_png(os.path.join(args.save_preds,
                                      f"{idx:05d}_depth16.png"), mm)
                # 8-bit visualization: near = bright
                vis = np.clip(1.0 - d / max_depth, 0.0, 1.0)
                save_png(os.path.join(args.save_preds,
                                      f"{idx:05d}_depth.png"),
                         (vis * 255).astype(np.uint8))
                idx += 1
        print(f"wrote {idx} depth-map pairs to {args.save_preds}")
    if args.save_preds and cfg["task"] == "flow":
        import os

        import numpy as np

        from myconvnet_tpu.subsets.flow import write_flo
        from myconvnet_tpu.utils.images import flow_to_color, save_png
        os.makedirs(args.save_preds, exist_ok=True)
        idx = 0
        for x, _y in val_set.eval_iter(batch, prefetch=0):
            x = np.asarray(x)
            pred = np.asarray(net.predict(x, batch_size=len(x)))
            for j in range(len(x)):
                # .flo roundtrips through subsets.flow.read_flo;
                # the PNG is the Middlebury color wheel
                write_flo(os.path.join(args.save_preds,
                                       f"{idx:05d}_flow.flo"), pred[j])
                save_png(os.path.join(args.save_preds,
                                      f"{idx:05d}_flow.png"),
                         flow_to_color(pred[j]))
                idx += 1
        print(f"wrote {idx} flow pairs to {args.save_preds}")


def eval_ssl(cfg, args):
    """Score a self-supervised checkpoint with the kNN probe (frozen
    features, labeled bank from the train split) and re-export
    ``encoder.npz`` next to the checkpoint for fine-tuning."""
    import os

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.train import ssl as ssl_lib

    state, _step, train_set, val_set, feats_fn, kind = recipes.build_ssl(
        cfg, synthetic=args.synthetic)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    batch = cfg["batch_size"]
    knn = ssl_lib.knn_eval(
        feats_fn, state, train_set.eval_iter(batch),
        val_set.eval_iter(batch), k=cfg.get("knn_k", 20),
        num_classes=cfg["num_classes"],
        max_bank=cfg.get("knn_bank", 4096),
        max_query=cfg.get("knn_query", 2048))
    print(f"{kind} kNN top-1: {knn:.4f}")
    out_dir = args.ckpt if os.path.isdir(args.ckpt) \
        else os.path.dirname(args.ckpt)
    enc = ssl_lib.export_encoder_npz(state.params,
                                     os.path.join(out_dir, "encoder.npz"))
    print(f"encoder exported: {enc}")


def eval_detection(cfg, args):
    """Score a detection checkpoint: VOC mAP over the val split, with
    optional per-class AP table (--report)."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    state, _step, predict, _train_set, val_set = recipes.build_detector(
        cfg, synthetic=args.synthetic)
    path = args.ckpt
    if args.best:
        best = ckpt_lib.best_checkpoint(args.ckpt)
        if best is None:
            raise SystemExit(f"no best.npz under {args.ckpt!r}")
        path = best
    restored = ckpt_lib.restore_checkpoint(path, state._asdict())
    state = type(state)(**restored)
    if args.export:
        import numpy as np

        from myconvnet_tpu import models, serving

        # resolve the input size exactly as build_detector does: config
        # override, else the architecture's own input_hw
        model_fn = models.get_model(cfg.get("model", "ssd300"))
        hw = tuple(cfg.get("input_hw", model_fn.input_hw))
        sample = np.zeros((cfg.get("export_batch", 8), *hw, 3),
                          np.float32)
        if args.int8:
            cal = [np.asarray(val_set.source.get_batch(
                np.arange(min(8, len(val_set.source))))[0],
                np.float32) / 255.0]
            fn = recipes.make_detector_inference(
                cfg, state, int8=True, calibrate_with=cal)
            size = serving.export_detection(fn, None, sample,
                                            args.export)
        else:
            size = serving.export_detection(predict, state, sample,
                                            args.export)
        print(f"exported detection artifact: {args.export} "
              f"({size / 1e6:.1f} MB, input {sample.shape}"
              f"{', int8 calibrated' if args.int8 else ''})")
        return
    from myconvnet_tpu.eval.detection import COCOMeanAPEvaluator
    from myconvnet_tpu.eval.panoptic import PanopticQualityEvaluator
    if args.coco:
        cfg = dict(cfg, map_style="coco")
    evaluator = recipes.build_evaluator(cfg)
    score = recipes.evaluate_detection(state, predict, val_set,
                                       cfg["batch_size"], evaluator)
    # label by what the evaluator actually computed (--coco OR a
    # map_style="coco" config); the threshold sweep behind score() is
    # cached, so the curve printout costs nothing extra
    if isinstance(evaluator, PanopticQualityEvaluator):
        print(f"PQ: {score:.4f}")
        if args.report:
            names = getattr(val_set.source, "class_names", None)
            for (kind, c), v in evaluator.per_class().items():
                label = (names[c - 1] if names and kind == "thing"
                         else f"{kind} {c}")
                print(f"  {label:<14} PQ {v['pq']:.4f} SQ {v['sq']:.4f}"
                      f" RQ {v['rq']:.4f}")
        return score
    if isinstance(evaluator, COCOMeanAPEvaluator):
        print(f"mAP@[.5:.95]: {score:.4f}")
        for t, v in evaluator.per_threshold().items():
            print(f"  mAP@{t:.2f}  {v:.4f}")
    else:
        print(f"mAP@{evaluator.iou_threshold:g}: {score:.4f}")
    if args.report:
        names = getattr(val_set.source, "class_names", None)
        for c, ap in sorted(evaluator.per_class_ap().items()):
            label = names[c - 1] if names else str(c)
            print(f"  {label:<14} AP {ap:.4f}")
    return score


def _fid_extractor(spec):
    """Build the feature extractor for --fid.

    'CONFIG:CKPT_DIR' — any trained classifier recipe; its tagged
    backbone features ('features') are the embedding.  FID numbers are
    comparable only across the SAME extractor; the literature-canonical
    choice is ImageNet Inception-v3 — 'inception:WEIGHTS.npz' fills
    that slot from a local npz (no egress in this environment, so it
    stays a documented slot; eval/gan_metrics.py docstring).

    Returns (feature_fn(images_uint8) -> [N, D] np.ndarray, input_hw).
    """
    import numpy as np

    from myconvnet_tpu import models, recipes
    from myconvnet_tpu.models.base import ConvNet

    kind, _, rest = spec.partition(":")
    if kind == "inception":
        from myconvnet_tpu.models.pretrained import load_npz_weights
        net = ConvNet(models.inception_v3, input_shape=(299, 299, 3),
                      num_classes=1000)
        net.build()
        net.state = net.state._replace(
            params=load_npz_weights(rest, net.state.params))
        hw = (299, 299)
    else:
        ecfg = recipes.load_config(kind)
        net, _tr, _va = recipes.build_classifier(ecfg, synthetic=True,
                                                 ckpt_dir=rest)
        # build with the RECIPE's optimizer: the checkpoint's opt_state
        # structure must match the template or restore raises
        net.build(recipes.make_optimizer(ecfg["optimizer"]))
        net.restore(rest)
        hw = tuple(ecfg["input_hw"])

    def feature_fn(images_u8):
        import jax.numpy as jnp

        from myconvnet_tpu.ops.resize import resize_bilinear
        x = jnp.asarray(images_u8, jnp.float32) / 255.0
        if x.shape[1:3] != hw:
            x = resize_bilinear(x, hw)
        feats = net.features(np.asarray(x), tag="features")
        # global-average-pool spatial maps to [N, D] embeddings
        if feats.ndim == 4:
            feats = feats.mean(axis=(1, 2))
        return np.asarray(feats, np.float64)

    return feature_fn, hw


def eval_semisup(cfg, args):
    """Score a FixMatch checkpoint: EMA top-1 accuracy on the val
    split (the paper's evaluation protocol)."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    state, _step, _it, val_set, eval_fn = recipes.build_semisup(
        cfg, synthetic=args.synthetic)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    acc = eval_fn(state, val_set.eval_iter(cfg["batch_size"]))
    print(f"val accuracy (EMA): {acc:.4f}")
    return acc


def eval_distill(cfg, args):
    """Score a distillation checkpoint's STUDENT (top-1 on the val
    split); ``--export`` additionally freezes the student as a plain
    classification StableHLO artifact — the compress-the-zoo endpoint
    (train big, distill small, serve the student)."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    # the distill checkpoint is SELF-CONTAINED (teacher params ride in
    # the state): never require the original teacher weight source at
    # eval time (it may be gone), and never waste its load — the
    # restore below overwrites teacher params either way
    cfg = dict(cfg)
    dcfg = {k: v for k, v in dict(cfg.get("distill") or {}).items()
            if k not in ("ckpt", "npz", "torch")}
    dcfg["allow_random"] = True
    cfg["distill"] = dcfg
    state, _step, _it, val_set, eval_fn = recipes.build_distill(
        cfg, synthetic=args.synthetic)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    acc = eval_fn(state, val_set.eval_iter(cfg["batch_size"]))
    print(f"student val accuracy: {acc:.4f}")
    if args.export:
        import numpy as np

        from myconvnet_tpu import serving
        from myconvnet_tpu.recipes.representation import make_policy_net

        student = make_policy_net(cfg, cfg["model"],
                                  cfg.get("model_kwargs", {}))
        # the resolution the student actually trained/evals at
        hw = tuple(recipes.make_augment(cfg["augment"]).out_hw)
        sample = np.zeros((cfg.get("export_batch", 8), *hw, 3),
                          np.float32)
        size = serving.export_inference(
            student, state.student.params, state.student.model_state,
            sample, args.export)
        print(f"exported student artifact: {args.export} "
              f"({size / 1e6:.1f} MB, input {sample.shape})")
    return acc


def eval_gan_fid(cfg, args):
    """FID between generated samples and the real split (VERDICT r1
    next #10: the gan_metrics machinery gains a CLI consumer)."""
    import numpy as np

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.data.pipeline import DataSet
    from myconvnet_tpu.eval.gan_metrics import fid_from_features

    if not args.fid_extractor:
        raise SystemExit(
            "--fid needs --fid_extractor CONFIG:CKPT_DIR (any trained "
            "classifier) or inception:WEIGHTS.npz")
    feature_fn, _hw = _fid_extractor(args.fid_extractor)

    if cfg["task"] == "diffusion":
        # same unconditional sample(state, n, seed) shape as dcgan
        state, _step, _it, _ = recipes.build_diffusion(
            cfg, synthetic=args.synthetic)
        sampler = recipes.make_diffusion_sampler(cfg)
        kind = "dcgan"
    else:
        state, _step, _it, kind = recipes.build_gan(
            cfg, synthetic=args.synthetic)
        sampler = recipes.make_gan_sampler(cfg)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    n = args.fid_samples
    size = cfg.get("image_size", 32)

    # fakes
    if kind == "dcgan":
        fakes = []
        batch = min(cfg["batch_size"], n)
        for i in range(0, n, batch):
            fakes.append(np.asarray(sampler(state, min(batch, n - i),
                                            seed=i)))
        fakes = np.concatenate(fakes)[:n]
    elif kind == "pix2pix":
        from myconvnet_tpu.subsets import pairs
        src = pairs.make_source(
            cfg.get("data_dir"), "val",
            synthetic=args.synthetic or cfg.get("data_dir") is None,
            raw_hw=(size, size))
        ds = DataSet(src)
        fakes = []
        for a, _b in ds.eval_iter(cfg["batch_size"], prefetch=0):
            a = np.asarray(a).astype(np.float32) / 127.5 - 1.0
            fakes.append(np.asarray(sampler(state, a)))
            if sum(len(f) for f in fakes) >= n:
                break
        fakes = np.concatenate(fakes)[:n]
    else:
        raise SystemExit(f"--fid supports dcgan/pix2pix (got {kind!r})")

    # reals from the recipe's dataset (val split; synthetic honored)
    if kind == "pix2pix":
        reals = []
        for _a, b in ds.eval_iter(cfg["batch_size"], prefetch=0):
            reals.append(np.asarray(b))
            if sum(len(r) for r in reals) >= n:
                break
        reals = np.concatenate(reals)[:n]
    else:
        train_src, val_src = recipes.make_sources(
            dict(cfg, dataset=cfg.get("dataset", "cifar10")),
            args.synthetic)
        rds = DataSet(val_src)
        reals = []
        for x, _y in rds.eval_iter(cfg["batch_size"], prefetch=0):
            reals.append(np.asarray(x))
            if sum(len(r) for r in reals) >= n:
                break
        reals = np.concatenate(reals)[:n]

    fid = fid_from_features(feature_fn(reals), feature_fn(fakes))
    print(f"fid: {fid:.3f} (n={n}, extractor={args.fid_extractor})")
    return fid


def eval_pix2pix(cfg, args):
    """Score a pix2pix checkpoint on the val pairs with PSNR + SSIM."""
    import numpy as np

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.data.pipeline import DataSet
    from myconvnet_tpu.eval.image_metrics import PairedImageEvaluator
    from myconvnet_tpu.subsets import pairs

    state, _step, _it, _kind = recipes.build_gan(cfg,
                                                 synthetic=args.synthetic)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    sampler = recipes.make_gan_sampler(cfg)
    size = cfg.get("image_size", 32)
    src = pairs.make_source(
        cfg.get("data_dir"), "val",
        synthetic=args.synthetic or cfg.get("data_dir") is None,
        raw_hw=(size, size))
    ds = DataSet(src)
    ev_psnr = PairedImageEvaluator("psnr")
    ev_ssim = PairedImageEvaluator("ssim")
    for a, b in ds.eval_iter(cfg["batch_size"], prefetch=0):
        a = np.asarray(a).astype(np.float32) / 127.5 - 1.0
        pred = sampler(state, a).astype(np.float32) / 255.0
        target = np.asarray(b).astype(np.float32) / 255.0
        ev_psnr.update(pred, target)
        ev_ssim.update(pred, target)
    print(f"psnr: {ev_psnr.score():.2f} dB")
    print(f"ssim: {ev_ssim.score():.4f}")


def eval_srgan(cfg, args):
    """Score an SRGAN checkpoint with PSNR/SSIM: HR patches from the
    val image stream, LR synthesized by the same exact area downsample
    the training iterator uses."""
    import numpy as np

    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.data.pipeline import DataSet
    from myconvnet_tpu.eval.image_metrics import PairedImageEvaluator
    from myconvnet_tpu.subsets import images as images_mod

    from myconvnet_tpu.models.sr import area_downsample, center_crop_hw

    state, _step, _it, _kind = recipes.build_gan(cfg,
                                                 synthetic=args.synthetic)
    restored = ckpt_lib.restore_checkpoint(args.ckpt, state._asdict())
    state = type(state)(**restored)
    sampler = recipes.make_gan_sampler(cfg)
    scale = int(cfg.get("scale", 4))
    hr_size = int(cfg.get("hr_size", cfg.get("image_size", 96)))
    mean = np.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                      np.float32)
    src = images_mod.make_source(
        cfg.get("data_dir"), "val",
        synthetic=args.synthetic or cfg.get("data_dir") is None,
        decode_mode="native_crop")
    ds = DataSet(src)
    ev_psnr = PairedImageEvaluator("psnr")
    ev_ssim = PairedImageEvaluator("ssim")
    for x, _ in ds.eval_iter(cfg["batch_size"], prefetch=0):
        # SAME transforms as training: shared center-crop + area
        # downsample in the SR family's [0,1] value space
        hr = center_crop_hw(np.asarray(x), hr_size) \
            .astype(np.float32) / 255.0
        lr = area_downsample(hr, scale) - mean
        pred = sampler(state, lr).astype(np.float32) / 255.0
        ev_psnr.update(pred, hr)
        ev_ssim.update(pred, hr)
    print(f"psnr: {ev_psnr.score():.2f} dB")
    print(f"ssim: {ev_ssim.score():.4f}")


# Task -> eval driver (cfg, args).  The registry main() dispatches
# through, mirroring train.py's TASKS table (VERDICT r4 weak #4):
# adding a family with its own eval semantics = one function + one row
# here; ConvNet-API families need NO row (eval_convnet is the default)
# and register exporters in export_cli.CONVNET_EXPORTERS instead.
TASK_EVAL = {
    "diffusion": eval_diffusion,
    "semisup": eval_semisup,
    "distill": eval_distill,
    "gan": eval_gan,
    "style": eval_style,
    "detection": eval_detection,
    "ssl": eval_ssl,
}


if __name__ == "__main__":
    main()
