"""Recipe builder: turn a config dict into runnable training components.

Rebuild of the reference's entry-script wiring (SURVEY.md §2#9/#10,
§3.1): config -> read_subset -> DataSet -> model -> Evaluator ->
Optimizer.train().  Shared by train.py / test.py / bench.py.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Any

import jax
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.eval.evaluators import (AccuracyEvaluator,
                                           MeanIoUEvaluator)
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.subsets import (cifar10, cifar100, imagenet, mnist,
                                   svhn, voc)
from myconvnet_tpu.train import gan as gan_lib
from myconvnet_tpu.train import optim as optim_lib
from myconvnet_tpu.train.losses import (ce_dice_loss, dice_loss,
                                        focal_loss, pixel_cross_entropy,
                                        softmax_cross_entropy)


def load_config(path: str, **overrides) -> dict:
    """Load a recipe: a .py module exposing ``config`` or a .json dump
    (the resolved config train.py persists to <out>/config.json — so a
    finished run's directory is itself a rerunnable recipe)."""
    if path.endswith(".json"):
        import json
        with open(path) as f:
            cfg = json.load(f)
    else:
        spec = importlib.util.spec_from_file_location("_cfg", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = dict(mod.config)
    for k, v in overrides.items():
        if v is not None:
            cfg[k] = v
    return cfg


def apply_overrides(cfg: dict, pairs) -> dict:
    """Apply ``KEY=VALUE`` CLI overrides (train.py/test.py ``--set``).

    Values parse as Python literals (``--set scale=2``,
    ``--set "model_kwargs={'width': 64}"``) and fall back to the raw
    string (``--set model=srresnet``); dotted keys descend into nested
    dict entries (``--set optimizer.name=sgd``).
    """
    import ast
    for pair in pairs or []:
        key, sep, raw = pair.partition("=")
        if not sep or not key:
            raise ValueError(f"--set wants KEY=VALUE, got {pair!r}")
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        tgt = cfg
        parts = key.split(".")
        for seg in parts[:-1]:
            nxt = tgt.get(seg)
            if not isinstance(nxt, dict):
                nxt = tgt[seg] = {}
            tgt = nxt
        tgt[parts[-1]] = val
    return cfg


def make_optimizer(opt_cfg: dict) -> optim_lib.Optimizer:
    opt_cfg = dict(opt_cfg)
    name = opt_cfg.pop("name")
    lr = opt_cfg.pop("lr")
    if isinstance(lr, dict):
        lr = optim_lib.make_schedule(lr)
    if opt_cfg.pop("wd_exclude_norms", False):
        opt_cfg["weight_decay_exclude"] = optim_lib.norm_and_bias_exclusion
    clip = opt_cfg.pop("clip_norm", None)
    ema_decay = opt_cfg.pop("ema_decay", None)
    plateau = opt_cfg.pop("plateau", False)
    lookahead = opt_cfg.pop("lookahead", None)
    freeze = opt_cfg.pop("freeze", None)
    if freeze is not None:
        # Also exclude frozen subtrees from the inner optimizer's weight
        # decay: with_frozen zeroes their grads, but without this the
        # decay term wd*p would still flow into momentum/Adam moments
        # for frozen leaves (phantom state drift; params themselves are
        # protected by with_frozen's kept-mask either way).  ``freeze``
        # may be a predicate or an iterable of prefixes — same contract
        # as with_frozen.
        frozen_pred = optim_lib.as_frozen_predicate(freeze)
        prev = opt_cfg.get("weight_decay_exclude")

        def _exclude(path, p, _prev=prev, _frozen=frozen_pred):
            return (_frozen(path, p)
                    or (_prev is not None and _prev(path, p)))

        opt_cfg["weight_decay_exclude"] = _exclude
    opt = optim_lib.make_optimizer(name, lr, **opt_cfg)
    if plateau:
        # inside clipping/EMA so a surrounding EMA tracks the
        # actually-applied (scaled) parameters; see optim.with_plateau
        opt = optim_lib.with_plateau(opt)
    if clip:
        opt = optim_lib.with_gradient_clipping(opt, float(clip))
    if freeze:
        # OUTSIDE clipping: frozen grads are zeroed before the global
        # norm, so the clip threshold applies to the trainable subset
        opt = optim_lib.with_frozen(opt, freeze)
    if lookahead:
        # outside freeze/clip (slow weights track the actually-applied
        # fast weights), inside EMA.  `lookahead: true` opts into the
        # paper defaults; an int sets sync_period; a dict passes through.
        if isinstance(lookahead, dict):
            kw = dict(lookahead)
        elif lookahead is True:
            kw = {}
        else:
            kw = dict(sync_period=int(lookahead))
        opt = optim_lib.with_lookahead(opt, **kw)
    if ema_decay:
        opt = optim_lib.with_ema(opt, float(ema_decay))
    return opt


def make_augment(aug_cfg: dict | None) -> AugmentConfig | None:
    if aug_cfg is None:
        return None
    return AugmentConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in aug_cfg.items()})


def make_sources(cfg: dict, synthetic: bool, splits=("train", "val")):
    name = cfg["dataset"]
    data_dir = cfg.get("data_dir")
    from myconvnet_tpu.subsets import images as images_mod
    table = {"cifar10": cifar10, "cifar100": cifar100,
             "imagenet": imagenet, "voc": voc,
             "mnist": mnist, "fashion_mnist": mnist, "svhn": svhn,
             "images": images_mod}
    if name not in table:
        raise ValueError(f"unknown dataset {name!r}; valid: "
                         f"{sorted(table)} (or 'pairs' for pix2pix)")
    mod = table[name]
    out = []
    for split in splits:
        real_split = {"val": "test" if name.startswith("cifar")
                      or name.endswith("mnist") or name == "svhn"
                      else "val"}.get(split, split)
        kw = {}
        if name in ("images", "imagenet") and cfg.get("raw_hw") \
                is not None:
            # decode geometry knob: super-resolution needs native-
            # pixel crops; face/metric corpora in imagenet layout
            # decode at the aligned-crop size rather than 256x256
            kw["raw_hw"] = tuple(cfg["raw_hw"])
        if name == "images" and cfg.get("decode_mode") is not None:
            kw["decode_mode"] = cfg["decode_mode"]
        src = mod.make_source(data_dir, real_split,
                              synthetic=synthetic or data_dir is None,
                              **kw)
        if name == "fashion_mnist":
            src.class_names = mnist.FASHION_CLASS_NAMES
        out.append(src)
    return out


def build_classifier(cfg: dict, synthetic: bool = False,
                     ckpt_dir: str | None = None,
                     log_dir: str | None = None,
                     mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    model_fn = models.get_model(cfg["model"])
    kwargs = dict(cfg.get("model_kwargs", {}))
    smoothing = cfg.get("label_smoothing", 0.0)
    if cfg.get("cls_loss", "ce") == "focal":
        # fail fast on silently-unsupported combinations
        if cfg.get("mix") is not None:
            raise ValueError("cls_loss='focal' needs integer labels; "
                             "remove the 'mix' (MixUp/CutMix) entry")
        if smoothing:
            raise ValueError("cls_loss='focal' does not support "
                             "label_smoothing; remove one of the two")
        loss = lambda logits, y: focal_loss(  # noqa: E731
            logits, y, gamma=cfg.get("focal_gamma", 2.0))
    elif cfg.get("cls_loss", "ce") == "ce":
        loss = lambda logits, y: softmax_cross_entropy(  # noqa: E731
            logits, y, label_smoothing=smoothing)
    else:
        raise ValueError(f"unknown cls_loss {cfg['cls_loss']!r}; "
                         "valid: ['ce', 'focal']")
    augment = make_augment(cfg.get("augment"))
    mix_cfg = cfg.get("mix")
    if mix_cfg is not None:
        from myconvnet_tpu.data.mix import MixConfig
        mix_cfg = MixConfig(**dict(mix_cfg))
    net = ConvNet(model_fn, input_shape=(*cfg["input_hw"], 3),
                  num_classes=cfg["num_classes"],
                  precision=cfg.get("precision", "f32"), loss_fn=loss,
                  augment=augment, mix=mix_cfg,
                  erase_prob=cfg.get("erase_prob", 0.0),
                  mesh=mesh, seed=cfg.get("seed", 0),
                  remat=cfg.get("remat", False),
                  chain_steps=cfg.get("chain_steps", 1),
                  accum_steps=cfg.get("accum_steps", 1),
                  accum_dtype=cfg.get("accum_dtype", "float32"),
                  zero_sharding=cfg.get("zero_sharding", False),
                  sam_rho=cfg.get("sam_rho", 0.0),
                  ckpt_dir=ckpt_dir, log_dir=log_dir, **kwargs)
    train_src, val_src = make_sources(cfg, synthetic)
    return net, DataSet(train_src, augment), DataSet(val_src, augment)


def build_segmenter(cfg: dict, synthetic: bool = False,
                    ckpt_dir: str | None = None, log_dir: str | None = None,
                    mesh=None):
    model_fn = models.get_model(cfg["model"])
    kwargs = dict(cfg.get("model_kwargs", {}))
    ignore = cfg.get("ignore_label", 255)
    kind = cfg.get("seg_loss", "ce")  # ce | dice | ce_dice | focal
    table = {"ce": pixel_cross_entropy, "dice": dice_loss,
             "ce_dice": ce_dice_loss, "focal": focal_loss}
    if kind not in table:
        raise ValueError(f"unknown seg_loss {kind!r}; valid: "
                         f"{sorted(table)}")
    extra = ({"gamma": cfg.get("focal_gamma", 2.0)}
             if kind == "focal" else {})
    loss = lambda logits, y, _fn=table[kind], _kw=extra: _fn(  # noqa: E731
        logits, y, ignore_label=ignore, **_kw)
    aug = make_augment(cfg.get("augment"))
    if aug is None:
        raise ValueError(
            "segmentation configs need an 'augment' entry (out_hw sets "
            "the training crop/input resolution)")
    if synthetic or cfg.get("data_dir") is None:
        # synthetic masks are small; shrink the recipe resolution so the
        # smoke path stays cheap
        aug = aug._replace(out_hw=(96, 96))
    net = ConvNet(model_fn, input_shape=(*aug.out_hw, 3),
                  num_classes=cfg["num_classes"],
                  precision=cfg.get("precision", "f32"), loss_fn=loss,
                  augment=aug, paired_targets=True,
                  mesh=mesh, seed=cfg.get("seed", 0),
                  remat=cfg.get("remat", False),
                  chain_steps=cfg.get("chain_steps", 1),
                  accum_steps=cfg.get("accum_steps", 1),
                  accum_dtype=cfg.get("accum_dtype", "float32"),
                  spatial=cfg.get("spatial", False),
                  zero_sharding=cfg.get("zero_sharding", False),
                  ckpt_dir=ckpt_dir, log_dir=log_dir, **kwargs)
    train_src, val_src = make_sources(cfg, synthetic)
    return net, DataSet(train_src), DataSet(val_src)


def build_metric(cfg: dict, synthetic: bool = False,
                 ckpt_dir: str | None = None, log_dir: str | None = None,
                 mesh=None):
    """Metric learning (tenth task family): an embedding model over any
    classifier backbone with an ArcFace/CosFace margin head or
    batch-hard triplet loss; evaluation is leave-one-out retrieval
    (eval/retrieval.py).  Labels are identity ids, so any
    classification corpus layout works as a metric corpus."""
    from myconvnet_tpu.models import EMBEDDING_MODELS
    from myconvnet_tpu.train.metric_losses import (
        arcface_loss, batch_hard_triplet_loss, cosface_loss)
    name = cfg.get("model", "embedding_net")
    if name not in EMBEDDING_MODELS:
        raise ValueError(f"unknown metric model {name!r}; valid: "
                         f"{sorted(EMBEDDING_MODELS)}")
    model_fn = EMBEDDING_MODELS[name]
    kwargs = dict(cfg.get("model_kwargs", {}))
    head = kwargs.get("head", "arcface")
    if head == "arcface":
        loss = lambda cos, y: arcface_loss(  # noqa: E731
            cos, y, s=cfg.get("margin_s", 64.0),
            m=cfg.get("margin_m", 0.5))
    elif head == "cosface":
        loss = lambda cos, y: cosface_loss(  # noqa: E731
            cos, y, s=cfg.get("margin_s", 30.0),
            m=cfg.get("margin_m", 0.35))
    elif head == "triplet":
        loss = lambda emb, y: batch_hard_triplet_loss(  # noqa: E731
            emb, y, margin=cfg.get("triplet_margin", 0.3),
            soft=cfg.get("triplet_soft", False))
    else:
        raise ValueError(f"unknown metric_head {head!r}; valid: "
                         "['arcface', 'cosface', 'triplet']")
    pk = tuple(cfg["pk"]) if cfg.get("pk") else None
    if pk is not None and pk[0] * pk[1] != cfg["batch_size"]:
        raise ValueError(f"pk={pk} must multiply to batch_size="
                         f"{cfg['batch_size']}")
    if head == "triplet" and pk is None:
        raise ValueError(
            "triplet training needs identity-balanced batches: set "
            "pk=(P, K) with P*K == batch_size (batch-hard mining has "
            "no positives under uniform sampling of a large identity "
            "set)")
    if head == "triplet" and (pk[0] < 2 or pk[1] < 2):
        raise ValueError(
            f"pk={pk}: batch-hard triplet mining needs P >= 2 "
            "identities (else no negatives) and K >= 2 examples per "
            "identity (else no positives) — with either at 1 the "
            "loss is identically zero and training silently no-ops")
    augment = make_augment(cfg.get("augment"))
    net = ConvNet(model_fn, input_shape=(*cfg["input_hw"], 3),
                  num_classes=cfg["num_classes"],
                  precision=cfg.get("precision", "f32"), loss_fn=loss,
                  augment=augment, mesh=mesh, seed=cfg.get("seed", 0),
                  remat=cfg.get("remat", False),
                  chain_steps=cfg.get("chain_steps", 1),
                  accum_steps=cfg.get("accum_steps", 1),
                  accum_dtype=cfg.get("accum_dtype", "float32"),
                  zero_sharding=cfg.get("zero_sharding", False),
                  sam_rho=cfg.get("sam_rho", 0.0),
                  accuracy_metric=head != "triplet",
                  ckpt_dir=ckpt_dir, log_dir=log_dir, **kwargs)
    train_src, val_src = make_sources(cfg, synthetic)
    return (net, DataSet(train_src, augment, pk=pk),
            DataSet(val_src, augment))


def build_evaluator(cfg: dict):
    if cfg["task"] == "ocr":
        from myconvnet_tpu.eval.text import (CharErrorRateEvaluator,
                                             SequenceAccuracyEvaluator)
        kind = cfg.get("ocr_metric", "cer")
        cls = {"cer": CharErrorRateEvaluator,
               "seq_accuracy": SequenceAccuracyEvaluator}.get(kind)
        if cls is None:
            raise ValueError(f"unknown ocr_metric {kind!r}; valid: "
                             "['cer', 'seq_accuracy']")
        return cls(decoder=cfg.get("ctc_decoder", "greedy"),
                   beam_width=cfg.get("beam_width", 8))
    if cfg["task"] == "depth":
        from myconvnet_tpu.eval.depth import DepthEvaluator
        return DepthEvaluator(
            metric=cfg.get("depth_metric", "absrel"),
            min_depth=cfg.get("eval_min_depth", 1e-3),
            max_depth=cfg.get("eval_max_depth", np.inf),
            median_scaling=cfg.get("median_scaling", False))
    if cfg["task"] == "flow":
        from myconvnet_tpu.eval.flow import FlowEvaluator
        return FlowEvaluator(metric=cfg.get("flow_metric", "epe"))
    if cfg["task"] == "tracking":
        from myconvnet_tpu.eval.tracking import TrackingEvaluator
        from myconvnet_tpu.models.tracking import SIAMFC_STRIDE
        return TrackingEvaluator(
            metric=cfg.get("tracking_metric", "cerr"),
            stride=cfg.get("response_stride", SIAMFC_STRIDE))
    if cfg["task"] == "metric":
        from myconvnet_tpu.eval.retrieval import RetrievalEvaluator
        return RetrievalEvaluator(cfg.get("recall_k", 1))
    if cfg["task"] == "sr":
        from myconvnet_tpu.eval.image_metrics import PairedImageEvaluator
        return PairedImageEvaluator(cfg.get("sr_metric", "psnr"))
    if cfg["task"] == "segmentation":
        return MeanIoUEvaluator(cfg["num_classes"],
                                cfg.get("ignore_label", 255))
    if cfg["task"] == "detection":
        from myconvnet_tpu.eval.detection import (
            COCOMaskMeanAPEvaluator, COCOMeanAPEvaluator,
            MaskMeanAPEvaluator, MeanAPEvaluator)
        coco_style = cfg.get("map_style", "voc") == "coco"
        fam = getattr(models.get_model(cfg.get("model", "ssd300")),
                      "family", "")
        if fam == "two_stage_mask":  # score MASK overlap, not boxes
            if coco_style:
                return COCOMaskMeanAPEvaluator(cfg["num_classes"])
            return MaskMeanAPEvaluator(cfg["num_classes"],
                                       iou_threshold=cfg.get("map_iou",
                                                             0.5))
        if fam == "two_stage_panoptic":  # score PQ over merged segments
            from myconvnet_tpu.eval.panoptic import \
                PanopticQualityEvaluator
            return PanopticQualityEvaluator(
                cfg["num_classes"],
                cfg.get("model_kwargs", {}).get("num_stuff", 2),
                stuff_min_area=cfg.get("stuff_min_area", 64),
                score_threshold=cfg.get("panoptic_score", 0.5))
        if fam == "two_stage_kp":    # score OKS, not box IoU
            from myconvnet_tpu.eval.detection import (
                COCOKeypointMeanAPEvaluator, KeypointMeanAPEvaluator)
            from myconvnet_tpu.subsets.coco import COCO_KP_SIGMAS
            k = resolve_num_keypoints(cfg)
            sig = cfg.get("kp_sigmas",
                          COCO_KP_SIGMAS if k == len(COCO_KP_SIGMAS)
                          else None)
            if coco_style:
                return COCOKeypointMeanAPEvaluator(cfg["num_classes"],
                                                   sigmas=sig)
            return KeypointMeanAPEvaluator(
                cfg["num_classes"], sigmas=sig,
                iou_threshold=cfg.get("map_iou", 0.5))
        if coco_style:
            return COCOMeanAPEvaluator(cfg["num_classes"])
        return MeanAPEvaluator(cfg["num_classes"],
                               iou_threshold=cfg.get("map_iou", 0.5))
    return AccuracyEvaluator()


def make_detection_sources(cfg: dict, synthetic: bool,
                           splits=("train", "val")):
    """Detection sources (VOC Annotations/*.xml layout, COCO instances
    JSON, or synthetic rectangles; subsets/voc.py, subsets/coco.py)."""
    data_dir = cfg.get("data_dir")
    hw = tuple(cfg.get("input_hw", voc.DET_IMAGE_HW))
    if cfg["dataset"] == "voc":
        return [voc.make_detection_source(
            data_dir, split, synthetic=synthetic or data_dir is None,
            raw_hw=hw, max_boxes=cfg.get("max_boxes", voc.MAX_BOXES))
            for split in splits]
    if cfg["dataset"] == "coco":
        from myconvnet_tpu.subsets import coco
        split_map = dict(zip(("train", "val"),
                             cfg.get("coco_splits",
                                     ("train2017", "val2017"))))
        return [coco.make_detection_source(
            data_dir, split_map.get(split, split),
            synthetic=synthetic or data_dir is None, raw_hw=hw,
            max_boxes=cfg.get("max_boxes", 100))
            for split in splits]
    raise ValueError(f"detection dataset {cfg['dataset']!r}; "
                     "valid: ['voc', 'coco']")


def resolve_num_keypoints(cfg: dict) -> int:
    """The keypoint count the BUILT MODEL will use: the model_kwargs
    override when present, else the model function's own default —
    evaluator, sources and augmentation must all agree with the model,
    not with a blanket 17."""
    mk = cfg.get("model_kwargs", {}) or {}
    if "num_keypoints" in mk:
        return int(mk["num_keypoints"])
    import inspect
    fn = models.get_model(cfg.get("model", "keypoint_rcnn"))
    p = inspect.signature(fn).parameters.get("num_keypoints")
    if p is None or p.default is inspect.Parameter.empty:
        raise ValueError(f"model {cfg.get('model')!r} exposes no "
                         "num_keypoints; set model_kwargs.num_keypoints")
    return int(p.default)


def _take_mask_channel(logits, labels):
    """Per-detection mask probabilities: read each detection's own
    class channel from the mask head's [B,D,p,p,C-1] logits — shared
    by every predict/serving chain of the mask-bearing families so the
    eval and export paths cannot drift."""
    import jax.numpy as jnp
    ch = jnp.clip(labels.astype(jnp.int32) - 1, 0, logits.shape[-1] - 1)
    z = jnp.take_along_axis(
        logits, ch[:, :, None, None, None], axis=-1)[..., 0]
    return jax.nn.sigmoid(z)


def _upsample_sem_argmax(sem_logits, hw):
    """Semantic argmax nearest-expanded to full resolution (integer
    scale factors, exact)."""
    import jax.numpy as jnp
    sem = sem_logits.argmax(-1).astype(jnp.int32)
    return jnp.repeat(jnp.repeat(sem, hw[0] // sem.shape[1], 1),
                      hw[1] // sem.shape[2], 2)


def make_keypoint_sources(cfg: dict, synthetic: bool):
    """Keypoint sources (COCO person_keypoints layout or synthetic
    corner-marker rectangles; subsets/coco.py).  Batches are
    (images, boxes, labels, keypoints) quadruplets."""
    from myconvnet_tpu.subsets import coco as coco_lib
    data_dir = cfg.get("data_dir")
    hw = tuple(cfg.get("input_hw", (512, 512)))
    k = resolve_num_keypoints(cfg)
    splits = (cfg.get("train_split", "train2017"),
              cfg.get("val_split", "val2017"))
    return [coco_lib.make_keypoint_source(
        data_dir, split, synthetic=synthetic or data_dir is None,
        raw_hw=hw, max_boxes=cfg.get("max_boxes", 32), num_keypoints=k)
        for split in splits]


def make_instance_sources(cfg: dict, synthetic: bool,
                          splits=("train", "val")):
    """Instance-segmentation sources (VOC SegmentationObject layout or
    synthetic rectangles with exact instance maps; subsets/voc.py).
    Batches are (images, boxes, labels, inst_map) quadruplets."""
    data_dir = cfg.get("data_dir")
    hw = tuple(cfg.get("input_hw", (512, 512)))
    if cfg["dataset"] != "voc":
        raise ValueError(f"instance dataset {cfg['dataset']!r}; "
                         "valid: ['voc'] (SegmentationObject layout)")
    return [voc.make_instance_source(
        data_dir, split, synthetic=synthetic or data_dir is None,
        raw_hw=hw, max_boxes=cfg.get("max_boxes", voc.MAX_BOXES))
        for split in splits]


def build_detector(cfg: dict, synthetic: bool = False, mesh=None):
    """Detection recipe wiring (the fourth task family, built like
    build_gan: a self-contained state + ONE fused jitted step).

    ``mesh``: a (data, model) Mesh — params are placed per the standard
    sharding rules (wide heads may shard over the model axis, everything
    else replicated — the reference's tower semantics) and GSPMD turns
    the fused step data-parallel when the caller shards the batch
    (parallel.shard_batch; run_detection wires this through the
    prefetcher's device_put_fn).

    Returns (state, step_fn, predict_fn, train_set, val_set).
    ``step_fn`` folds uint8->normalize + box-aware random hflip into the
    program (train/detection.preprocess_batch); ``predict_fn(state,
    images_uint8)`` is the fused eval chain — normalize -> forward ->
    decode+NMS — returning (boxes, scores, labels, valid) ready for
    MeanAPEvaluator.update.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.train import detection as det_lib

    (net, anchors, focal_head, post, mean, std, hw,
     two_stage) = _detector_chain(cfg)
    num_classes = cfg["num_classes"]
    aug = cfg.get("augment", {}) or {}
    opt = make_optimizer(cfg["optimizer"])
    state = det_lib.init_det_state(
        net, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((cfg["batch_size"], *hw, 3)), num_classes)
    if cfg.get("pretrained"):
        # detection warm start (the paper workflow: ImageNet backbone,
        # fresh heads): pretrained=dict(path=..., arch="vgg16"|"resnet",
        # prefix="backbone/", depth=50)
        from myconvnet_tpu.models.pretrained import (
            import_torch_resnet_file, import_torch_vgg16_file)
        pcfg = dict(cfg["pretrained"])
        arch = pcfg.get("arch",
                        "vgg16" if "ssd" in cfg.get("model", "ssd300")
                        else "resnet")
        if arch == "vgg16":
            new_p, new_s = import_torch_vgg16_file(
                pcfg["path"], state.params, state.state,
                prefix=pcfg.get("prefix", "backbone/"))
        else:
            new_p, new_s = import_torch_resnet_file(
                pcfg["path"], state.params, state.state,
                depth=int(pcfg.get("depth", 50)), load_head=False,
                prefix=pcfg.get("prefix", "backbone/"))
        state = state._replace(params=new_p, state=new_s)
        print(f"warm-started detector backbone from {pcfg['path']}")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from myconvnet_tpu.parallel import param_sharding
        rep = NamedSharding(mesh, PartitionSpec())
        state = state._replace(
            params=jax.tree.map(jax.device_put, state.params,
                                param_sharding(mesh, state.params)),
            state=jax.device_put(state.state, rep),
            opt=jax.device_put(state.opt, rep),
            step=jax.device_put(state.step, rep),
            rng=jax.device_put(state.rng, rep))
    det_aug = det_lib.DetAugment(
        hflip=aug.get("flip", aug.get("hflip", True)),
        mosaic_prob=aug.get("mosaic_prob", 0.0),
        expand_prob=aug.get("expand_prob", 0.0),
        expand_max=aug.get("expand_max", 4.0),
        iou_crop=aug.get("iou_crop", False),
        iou_menu=tuple(aug.get("iou_menu",
                               det_lib.DetAugment._field_defaults[
                                   "iou_menu"])),
        crop_candidates=aug.get("crop_candidates", 8),
        scale_range=tuple(aug.get("scale_range", (0.3, 1.0))),
        aspect_range=tuple(aug.get("aspect_range", (0.5, 2.0))),
        brightness=aug.get("brightness", 0.0),
        contrast=aug.get("contrast", 0.0),
        saturation=aug.get("saturation", 0.0),
        hue=aug.get("hue", 0.0),
        mean=mean, std=std)
    if two_stage == "two_stage_panoptic":
        from myconvnet_tpu.subsets.voc import make_panoptic_source
        from myconvnet_tpu.train import rcnn as rcnn_lib
        step = jax.jit(rcnn_lib.make_panoptic_step(
            net, opt, anchors, num_classes, augment=det_aug,
            sem_weight=cfg.get("sem_weight", 0.5),
            rpn_pos_iou=cfg.get("rpn_pos_iou", 0.7),
            rpn_neg_iou=cfg.get("rpn_neg_iou", 0.3),
            rpn_samples=cfg.get("rpn_samples", 256)))

        @jax.jit
        def predict(st, images):
            # detect -> masks on the post-NMS boxes (trunk CSEd) +
            # the semantic argmax nearest-expanded to full resolution
            # (integer scale, exact)
            x, _ = det_lib.preprocess_batch(
                images, jnp.zeros((1, 1, 4)), None, mean=mean, std=std)
            out, _ = net.apply(st.params, st.state, None, x,
                               num_classes, train=False)
            boxes, scores, labels, valid = post(out)
            logits, _ = net.apply(st.params, st.state, None, x,
                                  num_classes, mask_rois=boxes)
            return (boxes, scores, labels, valid,
                    _take_mask_channel(logits, labels),
                    _upsample_sem_argmax(out.sem_logits,
                                         images.shape[1:3]))

        if cfg["dataset"] != "voc":
            raise ValueError(f"panoptic dataset {cfg['dataset']!r}; "
                             "valid: ['voc'] (SegmentationObject + "
                             "SegmentationClass pairing)")
        srcs = [make_panoptic_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            raw_hw=hw, max_boxes=cfg.get("max_boxes", 64))
            for split in ("train", "val")]
        return (state, step, predict, DataSet(srcs[0]),
                DataSet(srcs[1]))
    if two_stage == "two_stage_kp":
        from myconvnet_tpu.train import rcnn as rcnn_lib
        k = resolve_num_keypoints(cfg)
        use_synth = synthetic or cfg.get("data_dir") is None
        if "flip_perm" in cfg:
            flip_perm = tuple(cfg["flip_perm"])
            if len(flip_perm) != k:
                raise ValueError(f"flip_perm has {len(flip_perm)} "
                                 f"entries for {k} keypoints")
        elif k == 17:
            from myconvnet_tpu.subsets.coco import COCO_KP_FLIP_PERM
            flip_perm = COCO_KP_FLIP_PERM
        elif use_synth and k == 4:
            flip_perm = (1, 0, 3, 2)  # the synthetic corner markers
        elif det_aug.hflip:
            # a silent identity permutation would mislabel left/right
            # channels on every flipped image — demand an explicit one
            raise ValueError(
                f"augment.flip with a {k}-keypoint skeleton needs an "
                "explicit flip_perm= in the config (or flip=False)")
        else:
            flip_perm = None
        step = jax.jit(rcnn_lib.make_keypoint_rcnn_step(
            net, opt, anchors, num_classes, augment=det_aug,
            flip_perm=flip_perm,
            rpn_pos_iou=cfg.get("rpn_pos_iou", 0.7),
            rpn_neg_iou=cfg.get("rpn_neg_iou", 0.3),
            rpn_samples=cfg.get("rpn_samples", 256)))

        @jax.jit
        def predict(st, images):
            # detect, then the keypoint branch on the POST-NMS boxes
            # (kp_rois= mode; trunk CSEd inside one jit), argmax-decoded
            # to normalized image coordinates
            x, _ = det_lib.preprocess_batch(
                images, jnp.zeros((1, 1, 4)), None, mean=mean, std=std)
            out, _ = net.apply(st.params, st.state, None, x,
                               num_classes, train=False)
            boxes, scores, labels, valid = post(out)
            logits, _ = net.apply(st.params, st.state, None, x,
                                  num_classes, kp_rois=boxes)
            kps = rcnn_lib.decode_keypoints(logits, boxes)
            return boxes, scores, labels, valid, kps

        train_src, val_src = make_keypoint_sources(
            dict(cfg, input_hw=hw), synthetic)
        return state, step, predict, DataSet(train_src), DataSet(val_src)
    if two_stage == "two_stage_mask":
        from myconvnet_tpu.train import rcnn as rcnn_lib
        step = jax.jit(rcnn_lib.make_mask_rcnn_step(
            net, opt, anchors, num_classes, augment=det_aug,
            rpn_pos_iou=cfg.get("rpn_pos_iou", 0.7),
            rpn_neg_iou=cfg.get("rpn_neg_iou", 0.3),
            rpn_samples=cfg.get("rpn_samples", 256)))

        @jax.jit
        def predict(st, images):
            # detect, then re-run the mask branch on the POST-NMS boxes
            # (the Detectron convention).  Both net.apply calls sit in
            # one jit over the same params + input, so XLA CSEs the
            # shared trunk — the mask pass costs only its own branch.
            x, _ = det_lib.preprocess_batch(
                images, jnp.zeros((1, 1, 4)), None, mean=mean, std=std)
            out, _ = net.apply(st.params, st.state, None, x,
                               num_classes, train=False)
            boxes, scores, labels, valid = post(out)
            logits, _ = net.apply(st.params, st.state, None, x,
                                  num_classes, mask_rois=boxes)
            return (boxes, scores, labels, valid,
                    _take_mask_channel(logits, labels))

        train_src, val_src = make_instance_sources(
            dict(cfg, input_hw=hw), synthetic)
        return state, step, predict, DataSet(train_src), DataSet(val_src)
    if two_stage == "fcos":
        from myconvnet_tpu.train import fcos as fcos_lib
        points, bands = anchors
        step = jax.jit(fcos_lib.make_fcos_step(
            net, opt, points, bands, num_classes, augment=det_aug,
            alpha=cfg.get("focal_alpha", 0.25),
            gamma=cfg.get("focal_gamma", 2.0),
            reg_weight=cfg.get("reg_weight", 1.0)))

        @jax.jit
        def predict(st, images):
            x, _ = det_lib.preprocess_batch(
                images, jnp.zeros((1, 1, 4)), None, mean=mean, std=std)
            out, _ = net.apply(st.params, st.state, None, x,
                               num_classes, train=False)
            return post(*out)

        train_src, val_src = make_detection_sources(
            dict(cfg, input_hw=hw), synthetic)
        return state, step, predict, DataSet(train_src), DataSet(val_src)
    if two_stage:
        from myconvnet_tpu.train import rcnn as rcnn_lib
        step = jax.jit(rcnn_lib.make_rcnn_step(
            net, opt, anchors, num_classes, augment=det_aug,
            rpn_pos_iou=cfg.get("rpn_pos_iou", 0.7),
            rpn_neg_iou=cfg.get("rpn_neg_iou", 0.3),
            rpn_samples=cfg.get("rpn_samples", 256)))

        @jax.jit
        def predict(st, images):
            x, _ = det_lib.preprocess_batch(
                images, jnp.zeros((1, 1, 4)), None, mean=mean, std=std)
            out, _ = net.apply(st.params, st.state, None, x,
                               num_classes, train=False)
            return post(out)

        train_src, val_src = make_detection_sources(
            dict(cfg, input_hw=hw), synthetic)
        return state, step, predict, DataSet(train_src), DataSet(val_src)
    if focal_head:
        from functools import partial
        loss_fn = partial(det_lib.focal_det_loss,
                          alpha=cfg.get("focal_alpha", 0.25),
                          gamma=cfg.get("focal_gamma", 2.0),
                          pos_threshold=cfg.get("match_iou", 0.5),
                          neg_threshold=cfg.get("neg_iou", 0.4),
                          loc_loss_kind=cfg.get("loc_loss", "smooth_l1"),
                          giou_weight=cfg.get("giou_weight", 2.0))
    else:
        loss_fn = None  # make_detection_step's multibox default
    step = jax.jit(det_lib.make_detection_step(
        net, opt, anchors, num_classes,
        iou_threshold=cfg.get("match_iou", 0.5),
        neg_pos_ratio=cfg.get("neg_pos_ratio", 3.0),
        augment=det_aug, loss_fn=loss_fn))

    @jax.jit
    def predict(st, images):
        x, _ = det_lib.preprocess_batch(images, jnp.zeros((1, 1, 4)),
                                        None, mean=mean, std=std)
        (cls_logits, loc), _ = net.apply(st.params, st.state, None, x,
                                         num_classes, train=False)
        return post(cls_logits, loc)

    train_src, val_src = make_detection_sources(dict(cfg, input_hw=hw),
                                                synthetic)
    return state, step, predict, DataSet(train_src), DataSet(val_src)


def _detector_chain(cfg: dict):
    """Shared recipe resolution for the detection family — ONE source
    of truth for the architecture, anchor grid, head convention,
    postprocess knobs and normalization stats, used by BOTH
    build_detector (training/eval) and make_detector_inference
    (export/serving) so the serving artifact can never silently drift
    from the eval chain.

    Returns (net, anchors, focal_head, post, mean, std, input_hw,
    two_stage).  For the two-stage family (models/faster_rcnn.py,
    ``model_fn.family == "two_stage"``) ``anchors`` is the RPN grid,
    ``post`` consumes the model's FRCNNOut, and ``net.apply`` accepts
    the extra ``gt_boxes``/``gt_labels`` kwargs train/rcnn.py passes.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from myconvnet_tpu.ops.boxes import retina_anchors, ssd_anchors
    from myconvnet_tpu.train import detection as det_lib

    model_fn = models.get_model(cfg.get("model", "ssd300"))
    policy = get_policy(cfg.get("precision", "f32"))
    kwargs = dict(cfg.get("model_kwargs", {}))
    num_classes = cfg["num_classes"]
    # "" (anchored one-stage) / "fcos" (anchor-free) / "two_stage*" —
    # returned in the two_stage slot; the two-stage families and fcos
    # are truthy strings, so `if two_stage:` consumers that only need
    # "not the plain SSD/Retina path" keep working
    two_stage = getattr(model_fn, "family", "")
    if not two_stage.startswith("two_stage") and two_stage != "fcos":
        two_stage = ""

    def fwd(x, n, train=False, **det_kw):
        with policy_scope(policy):
            return model_fn(x, n, train=train, **det_kw, **kwargs)

    net = transform(fwd)
    # the anchor grid + input size + head convention are properties of
    # the detector architecture (models/ssd.py, models/retinanet.py,
    # models/faster_rcnn.py attach them to the model fn)
    if two_stage == "fcos":
        from myconvnet_tpu.models.fcos import fcos_points
        from myconvnet_tpu.train import fcos as fcos_lib
        pts, bands, _strides = fcos_points(model_fn.point_spec)
        # "anchors" carries (points, ranges) for the fcos step builder
        anchors = (jnp.asarray(pts), jnp.asarray(bands))
        post = fcos_lib.make_fcos_postprocess(
            anchors[0], num_classes,
            score_threshold=cfg.get("score_threshold", 0.05),
            iou_threshold=cfg.get("nms_iou", 0.45),
            max_detections=cfg.get("max_detections", 100),
            pre_nms_topk=cfg.get("pre_nms_topk", 1000))
        focal = False
    elif two_stage:
        from myconvnet_tpu.train import rcnn as rcnn_lib
        anchors = jnp.asarray(retina_anchors(model_fn.rpn_spec))
        post = rcnn_lib.make_rcnn_postprocess(
            num_classes,
            score_threshold=cfg.get("score_threshold", 0.05),
            iou_threshold=cfg.get("nms_iou", 0.5),
            max_detections=cfg.get("max_detections", 100),
            pre_nms_topk=cfg.get("pre_nms_topk", 1000))
        focal = False
    else:
        if getattr(model_fn, "anchor_kind", "ssd") == "retina":
            anchors = jnp.asarray(retina_anchors(model_fn.anchor_spec))
        else:
            anchors = jnp.asarray(ssd_anchors(model_fn.anchor_spec))
        focal = getattr(model_fn, "head", "softmax") == "sigmoid_focal"
        post = det_lib.make_postprocess(
            anchors, num_classes,
            score_threshold=cfg.get("score_threshold", 0.05),
            iou_threshold=cfg.get("nms_iou", 0.45),
            max_detections=cfg.get("max_detections", 100),
            score_activation="sigmoid" if focal else "softmax",
            pre_nms_topk=cfg.get("pre_nms_topk", 1000))
    aug = cfg.get("augment", {}) or {}
    mean = tuple(aug.get("mean", IMAGENET_MEAN))
    std = tuple(aug.get("std", IMAGENET_STD))
    hw = tuple(cfg.get("input_hw", model_fn.input_hw))
    return net, anchors, focal, post, mean, std, hw, two_stage


def make_detector_inference(cfg: dict, state, *, int8: bool = False,
                            calibrate_with=None):
    """Rebuild a detection recipe's fused eval chain as a pure
    ``fn(images01 [B,H,W,3] float) -> (boxes, scores, labels, valid)``
    with the weights closed over — the export/serving form.

    ``int8=True`` traces the backbone's convs through the int8 MXU path
    (core.quantize, same machinery as classifier serving);
    ``calibrate_with`` (an iterable of [0,1]-float batches) bakes
    static activation scales for deterministic latency.  Normalization
    is folded in — feed RAW [0,1] images.  The whole chain comes from
    :func:`_detector_chain`, the same resolution build_detector uses.
    """
    import jax.numpy as jnp

    (net, _anchors, _focal, post, mean, std, _hw,
     two_stage) = _detector_chain(cfg)
    num_classes = cfg["num_classes"]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    scales = None
    if int8 and calibrate_with is not None:
        from myconvnet_tpu.core.quantize import calibration_scope
        scales = {}
        with calibration_scope(scales):
            for batch in calibrate_with:
                net.apply(state.params, state.state, None,
                          (jnp.asarray(batch) - mean) / std,
                          num_classes, train=False)

    def fn(x):
        x = (jnp.asarray(x, jnp.float32) - mean) / std
        from contextlib import nullcontext
        if int8:
            from myconvnet_tpu.core.quantize import int8_scope
            scope = lambda: int8_scope(scales=scales)  # noqa: E731
        else:
            scope = nullcontext
        with scope():
            out, _ = net.apply(state.params, state.state, None, x,
                               num_classes, train=False)
        if not two_stage or two_stage == "fcos":
            return post(*out)  # (cls, loc) or fcos's (cls, ctr, dists)
        dets = post(out)
        boxes, _scores, labels, _valid = dets
        if two_stage == "two_stage_kp":
            # keypoint family: the kp branch on post-NMS boxes, decoded
            from myconvnet_tpu.train import rcnn as rcnn_lib
            with scope():
                logits, _ = net.apply(state.params, state.state, None,
                                      x, num_classes, kp_rois=boxes)
            return (*dets, rcnn_lib.decode_keypoints(logits, boxes))
        if two_stage not in ("two_stage_mask", "two_stage_panoptic"):
            return dets
        # mask/panoptic families: re-run the mask branch on the
        # post-NMS boxes (trunk CSEd inside one jit) and serve
        # per-detection masks (+ the full-res semantic map)
        with scope():
            logits, _ = net.apply(state.params, state.state, None, x,
                                  num_classes, mask_rois=boxes)
        masks = _take_mask_channel(logits, labels)
        if two_stage == "two_stage_panoptic":
            return (*dets, masks,
                    _upsample_sem_argmax(out.sem_logits, x.shape[1:3]))
        return (*dets, masks)

    return fn


def evaluate_detection(state, predict, val_set: DataSet, batch_size: int,
                       evaluator, mesh=None) -> float:
    """Score a detection state on a val split: predict every batch, feed
    MeanAPEvaluator, return mAP.  The tail batch is padded up to
    ``batch_size`` (one compiled shape) and its padding sliced back off
    before scoring — no example dropped, no recompile.  With ``mesh``
    the padded batch is sharded over the data axis so eval scales like
    training."""
    evaluator.reset()
    # targets are (gt_boxes, gt_labels) for detection sources and
    # (gt_boxes, gt_labels, gt_inst) for instance-mask sources — the
    # evaluator's update contract follows the source family
    for images, *targets in val_set.eval_iter(batch_size, prefetch=0):
        images = np.asarray(images)
        n = len(images)
        if n < batch_size:
            pad = batch_size - n
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]),
                                  images.dtype)])
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            images = shard_batch(mesh, (images,))[0]
        preds = [np.asarray(t)[:n] for t in predict(state, images)]
        evaluator.update(preds, tuple(np.asarray(t) for t in targets))
    return evaluator.score()



def _gan_generator(cfg: dict):
    """The transformed generator for a GAN config — the single source of
    truth shared by build_gan (training) and make_gan_sampler
    (visualization/generate.py), so restored states always apply."""
    kind = cfg.get("gan_kind", "dcgan")
    policy = get_policy(cfg.get("precision", "f32"))
    size = cfg.get("image_size", 32)
    gkw = cfg.get("generator_kwargs", {})
    fwd_of = {
        "dcgan": lambda z, train=False: models.dcgan_generator(
            z, train=train, image_size=size, **gkw),
        "pix2pix": lambda x, train=False: models.unet_generator(
            x, train=train, **gkw),
        "cyclegan": lambda x, train=False: models.resnet_generator(
            x, train=train, **gkw),
        # SRGAN: mean-subtracted [0,1] LR -> [0,1] HR (SRResNet +
        # channel mean, the same forward shape as build_sr's wrapper so
        # g_pretrain checkpoints graft directly)
        "srgan": lambda x, train=False: models.srresnet(
            x, train=train,
            **{"scale": int(cfg.get("scale", 4)), **gkw})
        + jax.numpy.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                            x.dtype),
    }
    if kind not in fwd_of:
        raise ValueError(f"unknown gan kind {kind!r}")
    fwd = fwd_of[kind]

    def g_fwd(x, train=False):
        with policy_scope(policy):
            return fwd(x, train=train)

    return transform(g_fwd)


def build_gan(cfg: dict, synthetic: bool = False):
    """Returns (state, step_fn, data_iter_fn, kind)."""
    kind = cfg.get("gan_kind", "dcgan")
    policy = get_policy(cfg.get("precision", "f32"))
    size = cfg.get("image_size", 32)
    batch = cfg["batch_size"]

    if kind == "dcgan":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(x, train=False):
            with policy_scope(policy):
                return models.dcgan_discriminator(x, train=train, **dkw)

        gen, disc = _gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        latent = cfg.get("latent_dim", 100)
        import jax.numpy as jnp
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            jnp.zeros((batch, latent)), (jnp.zeros((batch, size, size, 3)),))
        step = gan_lib.make_dcgan_step(gen, disc, g_opt, d_opt, latent,
                                       gan_loss=cfg.get(
                                           "gan_loss", "nonsaturating"))

        def data_iter():
            if cfg["dataset"] == "cifar10":
                src = cifar10.make_source(cfg.get("data_dir"), "train",
                                          synthetic=synthetic or
                                          cfg.get("data_dir") is None)
            else:
                raise ValueError(f"dcgan dataset {cfg['dataset']!r}")
            ds = DataSet(src)
            for x, _ in ds.train_iter(batch):
                yield (np.float32(x) / 127.5 - 1.0
                       if isinstance(x, np.ndarray)
                       else x.astype("float32") / 127.5 - 1.0)

        return state, step, data_iter, kind

    if kind == "pix2pix":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(a, b, train=False):
            with policy_scope(policy):
                return models.patchgan_discriminator(a, b, train=train,
                                                     **dkw)

        gen, disc = _gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        import jax.numpy as jnp
        x0 = jnp.zeros((batch, size, size, 3))
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            x0, (x0, x0))
        step = gan_lib.make_pix2pix_step(gen, disc, g_opt, d_opt,
                                         cfg.get("l1_weight", 100.0),
                                         gan_loss=cfg.get(
                                             "gan_loss", "nonsaturating"))

        def data_iter():
            from myconvnet_tpu.subsets import pairs
            src = pairs.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size))
            ds = DataSet(src, seed=cfg.get("seed", 0))
            for a, b in ds.train_iter(batch):
                # rescale WITHOUT leaving the device: np.asarray here
                # would round-trip every prefetched batch back to host
                a = a.astype("float32") / 127.5 - 1.0
                b = b.astype("float32") / 127.5 - 1.0
                yield (a, b)

        return state, step, data_iter, kind

    if kind == "srgan":
        # super-resolution GAN (Ledig et al.): the pix2pix fused
        # dual-optimizer step with an UNCONDITIONAL discriminator (D
        # scores HR images only — the LR input argument is ignored) and
        # a pixel content loss (l1_weight >> adversarial, the paper's
        # weighting).  Data: one unlabeled HR stream; LR synthesized by
        # exact area downsample.  Value space matches the SR task
        # family (mean-subtracted [0,1] in, [0,1] out) so a generator
        # pretrained via build_sr(model='srresnet') warm-starts
        # directly (cfg['g_pretrain'] = that checkpoint dir — the
        # paper's SRResNet-then-adversarial schedule).
        from myconvnet_tpu.models.sr import area_downsample
        dkw = cfg.get("discriminator_kwargs", {})
        scale = int(cfg.get("scale", 4))
        hr_size = int(cfg.get("hr_size", size))
        if hr_size % scale:
            raise ValueError(f"hr_size {hr_size} % scale {scale} != 0")
        lr_size = hr_size // scale
        import jax.numpy as jnp
        sr_mean = jnp.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                              jnp.float32)

        def d_fwd(a, b, train=False):
            del a  # unconditional: D never sees the LR input
            with policy_scope(policy):
                return models.sr_discriminator(b, train=train, **dkw)

        gen, disc = _gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        lr0 = jnp.zeros((batch, lr_size, lr_size, 3))
        hr0 = jnp.zeros((batch, hr_size, hr_size, 3))
        state = gan_lib.init_gan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            lr0, (lr0, hr0))
        if cfg.get("g_pretrain"):
            # warm-start the generator from a build_sr checkpoint
            # (same transform scopes + value space; shape-validated)
            import warnings

            from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
            with warnings.catch_warnings():
                # the SR checkpoint legitimately carries optimizer
                # state/step the graft has no slot for — the unused-key
                # warning targets architecture drift, not warm-starts
                warnings.filterwarnings(
                    "ignore", message=".*entries the target has no slot")
                restored = ckpt_lib.restore_checkpoint(
                    cfg["g_pretrain"], {"params": state.g_params,
                                        "model_state": state.g_state})
            state = state._replace(g_params=restored["params"],
                                   g_state=restored["model_state"])
        step = gan_lib.make_pix2pix_step(
            gen, disc, g_opt, d_opt, cfg.get("l1_weight", 1000.0),
            gan_loss=cfg.get("gan_loss", "nonsaturating"))

        def data_iter():
            from myconvnet_tpu.data.augment import batched_crop_resize
            from myconvnet_tpu.subsets import images as images_mod
            src = images_mod.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                decode_mode="native_crop")
            ds = DataSet(src, seed=cfg.get("seed", 0))

            @jax.jit
            def prep(key, x_u8):
                # per-image random HR crops + hflips on device, then
                # the shared exact area downsample — same transform
                # family as build_sr's train_fn
                n, ih, iw, _ = x_u8.shape
                k_y, k_x, k_f = jax.random.split(key, 3)
                y0 = jax.random.randint(k_y, (n,), 0,
                                        max(ih - hr_size, 0) + 1)
                x0 = jax.random.randint(k_x, (n,), 0,
                                        max(iw - hr_size, 0) + 1)
                boxes = jnp.stack(
                    [y0.astype(jnp.float32), x0.astype(jnp.float32),
                     jnp.full((n,), float(hr_size)),
                     jnp.full((n,), float(hr_size))], axis=1)
                flip = jax.random.bernoulli(k_f, 0.5, (n,))
                hr01 = batched_crop_resize(x_u8, boxes,
                                           (hr_size, hr_size),
                                           flip) / 255.0
                return area_downsample(hr01, scale) - sr_mean, hr01

            root = jax.random.key(cfg.get("seed", 0))
            for i, (x, _) in enumerate(ds.train_iter(batch)):
                yield prep(jax.random.fold_in(root, i), x)

        return state, step, data_iter, kind

    if kind == "cyclegan":
        dkw = cfg.get("discriminator_kwargs", {})

        def d_fwd(x, train=False):
            with policy_scope(policy):
                return models.patchgan_discriminator(x, train=train,
                                                     norm="instance",
                                                     **dkw)

        gen, disc = _gan_generator(cfg), transform(d_fwd)
        g_opt = make_optimizer(cfg["g_optimizer"])
        d_opt = make_optimizer(cfg["d_optimizer"])
        import jax.numpy as jnp
        x0 = jnp.zeros((batch, size, size, 3))
        state = gan_lib.init_cyclegan_state(
            gen, disc, g_opt, d_opt, jax.random.key(cfg.get("seed", 0)),
            x0)
        step = gan_lib.make_cyclegan_step(
            gen, disc, g_opt, d_opt,
            cycle_weight=cfg.get("cycle_weight", 10.0),
            identity_weight=cfg.get("identity_weight", 0.5),
            gan_loss=cfg.get("gan_loss", "lsgan"))

        def data_iter():
            from myconvnet_tpu.subsets import pairs
            # unpaired domains ride the pairs source (two-dir layout or
            # synthetic); paired=False zips the pools by order, so the
            # A/B files need not share names
            src = pairs.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size), paired=False)
            ds = DataSet(src, seed=cfg.get("seed", 0))
            for a, b in ds.train_iter(batch):
                yield (a.astype("float32") / 127.5 - 1.0,
                       b.astype("float32") / 127.5 - 1.0)

        return state, step, data_iter, kind

    raise ValueError(f"unknown gan kind {kind!r}")


def make_gan_sampler(cfg: dict):
    """Sampling closure for in-run visualization and generate.py.

    dcgan: ``sample(state, n, seed) -> uint8 [n,H,W,3]`` from fresh
    latents.  pix2pix: ``sample(state, x) -> uint8`` translating input
    images.  cyclegan adds ``direction="ab"|"ba"``.  Shares the
    generator transform with build_gan (_gan_generator), so restored
    states apply cleanly.
    """
    from myconvnet_tpu.utils.images import to_uint8
    kind = cfg.get("gan_kind", "dcgan")
    gen = _gan_generator(cfg)

    if kind == "dcgan":
        def sample(state, n: int = 64, seed: int = 0):
            z = jax.random.normal(jax.random.key(seed),
                                  (n, cfg.get("latent_dim", 100)))
            imgs, _ = gen.apply(state.g_params, state.g_state, None, z,
                                False)
            return to_uint8(imgs)
    elif kind in ("pix2pix", "srgan"):
        # pix2pix lives in tanh [-1,1] space; srgan in the SR family's
        # [0,1] space (sample input = mean-subtracted [0,1] LR)
        vrange = (0.0, 1.0) if kind == "srgan" else (-1.0, 1.0)

        def sample(state, x):
            imgs, _ = gen.apply(state.g_params, state.g_state, None,
                                jax.numpy.asarray(x), False)
            return to_uint8(imgs, vrange)
    else:  # cyclegan (unknown kinds rejected by _gan_generator)
        def sample(state, x, direction: str = "ab"):
            imgs, _ = gen.apply(state.g_params[direction],
                                state.g_state[direction], None,
                                jax.numpy.asarray(x), False)
            return to_uint8(imgs)

    return sample


# ------------------------------------------------- super-resolution (sr)

def build_sr(cfg: dict, synthetic: bool = False,
             ckpt_dir: str | None = None, log_dir: str | None = None,
             mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Super-resolution recipe wiring (sixth task family).

    One UNLABELED image stream trains the net: the train transform
    crops an HR patch on device, synthesizes the LR input with an exact
    area (box-mean) downsample — scale must divide the patch — and
    returns ``(lr - mean, hr)``; the model forward adds the mean back,
    so predictions live in [0, 1] and the PSNR/SSIM evaluator scores
    them directly against the HR target.  Same ConvNet surface as every
    supervised family (train/predict/save/restore), via the
    ``augment_fns`` override.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import batched_crop_resize
    from myconvnet_tpu.models.sr import area_downsample, center_crop_hw
    from myconvnet_tpu.train.losses import l1_loss

    scale = int(cfg.get("scale", 4))
    hr = int(cfg.get("hr_size", 192))
    if hr % scale:
        raise ValueError(f"hr_size {hr} not divisible by scale {scale}")
    lr = hr // scale
    # SR corpora decode at native resolution (crop, never cover-resize:
    # resampling would low-pass the HR detail the task learns) at a
    # frame size that must fit the HR patch
    cfg = dict(cfg)
    cfg.setdefault("decode_mode", "native_crop")
    cfg.setdefault("raw_hw", (max(256, hr), max(256, hr)))
    raw_h, raw_w = cfg["raw_hw"]
    if raw_h < hr or raw_w < hr:
        raise ValueError(f"raw_hw {cfg['raw_hw']} smaller than hr_size "
                         f"{hr}: the decoded frame cannot contain one "
                         "HR patch")
    mean = jnp.asarray(cfg.get("mean", (0.4488, 0.4371, 0.4040)),
                       jnp.float32)  # DIV2K channel means
    model_fn = models.get_model(cfg["model"])
    mkw = dict(cfg.get("model_kwargs", {}))
    mkw.setdefault("scale", scale)

    def sr_forward(x, num_classes, train=False, **kw):
        # x is mean-subtracted LR; predict [0,1]-range HR
        return model_fn(x, train=train, **kw) + mean.astype(x.dtype)

    def _synthesize(hr_img):
        return area_downsample(hr_img, scale) - mean, hr_img

    def train_fn(key, x_u8, _y):
        import jax
        n, ih, iw, _ = x_u8.shape
        k_y, k_x, k_f = jax.random.split(key, 3)
        y0 = jax.random.randint(k_y, (n,), 0, max(ih - hr, 0) + 1)
        x0 = jax.random.randint(k_x, (n,), 0, max(iw - hr, 0) + 1)
        boxes = jnp.stack([y0.astype(jnp.float32),
                           x0.astype(jnp.float32),
                           jnp.full((n,), float(hr)),
                           jnp.full((n,), float(hr))], axis=1)
        flip = jax.random.bernoulli(k_f, 0.5, (n,))
        patch = batched_crop_resize(x_u8, boxes, (hr, hr), flip) / 255.0
        return _synthesize(patch)

    def eval_fn(x_u8, _y):
        patch = center_crop_hw(x_u8, hr).astype(jnp.float32) / 255.0
        return _synthesize(patch)

    def predict_fn(x_u8):
        # inference on REAL low-resolution inputs: normalize only
        return x_u8.astype(jnp.float32) / 255.0 - mean

    net = ConvNet(sr_forward, input_shape=(lr, lr, 3),
                  num_classes=0,
                  precision=cfg.get("precision", "f32"),
                  loss_fn=lambda pred, y: l1_loss(
                      pred.astype(jnp.float32), y.astype(jnp.float32)),
                  augment_fns=(train_fn, eval_fn, predict_fn),
                  mesh=mesh, seed=cfg.get("seed", 0),
                  remat=cfg.get("remat", False),
                  chain_steps=cfg.get("chain_steps", 1),
                  accum_steps=cfg.get("accum_steps", 1),
                  ckpt_dir=ckpt_dir, log_dir=log_dir, **mkw)
    train_src, val_src = make_sources(cfg, synthetic)
    return net, DataSet(train_src), DataSet(val_src)


# --------------------------------------------------- self-supervised (ssl)

def build_ssl(cfg: dict, synthetic: bool = False, mesh=None):
    """Self-supervised recipe wiring (the fifth task family, train/ssl.py).

    Returns ``(state, step, train_set, val_set, feats_fn, kind)``:
    ``step(state, x_u8_batch)`` is the fused jitted pretraining step;
    ``feats_fn(state, x_u8)`` embeds frozen features for the kNN probe
    (eval augmentation + features_only forward).  Labels flow through
    the DataSet untouched — pretraining ignores them, the probe uses
    them.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import (augment_eval, augment_train,
                                            normalize)
    from myconvnet_tpu.train import ssl as ssl_lib

    kind = cfg.get("ssl_kind", "simclr")
    policy = get_policy(cfg.get("precision", "f32"))
    aug = make_augment(cfg.get("augment"))
    if aug is None:
        raise ValueError("ssl configs need an 'augment' entry (the view "
                         "distribution is the method)")
    opt = make_optimizer(cfg["optimizer"])
    mkw = dict(cfg.get("model_kwargs", {}))

    if kind == "mae":
        if cfg["model"] not in models.SSL_MODELS:
            raise ValueError(f"ssl_kind='mae' needs an SSL_MODELS entry; "
                             f"valid: {sorted(models.SSL_MODELS)}")
        mae_fn = models.SSL_MODELS[cfg["model"]]

        def fwd(x, train=False, features_only=False):
            with policy_scope(policy):
                x = policy.cast_to_compute(x)
                return mae_fn(x, train=train,
                              features_only=features_only, **mkw)

        model = transform(fwd)

        def view_fn(key, x_u8):
            return augment_train(key, x_u8, aug)

        step = ssl_lib.make_mae_step(model, opt, view_fn)

    elif kind == "simclr":
        model_fn = models.get_model(cfg["model"])
        proj_dim = cfg.get("proj_dim", 128)
        proj_hidden = cfg.get("proj_hidden", None)
        gray_p = cfg.get("grayscale_prob", 0.2)
        # the view chain works on [0,1] floats; normalization moves to
        # the END so random grayscale sees real RGB
        raw_aug = aug._replace(mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))

        def fwd(x, train=False, features_only=False):
            from myconvnet_tpu import nn
            from myconvnet_tpu.core.module import collecting
            with policy_scope(policy):
                x = policy.cast_to_compute(x)
                # the backbone = any feature-tagging zoo classifier; its
                # 1-class head is dead code XLA prunes (output unused)
                with collecting() as c:
                    model_fn(x, 1, train=train, **mkw)
                feats = [v for k, v in c.items()
                         if k.endswith("/features")]
                if not feats:
                    raise ValueError(
                        f"model {cfg['model']!r} tags no 'features' "
                        f"intermediate; found {sorted(c)}")
                h = feats[-1]
                if h.ndim == 4:
                    h = nn.gap(h)
                if features_only:
                    return policy.cast_to_output(h)
                with nn.scope_named("projector"):
                    hidden = proj_hidden or h.shape[-1]
                    z = nn.relu(nn.dense(h, hidden, name="fc1"))
                    z = nn.dense(z, proj_dim, use_bias=False, name="fc2")
                return policy.cast_to_output(z)

        model = transform(fwd)

        def view_fn(key, x_u8, _raw=raw_aug, _final=aug, _p=gray_p):
            from myconvnet_tpu.data.augment import _rgb_to_gray
            k1, k2 = jax.random.split(key)
            x = augment_train(k1, x_u8, _raw)     # [0,1] floats
            if _p > 0.0:
                sel = jax.random.bernoulli(k2, _p,
                                           (x.shape[0], 1, 1, 1))
                x = jnp.where(sel, _rgb_to_gray(x), x)
            return normalize(x, _final.mean,
                             _final.std).astype(x.dtype)

        step = ssl_lib.make_simclr_step(
            model, opt, view_fn,
            temperature=cfg.get("temperature", 0.5))
    else:
        raise ValueError(f"unknown ssl_kind {kind!r}; valid: "
                         "['mae', 'simclr']")

    rng = jax.random.key(cfg.get("seed", 0))
    hw = tuple(aug.out_hw)
    sample = jnp.zeros((2, *hw, 3), policy.compute_dtype)
    from myconvnet_tpu.train.trainer import init_train_state
    state = init_train_state(model, opt, rng, sample)

    @jax.jit
    def _feats(params, mstate, x_u8):
        x = augment_eval(x_u8, aug)
        z, _ = model.apply(params, mstate, None, x, False,
                           features_only=True)
        return z

    def feats_fn(state, x_u8):
        return _feats(state.params, state.model_state, jnp.asarray(x_u8))

    train_src, val_src = make_sources(cfg, synthetic)
    return (state, step, DataSet(train_src, seed=cfg.get("seed", 0)),
            DataSet(val_src), feats_fn, kind)


# ------------------------------------------------------------ video

def build_video(cfg: dict, synthetic: bool = False,
                ckpt_dir: str | None = None, log_dir: str | None = None,
                mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Video-classification recipe wiring (ninth task family).

    Rides the FULL ConvNet API (build/train/evaluate/predict/save/
    restore) with 5-D NDHWC clips: the standard supervised driver, a
    clip corpus (`subsets/video.py`), and an ``augment_fns`` triple
    that normalizes + clip-coherent-hflips on device inside the jitted
    step (one flip decision per CLIP, applied to every frame — a
    per-frame flip would destroy motion continuity).
    """
    import jax.numpy as jnp

    from myconvnet_tpu.subsets import video as video_mod

    name = cfg.get("model", "r3d_18")
    fn = models.VIDEO_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown video model {name!r}; valid: "
                         f"{sorted(models.VIDEO_MODELS)}")
    t = int(cfg.get("num_frames", 8))
    hw = tuple(cfg.get("input_hw", (112, 112)))
    # torchvision's Kinetics normalization constants by default
    mean = jnp.asarray(cfg.get("mean", (0.43216, 0.394666, 0.37645)),
                       jnp.float32)
    std = jnp.asarray(cfg.get("std", (0.22803, 0.22145, 0.216989)),
                      jnp.float32)

    def _norm(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return (x - mean) / std

    # The synthetic corpus labels BY motion direction, so a mirrored
    # clip belongs to the mirrored class: remap labels under flip
    # (right<->left) or half the horizontal-motion examples train
    # mislabeled.  Real corpora keep labels flip-invariant.
    syn_labels = synthetic or cfg.get("data_dir") is None
    label_swap = (jnp.asarray(video_mod.HFLIP_LABEL_SWAP)
                  if syn_labels else None)

    def train_fn(key, x_u8, y):
        x = _norm(x_u8)
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
        x = jnp.where(flip[:, None, None, None, None],
                      x[:, :, :, ::-1, :], x)
        if label_swap is not None:
            y = jnp.where(flip, label_swap[y], y)
        return x, y

    def eval_fn(x_u8, y):
        return _norm(x_u8), y

    net = ConvNet(
        model_fn=fn,
        input_shape=(t, *hw, 3),
        num_classes=cfg["num_classes"],
        precision=cfg.get("precision", "f32"),
        augment_fns=(train_fn, eval_fn, _norm),
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir,
        **cfg.get("model_kwargs", {}))

    def src(split):
        return video_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 128),
            num_frames=t, raw_hw=hw)

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


def build_audio(cfg: dict, synthetic: bool = False,
                ckpt_dir: str | None = None, log_dir: str | None = None,
                mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Audio-classification recipe wiring (eleventh task family).

    The standard supervised ConvNet ride over [N, T, 1] waveforms:
    int16 crosses the wire, an ``augment_fns`` triple converts to
    float and augments ON DEVICE inside the jitted step (random gain,
    circular time shift, additive noise — the SpecAugment-era basics
    that apply to both raw-waveform and log-mel models), and the
    model is any AUDIO_MODELS entry (m5/m11 raw 1-D CNNs or the
    melspec_cnn log-mel frontend + 2-D zoo backbone).
    """
    import jax.numpy as jnp

    from myconvnet_tpu.subsets import audio as audio_mod

    name = cfg.get("model", "m5")
    fn = models.AUDIO_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown audio model {name!r}; valid: "
                         f"{sorted(models.AUDIO_MODELS)}")
    t = int(cfg.get("num_samples", audio_mod.DEFAULT_NUM_SAMPLES))
    sr = int(cfg.get("sample_rate", audio_mod.DEFAULT_SAMPLE_RATE))
    model_kwargs = dict(cfg.get("model_kwargs", {}))
    if name == "melspec_cnn":
        # the frontend's mel axis must agree with the corpus rate —
        # otherwise half the bands can land above Nyquist silently
        model_kwargs.setdefault("sample_rate", sr)
    gain = float(cfg.get("aug_gain", 0.15))       # +-15% amplitude
    shift = int(cfg.get("aug_shift", t // 10))    # max roll, samples
    noise = float(cfg.get("aug_noise", 0.005))    # additive sigma

    def _norm(x_i16):
        return x_i16.astype(jnp.float32) / 32768.0

    def train_fn(key, x_i16, y):
        x = _norm(x_i16)                           # [B, T, 1]
        kg, ks, kn = jax.random.split(key, 3)
        g = jax.random.uniform(kg, (x.shape[0], 1, 1),
                               minval=1.0 - gain, maxval=1.0 + gain)
        x = x * g
        if shift > 0:
            # per-clip circular shift: tones/speech are shift-
            # covariant, labels are shift-invariant
            s = jax.random.randint(ks, (x.shape[0],), -shift,
                                   shift + 1)
            x = jax.vmap(lambda xi, si: jnp.roll(xi, si, axis=0))(x, s)
        if noise > 0:
            x = x + noise * jax.random.normal(kn, x.shape)
        return x, y

    def eval_fn(x_i16, y):
        return _norm(x_i16), y

    net = ConvNet(
        model_fn=fn,
        input_shape=(t, 1),
        num_classes=cfg["num_classes"],
        precision=cfg.get("precision", "f32"),
        augment_fns=(train_fn, eval_fn, _norm),
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        # the models manage precision themselves (nn layers cast to the
        # compute dtype): an early bf16 cast would quantize the 16-bit
        # waveform to an 8-bit mantissa BEFORE the f32 log-mel frontend
        cast_input=False,
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir,
        **model_kwargs)

    def src(split):
        s = audio_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 256),
            num_samples=t, sample_rate=sr,
            n_classes=cfg["num_classes"])
        found = getattr(s, "class_names", None)
        if found is not None and len(found) != cfg["num_classes"]:
            raise ValueError(
                f"corpus {split!r} split has {len(found)} classes but "
                f"cfg num_classes={cfg['num_classes']}: {found}")
        return s

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


def build_ocr(cfg: dict, synthetic: bool = False,
              ckpt_dir: str | None = None, log_dir: str | None = None,
              mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Text-recognition recipe wiring (thirteenth task family).

    The standard supervised ConvNet ride over [N, H, W, 1] line
    images: uint8 crosses the wire, an ``augment_fns`` triple
    normalizes + augments ON DEVICE inside the jitted step (brightness
    / contrast jitter + noise — geometry stays put: CTC supervision is
    column-aligned), the loss is ``ops/ctc.py``'s scan-form CTC over
    [N, L] right-padded label sequences (pad = blank = 0), and the
    model is any OCR_MODELS entry.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.ops.ctc import ctc_loss
    from myconvnet_tpu.subsets import ocr as ocr_mod

    name = cfg.get("model", "crnn")
    fn = models.OCR_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown ocr model {name!r}; valid: "
                         f"{sorted(models.OCR_MODELS)}")
    charset = cfg.get("charset", ocr_mod.DEFAULT_CHARSET)
    if cfg.get("num_classes") not in (None, len(charset)):
        raise ValueError(
            f"num_classes={cfg.get('num_classes')} disagrees with the "
            f"charset size {len(charset)}; drop num_classes (it is "
            f"derived) or fix the charset")
    hw = tuple(cfg.get("input_hw", ocr_mod.DEFAULT_HW))
    max_len = int(cfg.get("max_len", ocr_mod.DEFAULT_MAX_LEN))
    bright = float(cfg.get("aug_brightness", 0.2))
    contrast = float(cfg.get("aug_contrast", 0.2))
    noise = float(cfg.get("aug_noise", 0.02))
    reduction = cfg.get("ctc_reduction", "mean_label")

    def _norm(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    def train_fn(key, x_u8, y):
        # inline jitter rather than data/augment.color_jitter: that
        # helper's contrast path grays via fixed 3-channel RGB
        # coefficients, and these line images are single-channel
        x = _norm(x_u8)                               # [B, H, W, 1]
        kb, kc, kn = jax.random.split(key, 3)
        if bright > 0:
            x = x + jax.random.uniform(kb, (x.shape[0], 1, 1, 1),
                                       minval=-bright, maxval=bright)
        if contrast > 0:
            c = jax.random.uniform(kc, (x.shape[0], 1, 1, 1),
                                   minval=1.0 - contrast,
                                   maxval=1.0 + contrast)
            mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = (x - mean) * c + mean
        if noise > 0:
            x = x + noise * jax.random.normal(kn, x.shape)
        return jnp.clip(x, 0.0, 1.0), y

    def eval_fn(x_u8, y):
        return _norm(x_u8), y

    net = ConvNet(
        model_fn=fn,
        input_shape=(*hw, 1),
        num_classes=len(charset),
        precision=cfg.get("precision", "f32"),
        loss_fn=lambda logits, y: ctc_loss(logits, y,
                                           reduction=reduction),
        augment_fns=(train_fn, eval_fn, _norm),
        # frame logits [N,T,C+1] vs label sequences [N,L]: the argmax
        # train-accuracy column is shape-incompatible AND meaningless
        # under CTC alignment — CER comes from the evaluator instead
        accuracy_metric=False,
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir,
        **dict(cfg.get("model_kwargs", {})))

    def src(split):
        return ocr_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 256),
            charset=charset, hw=hw, max_len=max_len)

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


def build_depth(cfg: dict, synthetic: bool = False,
                ckpt_dir: str | None = None, log_dir: str | None = None,
                mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Monocular-depth recipe wiring (fourteenth task family).

    Dense regression on the standard supervised ConvNet ride: uint8
    RGB crosses the wire with f32 depth targets ([B, H, W, 1] meters,
    0 = invalid), ``augment_fns`` normalizes + augments ON DEVICE
    inside the jitted step (paired hflip — the one geometric op that
    keeps the pixel-depth correspondence exact without resampling the
    sensor values — plus photometric jitter on RGB only), the loss is
    Eigen's scale-invariant log loss over the valid mask
    (``train/losses.py:silog_loss``).
    """
    import jax.numpy as jnp

    from myconvnet_tpu.subsets import depth as depth_mod
    from myconvnet_tpu.train.losses import silog_loss

    name = cfg.get("model", "depth_unet")
    fn = models.DEPTH_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown depth model {name!r}; valid: "
                         f"{sorted(models.DEPTH_MODELS)}")
    hw = tuple(cfg.get("input_hw", depth_mod.DEFAULT_HW))
    max_depth = float(cfg.get("max_depth", depth_mod.DEFAULT_MAX_DEPTH))
    min_depth = float(cfg.get("min_depth", 0.1))
    bright = float(cfg.get("aug_brightness", 0.2))
    contrast = float(cfg.get("aug_contrast", 0.2))
    silog_lam = float(cfg.get("silog_lambda", 0.5))
    mkw = dict(cfg.get("model_kwargs", {}))
    mkw.setdefault("min_depth", min_depth)
    mkw.setdefault("max_depth", max_depth)

    def _norm(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    def train_fn(key, x_u8, y):
        from myconvnet_tpu.data.augment import color_jitter
        x = _norm(x_u8)
        kf, kj = jax.random.split(key)
        flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        y = jnp.where(flip, y[:, :, ::-1, :], y)
        # photometric jitter on the RGB only (shared augment helper);
        # depth targets are sensor values and stay untouched
        x = color_jitter(kj, x, brightness=bright, contrast=contrast)
        return jnp.clip(x, 0.0, 1.0), y

    def eval_fn(x_u8, y):
        return _norm(x_u8), y

    net = ConvNet(
        model_fn=fn,
        input_shape=(*hw, 3),
        num_classes=0,
        precision=cfg.get("precision", "f32"),
        loss_fn=lambda pred, y: silog_loss(pred, y, lam=silog_lam),
        augment_fns=(train_fn, eval_fn, _norm),
        # argmax accuracy is meaningless for dense regression; the
        # DepthEvaluator carries the Eigen metrics instead
        accuracy_metric=False,
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir, **mkw)

    def src(split):
        return depth_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 256),
            hw=hw, depth_scale=cfg.get("depth_scale",
                                       depth_mod.DEFAULT_DEPTH_SCALE),
            max_depth=max_depth)

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


def build_flow(cfg: dict, synthetic: bool = False,
               ckpt_dir: str | None = None, log_dir: str | None = None,
               mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """Optical-flow recipe wiring (fifteenth task family).

    The supervised ConvNet ride over ``[N, H, W, 6]`` channel-stacked
    uint8 frame pairs with ``[N, H, W, 2]`` f32 pixel-flow targets:
    on-device paired hflip (mirror both frames AND the flow, negate
    u), photometric jitter applied IDENTICALLY to both frames
    (brightness constancy is the signal the matching learns — one
    PRNG key drives both), Charbonnier EPE loss
    (``train/losses.py:epe_loss``) masking the .flo unknown sentinel.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import color_jitter
    from myconvnet_tpu.subsets import flow as flow_mod
    from myconvnet_tpu.train.losses import (epe_loss, multiscale_epe_loss,
                                            unsupervised_flow_loss)

    name = cfg.get("model", "flownet_s")
    fn = models.FLOW_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown flow model {name!r}; valid: "
                         f"{sorted(models.FLOW_MODELS)}")
    hw = tuple(cfg.get("input_hw", flow_mod.DEFAULT_HW))
    bright = float(cfg.get("aug_brightness", 0.2))
    contrast = float(cfg.get("aug_contrast", 0.2))

    def _norm(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    def _jitter(key, x):
        # same key -> the SAME random factors on frame 1 and frame 2
        f1 = color_jitter(key, x[..., :3], brightness=bright,
                          contrast=contrast)
        f2 = color_jitter(key, x[..., 3:], brightness=bright,
                          contrast=contrast)
        return jnp.clip(jnp.concatenate([f1, f2], axis=-1), 0.0, 1.0)

    def train_fn(key, x_u8, y):
        x = _norm(x_u8)
        kf, kj = jax.random.split(key)
        flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        xa = _jitter(kj, x)
        if unsup:
            if occ:
                # bidirectional: stack the swapped pairs below the
                # forward pairs so ONE forward pass yields both flow
                # directions for the consistency mask
                swapped = jnp.concatenate(
                    [xa[..., 3:], xa[..., :3]], axis=-1)
                return jnp.concatenate([xa, swapped], axis=0), xa
            return xa, xa      # brightness constancy vs what it saw
        y_f = jnp.concatenate([-y[..., :1], y[..., 1:]], axis=-1)
        y = jnp.where(flip, y_f[:, :, ::-1, :], y)
        return xa, y

    def eval_fn(x_u8, y):
        return _norm(x_u8), y

    eps = cfg.get("epe_eps", 1e-3)
    unsup = bool(cfg.get("unsupervised", False))
    occ = bool(cfg.get("occlusion", False))
    if occ and not unsup:
        raise ValueError("occlusion=True is the bidirectional "
                         "unsupervised objective; set unsupervised=True")
    if unsup:
        # photometric + smoothness: the train target is the augmented
        # frame pair itself (train_fn below); GT flow is only ever
        # read by the evaluator.  occlusion=True doubles the in-step
        # batch with the swapped pairs and gates the photometric term
        # by forward-backward consistency.
        loss_fn = lambda pred, y: unsupervised_flow_loss(  # noqa: E731
            pred, y, smooth_weight=cfg.get("smooth_weight", 0.05),
            edge_sharpness=cfg.get("edge_sharpness", 50.0), eps=eps,
            occlusion=occ,
            occ_alpha1=cfg.get("occ_alpha1", 0.01),
            occ_alpha2=cfg.get("occ_alpha2", 0.5))
    elif getattr(fn, "multiscale", False):
        # coarse-to-fine nets return the per-level flow pyramid in
        # train mode -> PWC-style multi-scale deep supervision
        ms_w = cfg.get("flow_loss_weights")
        loss_fn = lambda pred, y: multiscale_epe_loss(  # noqa: E731
            pred, y, weights=ms_w, eps=eps)
    else:
        loss_fn = lambda pred, y: epe_loss(pred, y, eps=eps)  # noqa: E731

    net = ConvNet(
        model_fn=fn,
        input_shape=(*hw, 6),
        num_classes=0,
        precision=cfg.get("precision", "f32"),
        loss_fn=loss_fn,
        augment_fns=(train_fn, eval_fn, _norm),
        accuracy_metric=False,   # dense regression: EPE via evaluator
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir,
        **dict(cfg.get("model_kwargs", {})))

    def src(split):
        return flow_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 256), hw=hw,
            max_motion=cfg.get("max_motion", 8))

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


def build_tracking(cfg: dict, synthetic: bool = False,
                   ckpt_dir: str | None = None,
                   log_dir: str | None = None,
                   mesh=None) -> tuple[ConvNet, DataSet, DataSet]:
    """SiamFC tracking recipe wiring (sixteenth task family).

    Rides the standard supervised ConvNet path: ``[N, H, W, 6]`` uint8
    exemplar/search blobs (subsets/tracking.py wire format) with
    ``[N, 2]`` f32 offset targets, the balanced response-map logistic
    loss (``train/losses.py:siamfc_loss``), on-device paired hflip
    (mirror BOTH crops — the exemplar only within its live corner —
    and negate dx) and appearance-preserving photometric jitter (one
    PRNG key drives both crops, like the flow family).
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import color_jitter
    from myconvnet_tpu.models.tracking import SIAMFC_STRIDE
    from myconvnet_tpu.subsets import tracking as track_mod
    from myconvnet_tpu.train.losses import siamfc_loss

    name = cfg.get("model", "siamfc")
    fn = models.TRACK_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown tracking model {name!r}; valid: "
                         f"{sorted(models.TRACK_MODELS)}")
    mkw = dict(cfg.get("model_kwargs", {}))
    hw = tuple(cfg.get("input_hw", track_mod.DEFAULT_SEARCH_HW))
    ehw = tuple(mkw.get("exemplar_hw",
                        track_mod.DEFAULT_EXEMPLAR_HW))
    mkw["exemplar_hw"] = ehw
    he, we = ehw
    bright = float(cfg.get("aug_brightness", 0.2))
    contrast = float(cfg.get("aug_contrast", 0.2))

    def _norm(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    def _flip_blob(x):
        """Mirror search fully; mirror the exemplar only inside its
        live top-left corner (a full-width flip would strand it in
        the dead padding)."""
        h, w = x.shape[1:3]
        search = x[..., :3][:, :, ::-1, :]
        ex = x[:, :he, :we, 3:][:, :, ::-1, :]
        ex_half = jnp.pad(ex, ((0, 0), (0, h - he), (0, w - we),
                               (0, 0)))
        return jnp.concatenate([search, ex_half], axis=-1)

    def _jitter(key, x):
        s = color_jitter(key, x[..., :3], brightness=bright,
                         contrast=contrast)
        e = color_jitter(key, x[..., 3:], brightness=bright,
                         contrast=contrast)
        return jnp.clip(jnp.concatenate([s, e], axis=-1), 0.0, 1.0)

    def train_fn(key, x_u8, y):
        x = _norm(x_u8)
        kf, kj = jax.random.split(key)
        flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, _flip_blob(x), x)
        y = jnp.where(flip[:, 0, 0, :],
                      jnp.concatenate([-y[..., :1], y[..., 1:]], -1), y)
        return _jitter(kj, x), y

    def eval_fn(x_u8, y):
        return _norm(x_u8), y

    stride = int(cfg.get("response_stride", SIAMFC_STRIDE))
    radius = float(cfg.get("label_radius", 2 * stride))
    loss_fn = lambda pred, y: siamfc_loss(  # noqa: E731
        pred, y, radius=radius, stride=stride)

    net = ConvNet(
        model_fn=fn,
        input_shape=(*hw, 6),
        num_classes=0,
        precision=cfg.get("precision", "f32"),
        loss_fn=loss_fn,
        augment_fns=(train_fn, eval_fn, _norm),
        accuracy_metric=False,   # peak localization via evaluator
        mesh=mesh,
        remat=cfg.get("remat", False),
        chain_steps=cfg.get("chain_steps", 1),
        accum_steps=cfg.get("accum_steps", 1),
        seed=cfg.get("seed", 0),
        ckpt_dir=ckpt_dir, log_dir=log_dir, **mkw)

    def src(split):
        return track_mod.make_source(
            cfg.get("data_dir"), split,
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 256),
            search_hw=hw, exemplar_hw=ehw,
            max_offset=cfg.get("max_offset", 12),
            frame_gap=cfg.get("frame_gap", 10),
            pairs_per_video=cfg.get("pairs_per_video", 32))

    seed = cfg.get("seed", 0)
    return (net, DataSet(src("train"), seed=seed),
            DataSet(src("val")))


# --------------------------------------------------- style (johnson)

def procedural_style_image(hw=(256, 256), seed: int = 7):
    """Deterministic high-frequency colorful pattern (concentric waves
    + diagonal stripes per channel) — the no-egress stand-in for a
    painting: its Gram matrices are strongly structured and far from
    natural-image statistics, so style loss is meaningfully testable."""
    import numpy as np
    h, w = hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        cy, cx = rng.uniform(0.2, 0.8, 2) * (h, w)
        r = np.hypot(yy - cy, xx - cx)
        f1, f2 = rng.uniform(0.05, 0.2), rng.uniform(0.02, 0.1)
        ph = rng.uniform(0, 2 * np.pi)
        img[..., c] = (0.5 + 0.25 * np.sin(2 * np.pi * f1 * r)
                       + 0.25 * np.sin(2 * np.pi * f2 * (xx + yy) + ph))
    return np.clip(img, 0.0, 1.0).astype(np.float32)[None]


def build_style(cfg: dict, synthetic: bool = False):
    """Fast style transfer (twelfth task family).

    Returns ``(state, step, data_iter_fn, kind)`` — the custom-loop
    assembly shape the GAN/diffusion families use.  The VGG extractor
    starts random unless ``cfg['vgg_pretrained']`` names a torch
    VGG-16 checkpoint (models/pretrained.py layout); random features
    still define a valid optimization target (the math and the fused
    program are identical), pretrained features give the
    literature-quality stylization.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.subsets import images as images_mod
    from myconvnet_tpu.train import style as style_lib
    from myconvnet_tpu.train.perceptual import (STYLE_LAYERS,
                                                make_vgg_extractor)

    size = int(cfg.get("image_size", 256))
    if size % 4:
        raise ValueError(f"image_size {size} must be a multiple of 4")
    batch = cfg["batch_size"]
    width = int(cfg.get("gen_width", 32))
    n_res = int(cfg.get("gen_res_blocks", 5))

    def g_fwd(x, train=False):
        return models.transformer_net(x, width=width, n_res=n_res,
                                      train=train)

    gen = transform(g_fwd)
    from myconvnet_tpu.train.perceptual import CONTENT_LAYER
    style_layers = tuple(cfg.get("style_layers", STYLE_LAYERS))
    content_layer = cfg.get("content_layer", CONTENT_LAYER)
    # the extractor must tap the content layer even when the style set
    # omits it (style_layers=('relu3_3','relu4_3') is legal config)
    vgg, features_fn = make_vgg_extractor(
        tuple(dict.fromkeys(style_layers + (content_layer,))))
    opt = make_optimizer(cfg.get("optimizer",
                                 dict(name="adam", lr=1e-3)))
    state = style_lib.init_style_state(
        gen, vgg, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((batch, size, size, 3)))

    if cfg.get("vgg_pretrained"):
        from myconvnet_tpu.models.pretrained import (
            import_torch_vgg16_features_file)
        state = state._replace(vgg_params=import_torch_vgg16_features_file(
            cfg["vgg_pretrained"], state.vgg_params))

    # style target: an image file, or the procedural fallback
    style_path = cfg.get("style_image")
    if style_path and not synthetic:
        src = images_mod.FileSource([style_path],
                                    np.zeros(1, np.int32),
                                    (size, size))
        s_img = src.get_batch(np.array([0]))[0].astype(np.float32) / 255.
    else:
        s_img = procedural_style_image((size, size),
                                       seed=cfg.get("style_seed", 7))
    grams = style_lib.style_grams(features_fn, state.vgg_params,
                                  state.vgg_state, jnp.asarray(s_img))
    # style targets only for the STYLE layers (the extractor also taps
    # the content layer, which must not enter the Gram term)
    grams = {k: v for k, v in grams.items() if k in style_layers}

    step = style_lib.make_style_step(
        gen, features_fn, opt, grams,
        content_weight=cfg.get("content_weight", 1.0),
        style_weight=cfg.get("style_weight", 5.0),
        tv_weight=cfg.get("tv_weight", 1e-4),
        content_layer=content_layer)

    def data_iter():
        src = images_mod.make_source(
            cfg.get("data_dir"), "train",
            synthetic=synthetic or cfg.get("data_dir") is None,
            synthetic_n=cfg.get("synthetic_n", 128),
            raw_hw=(size, size))
        ds = DataSet(src, seed=cfg.get("seed", 0))
        for x, _ in ds.train_iter(batch):
            yield x.astype("float32") / 255.0  # stays on device

    return state, step, data_iter, "johnson"


def make_stylizer_fn(cfg: dict):
    """-> jitted fn(params, model_state, x) -> stylized [0,1] batch.
    Build ONCE; params ride as traced arguments so evolving weights
    (mid-training sample grids) never force a recompile.  uint8 inputs
    are detected by their STATIC dtype and scaled /255."""
    import jax.numpy as jnp

    width = int(cfg.get("gen_width", 32))
    n_res = int(cfg.get("gen_res_blocks", 5))

    def g_fwd(x, train=False):
        return models.transformer_net(x, width=width, n_res=n_res,
                                      train=train)

    gen = transform(g_fwd)

    @jax.jit
    def stylize(params, model_state, x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32) / 255.0
        else:
            x = x.astype(jnp.float32)
        y, _ = gen.apply(params, model_state, None, x, False)
        return y

    return stylize


def make_stylizer(cfg: dict, state):
    """Convenience wrapper closing over a fixed state:
    fn(x uint8/float[0,1]) -> stylized [0,1] (generate.py consumer)."""
    fn = make_stylizer_fn(cfg)
    return lambda x: fn(state.params, state.model_state, x)


# ---------------------------------------------------- semisup (fixmatch)

def build_semisup(cfg: dict, synthetic: bool = False, mesh=None):
    """FixMatch recipe wiring (eighth task family, train/semisup.py).

    Returns (state, step_fn, data_iter_fn, val_set, eval_fn).  The
    labeled split is ``labeled_per_class`` examples per class drawn
    from the train corpus (the paper's protocol — the unlabeled pool
    keeps everything); batches interleave 1 labeled : ``mu`` unlabeled.
    With ``mesh``, all three sub-batches shard over the data axis.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import augment_eval, augment_train
    from myconvnet_tpu.data.pipeline import ArraySource
    from myconvnet_tpu.train import semisup as semi_lib

    policy = get_policy(cfg.get("precision", "f32"))
    ncls = cfg["num_classes"]
    fn = models.get_model(cfg["model"])
    mkw = cfg.get("model_kwargs", {})

    def fwd(x, train=False):
        with policy_scope(policy):
            return fn(x.astype(policy.compute_dtype), ncls,
                      train=train, **mkw)

    model = transform(fwd)
    weak_aug = make_augment(cfg["augment"])
    strong_aug = make_augment(
        {**cfg["augment"], **cfg.get("augment_strong",
                                     dict(randaugment=(2, 10)))})

    def weak_fn(key, x_u8):
        return augment_train(key, x_u8, weak_aug)

    def strong_fn(key, x_u8):
        return augment_train(key, x_u8, strong_aug)

    opt = make_optimizer(cfg["optimizer"])
    hw = tuple(weak_aug.out_hw)
    state = semi_lib.init_semi_state(
        model, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((2, *hw, 3), policy.compute_dtype))
    step = semi_lib.make_fixmatch_step(
        model, opt, weak_fn, strong_fn,
        threshold=cfg.get("threshold", 0.95),
        lambda_u=cfg.get("lambda_u", 1.0),
        ema_decay=cfg.get("ema_decay", 0.999))

    train_src, val_src = make_sources(cfg, synthetic)
    if not isinstance(train_src, ArraySource):
        raise ValueError("semisup needs an in-memory corpus "
                         "(ArraySource) to draw the labeled split")
    seed = cfg.get("seed", 0)
    x_lab, y_lab = semi_lib.labeled_subset(
        train_src.images, train_src.labels,
        cfg.get("labeled_per_class", 400), ncls, seed)
    lab_ds = DataSet(ArraySource(x_lab, y_lab), seed=seed)
    unlab_ds = DataSet(train_src, seed=seed + 1)
    mu = int(cfg.get("mu", 7))
    batch = cfg["batch_size"]

    def data_iter():
        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        li = lab_ds.train_iter(batch, device_put_fn=put)
        ui = unlab_ds.train_iter(mu * batch, device_put_fn=put)
        try:
            for (x_l, y_l), (x_u, _) in zip(li, ui):
                yield (x_l, y_l, x_u)
        finally:
            for it in (li, ui):
                if hasattr(it, "close"):
                    it.close()

    eval_fn = semi_lib.make_eval_fn(
        model, lambda x_u8: augment_eval(x_u8, weak_aug),
        use_ema=cfg.get("eval_ema", True))
    return state, step, data_iter, DataSet(val_src), eval_fn


# ------------------------------------------------- knowledge distillation

def build_distill(cfg: dict, synthetic: bool = False, mesh=None):
    """Knowledge-distillation recipe wiring (train/distill.py made a
    first-class task — the compress-the-zoo workflow: a trained
    teacher checkpoint supervises a smaller student through the fused
    teacher+student step).

    Returns ``(state, step_fn, data_iter_fn, val_set, eval_fn)`` — the
    run_semisup driver shape.  Config::

        task="distill", model="smallnet",        # the student
        distill=dict(
            teacher="resnet50",                  # teacher architecture
            teacher_kwargs={},                   # its model_kwargs
            ckpt="runs/r50/",                    # framework ckpt (dir
                                                 # or file) to load the
                                                 # teacher from, OR
            npz="weights.npz",                   # flat scope::name npz
            torch=dict(path="r50.pth", depth=50),  # torchvision file
            temperature=4.0, alpha=0.9),

    Exactly one of ``ckpt``/``npz``/``torch`` must be given — an
    untrained teacher distills noise, so there is no silent-random
    fallback (``allow_random=True`` overrides for tests/smoke runs).
    With ``mesh``, batches shard over the data axis and GSPMD carries
    both networks' compute.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import augment_eval, augment_train
    from myconvnet_tpu.train import distill as kd_lib
    from myconvnet_tpu.train.trainer import init_train_state

    dcfg = dict(cfg.get("distill") or {})
    if "teacher" not in dcfg:
        raise ValueError("task='distill' needs distill=dict(teacher=...)")
    policy = get_policy(cfg.get("precision", "f32"))
    ncls = cfg["num_classes"]

    def make_net(name, mkw):
        fn = models.get_model(name)

        def fwd(x, train=False):
            with policy_scope(policy):
                return fn(x.astype(policy.compute_dtype), ncls,
                          train=train, **mkw)

        return transform(fwd)

    student = make_net(cfg["model"], cfg.get("model_kwargs", {}))
    teacher = make_net(dcfg["teacher"], dcfg.get("teacher_kwargs", {}))

    aug = make_augment(cfg["augment"])
    hw = tuple(aug.out_hw)

    def augment_fn(key, x_u8, y):
        return augment_train(key, x_u8, aug), y

    opt = make_optimizer(cfg["optimizer"])
    seed = cfg.get("seed", 0)
    sample = jnp.zeros((2, *hw, 3), policy.compute_dtype)
    state0 = init_train_state(student, opt, jax.random.key(seed), sample)
    t_params, t_state = teacher.init(jax.random.key(seed + 1), sample,
                                     True)

    src = [k for k in ("ckpt", "npz", "torch") if dcfg.get(k)]
    if len(src) > 1:
        raise ValueError(f"distill teacher weights over-specified: {src}")
    if src == ["ckpt"]:
        from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
        import warnings
        with warnings.catch_warnings():
            # the teacher template deliberately omits opt_state/step —
            # the "unused entries" warning is expected here
            warnings.filterwarnings(
                "ignore", message=".*entries the target has no slot.*")
            got = ckpt_lib.restore_checkpoint(
                dcfg["ckpt"], {"params": t_params, "model_state": t_state})
        t_params, t_state = got["params"], got["model_state"]
    elif src == ["npz"]:
        from myconvnet_tpu.models.pretrained import load_npz_weights
        t_params = load_npz_weights(dcfg["npz"], t_params)
    elif src == ["torch"]:
        from myconvnet_tpu.models.pretrained import import_torch_resnet_file
        tc = dict(dcfg["torch"])
        t_params, t_state = import_torch_resnet_file(
            tc["path"], t_params, t_state,
            depth=int(tc.get("depth", 50)),
            load_head=bool(tc.get("load_head", True)),
            prefix=tc.get("prefix", ""))
    elif not dcfg.get("allow_random"):
        raise ValueError(
            "distill= gives no teacher weights (ckpt=/npz=/torch=); a "
            "random teacher distills noise — pass allow_random=True "
            "only for smoke tests")

    state = kd_lib.DistillState(state0, t_params, t_state)
    step = kd_lib.make_distill_step(
        student, teacher, opt,
        temperature=float(dcfg.get("temperature", 4.0)),
        alpha=float(dcfg.get("alpha", 0.9)),
        augment_fn=augment_fn)

    train_src, val_src = make_sources(cfg, synthetic)
    train_ds = DataSet(train_src, seed=seed)
    batch = cfg["batch_size"]

    def data_iter():
        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        it = train_ds.train_iter(batch, device_put_fn=put)
        try:
            yield from it
        finally:
            if hasattr(it, "close"):
                it.close()

    @jax.jit
    def _pred(params, mstate, x_u8):
        x = augment_eval(x_u8, aug)
        logits, _ = student.apply(params, mstate, None, x, False)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    def eval_fn(state, batches) -> float:
        import numpy as np
        st = state.student
        correct = total = 0
        for x, y in batches:
            pred = np.asarray(_pred(st.params, st.model_state,
                                    jnp.asarray(x)))
            y = np.asarray(y)
            correct += int((pred[:len(y)] == y).sum())
            total += len(y)
        return correct / max(total, 1)

    return state, step, data_iter, DataSet(val_src), eval_fn


# ------------------------------------------------------ diffusion (ddpm)

def _diffusion_model(cfg: dict):
    """The transformed epsilon-predictor for a diffusion config — one
    source of truth shared by build_diffusion and
    make_diffusion_sampler so restored states always apply."""
    name = cfg.get("model", "ddpm_unet")
    fn = models.DIFFUSION_MODELS.get(name)
    if fn is None:
        raise ValueError(f"unknown diffusion model {name!r}; valid: "
                         f"{sorted(models.DIFFUSION_MODELS)}")
    policy = get_policy(cfg.get("precision", "f32"))
    mkw = dict(cfg.get("model_kwargs", {}))
    if cfg.get("num_classes"):
        mkw["num_classes"] = int(cfg["num_classes"])

    def fwd(x, t, y=None, train=False):
        with policy_scope(policy):
            return fn(x.astype(policy.compute_dtype), t, y,
                      train=train, **mkw)

    return transform(fwd)


def build_diffusion(cfg: dict, synthetic: bool = False, mesh=None):
    """Diffusion recipe wiring (seventh task family, train/diffusion.py).

    Returns (state, step_fn, data_iter_fn, kind="ddpm").  Data rides
    the DCGAN value-space contract: uint8 corpus batches -> [-1, 1]
    floats on device.  With ``mesh``, batches shard over the data axis
    (GSPMD handles the rest — the step itself is mesh-agnostic).
    """
    from myconvnet_tpu.train import diffusion as diff_lib
    import jax.numpy as jnp

    size = cfg.get("image_size", 32)
    batch = cfg["batch_size"]
    sched = diff_lib.make_schedule(
        cfg.get("beta_schedule", "linear"),
        num_steps=cfg.get("diffusion_steps", 1000))
    ncls = int(cfg.get("num_classes", 0) or 0)
    model = _diffusion_model(cfg)
    opt = make_optimizer(cfg["optimizer"])
    state = diff_lib.init_diffusion_state(
        model, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((batch, size, size, 3)), num_classes=ncls)
    step = diff_lib.make_ddpm_step(
        model, opt, sched, ema_decay=cfg.get("ema_decay", 0.9999),
        num_classes=ncls, uncond_prob=cfg.get("uncond_prob", 0.1))

    def data_iter():
        if cfg["dataset"] == "cifar10":
            src = cifar10.make_source(cfg.get("data_dir"), "train",
                                      synthetic=synthetic or
                                      cfg.get("data_dir") is None)
        elif cfg["dataset"] == "images":
            from myconvnet_tpu.subsets import images as images_mod
            src = images_mod.make_source(
                cfg.get("data_dir"), "train",
                synthetic=synthetic or cfg.get("data_dir") is None,
                raw_hw=(size, size))
        else:
            raise ValueError(f"diffusion dataset {cfg['dataset']!r}")
        ds = DataSet(src, seed=cfg.get("seed", 0))

        @jax.jit
        def prep(x_u8):
            # [-1,1] value space; resize on device if the corpus raw
            # size differs from image_size (e.g. CIFAR 32 -> tiny 8)
            x = jnp.asarray(x_u8, jnp.float32) / 127.5 - 1.0
            if x.shape[1:3] != (size, size):
                from myconvnet_tpu.ops.resize import resize_bilinear
                x = resize_bilinear(x, (size, size))
            return x

        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        it = ds.train_iter(batch, device_put_fn=put)
        try:
            for x, y in it:
                yield (prep(x), jnp.asarray(y)) if ncls else prep(x)
        finally:
            if hasattr(it, "close"):
                it.close()

    return state, step, data_iter, "ddpm"


def make_diffusion_sampler(cfg: dict):
    """``sample(state, n, seed) -> uint8 [n,H,W,3]`` via the DDIM scan
    (eta/sample_steps from the config; EMA params by default)."""
    from myconvnet_tpu.train import diffusion as diff_lib
    size = cfg.get("image_size", 32)
    sched = diff_lib.make_schedule(
        cfg.get("beta_schedule", "linear"),
        num_steps=cfg.get("diffusion_steps", 1000))
    return diff_lib.make_sampler(
        _diffusion_model(cfg), sched, shape=(size, size, 3),
        sample_steps=cfg.get("sample_steps"),
        eta=cfg.get("ddim_eta", 0.0),
        use_ema=cfg.get("sample_ema", True),
        num_classes=int(cfg.get("num_classes", 0) or 0),
        guidance_scale=cfg.get("guidance_scale", 0.0))


def apply_pretrained(net: ConvNet, cfg: dict) -> None:
    """Warm-start from the config's ``pretrained`` block (the
    reference's fine-tuning workflow, SURVEY.md §2#11)::

        pretrained=dict(path="r50.pth",      # torch state_dict file
                        depth=50,            # resnet depth of the file
                        prefix="backbone/",  # "" for classifiers
                        load_head=False)     # fc -> logits too?

    Combine with ``optimizer.freeze=["backbone"]`` to train only the
    head.  ``path`` may also be an ``.npz`` of this framework's flat
    ``scope::name`` layout (load_npz_weights; depth/prefix ignored).
    Call after ``net.build()``.
    """
    from myconvnet_tpu.models.pretrained import (import_torch_resnet_file,
                                                 load_npz_weights)
    pcfg = dict(cfg["pretrained"])
    path = pcfg["path"]
    if path.endswith(".npz"):
        new_params = load_npz_weights(path, net.state.params)
        net.state = net.state._replace(params=new_params)
    else:
        new_p, new_s = import_torch_resnet_file(
            path, net.state.params, net.state.model_state,
            depth=int(pcfg.get("depth", 50)),
            load_head=bool(pcfg.get("load_head", True)),
            prefix=pcfg.get("prefix", ""))
        net.state = net.state._replace(params=new_p, model_state=new_s)
    print(f"warm-started from {path}")
