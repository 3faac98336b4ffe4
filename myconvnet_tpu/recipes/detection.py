"""The detection family: sources, fused steps, inference, evaluation.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.subsets import voc
from myconvnet_tpu.recipes.common import make_optimizer

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



