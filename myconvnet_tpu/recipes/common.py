"""Config loading, optimizers, shared sources, evaluators, pretrained.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import importlib.util

import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.eval.evaluators import AccuracyEvaluator, MeanIoUEvaluator
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.subsets import cifar10, cifar100, imagenet, mnist, svhn, voc
from myconvnet_tpu.train import optim as optim_lib

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
            from myconvnet_tpu.recipes.detection import \
                resolve_num_keypoints
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
