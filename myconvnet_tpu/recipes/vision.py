"""Classification, segmentation, metric, super-resolution, video families.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.train.losses import (ce_dice_loss,
                                        dice_loss,
                                        focal_loss,
                                        pixel_cross_entropy,
                                        softmax_cross_entropy)
from myconvnet_tpu.recipes.common import make_augment, make_sources

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


