"""Audio, OCR, depth, flow, tracking families.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax

from myconvnet_tpu import models
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.models.base import ConvNet

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

