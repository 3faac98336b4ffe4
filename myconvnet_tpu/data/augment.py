"""On-device augmentation kernels (SURVEY.md §2#5, §7 hard-parts #1-2).

The reference's tf.data pipeline does decode → resize → random crop →
random flip → color jitter → per-channel normalize on host CPU threads —
the #1 bottleneck its rebuild must eliminate (BASELINE north_star:
"augmentation fully on-device, zero input-bound stalls").

TPU-native design: *all* geometric augmentation (crop, resize, flip —
including ImageNet-style random-resized-crop) is expressed as **per-image
bilinear interpolation matrices** applied with two batched einsums.  That
turns the whole geometric chain into MXU matmuls with zero gathers and
zero dynamic shapes:

    y[n] = Mh[n] @ x[n] @ Mw[n]^T      (per image, batched over n)

where Mh: [OH, H] and Mw: [OW, W] are built *inside jit* from the random
crop boxes (a flip is a reversed column mapping — free).  Photometric ops
(brightness/contrast/saturation/hue) and normalization are elementwise VPU
work that XLA fuses into the same program.  Everything takes uint8 input
(4x cheaper host->HBM transfer than f32) and produces compute-dtype
output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# ImageNet statistics (reference pipeline's per-channel normalize)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class AugmentConfig(NamedTuple):
    out_hw: tuple[int, int] = (224, 224)
    # output dtype: float32 default (parity-grade); 'bfloat16' halves the
    # HBM write+read traffic of the augmented batch on TPU
    out_dtype: str = "float32"
    # sampling-matmul compute dtype: float32 default (bit-stable
    # geometry); 'bfloat16' runs the two interpolation einsums on the
    # bf16 MXU path (f32 accumulation) — ~1 u8 LSB of interpolation
    # error for a ~4x faster geometric pass (measured, PERF_NOTES r3)
    interp_dtype: str = "float32"
    # random-resized-crop parameters (None area_range -> plain random crop)
    area_range: tuple[float, float] | None = (0.08, 1.0)
    aspect_range: tuple[float, float] = (3 / 4, 4 / 3)
    flip: bool = True
    # photometric jitter strengths (0 disables)
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    # CIFAR-style pad-and-crop (pixels); used when area_range is None
    pad: int = 0
    # RandAugment policy (num_layers, magnitude 0-30) applied after the
    # geometric crop on [0,1] floats, before normalize; None disables.
    # See data/randaugment.py for the TPU-native (branch-free) pool.
    randaugment: tuple[int, float] | None = None
    # "xla" (12-op where-fold) or "pallas" (8-op subset, true per-image
    # branching in a TPU kernel — one HBM sweep per layer)
    randaugment_backend: str = "xla"
    # op pool: None = the cheap default fold; "canonical" = the paper's
    # 14-op set (rotate/shear/equalize included — costlier, see
    # PERF_NOTES.md); or an explicit tuple of op names
    randaugment_ops: "tuple[str, ...] | str | None" = None
    # AutoAugment (Cubuk et al. 2018): a registered policy name
    # ("imagenet") or a custom sub-policy table; mutually exclusive
    # with randaugment
    autoaugment: "str | tuple | None" = None
    mean: tuple[float, ...] = IMAGENET_MEAN
    std: tuple[float, ...] = IMAGENET_STD


# ------------------------------------------------------- geometric sampling

def _axis_matrix(start: jax.Array, extent: jax.Array, in_size: int,
                 out_size: int, flip: jax.Array | None = None,
                 clamp: bool = True) -> jax.Array:
    """Per-image bilinear sampling matrix [N, out_size, in_size].

    Maps output index i to source coordinate
    ``start + (i+0.5) * extent/out_size - 0.5`` (half-pixel convention),
    reversed when ``flip``.  Weights are the bilinear hat function — each
    row has <=2 nonzeros, but we materialize it densely: [out, in] is tiny
    and the application is a batched MXU matmul instead of a gather.

    ``clamp=False`` leaves out-of-frame coordinates unclipped: their rows
    are all-zero, i.e. the sample reads ZERO padding (the reference's
    pad-then-crop semantics) instead of replicating the border.
    """
    n = start.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)
    frac = (i + 0.5) / out_size  # [out]
    if flip is not None:
        frac = jnp.where(flip[:, None], 1.0 - frac[None, :],
                         frac[None, :])  # [N, out]
    else:
        frac = jnp.broadcast_to(frac[None, :], (n, out_size))
    src = start[:, None] + frac * extent[:, None] - 0.5  # [N, out]
    if clamp:
        src = jnp.clip(src, 0.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)  # [in]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - j[None, None, :]))
    # rows at exact-integer src have a single 1; interior rows sum to 1.
    return w


def batched_crop_resize(images: jax.Array, boxes: jax.Array,
                        out_hw: tuple[int, int],
                        flip: jax.Array | None = None,
                        precision="highest",
                        clamp: bool = True,
                        fill: jax.Array | None = None,
                        interp_dtype=jnp.float32) -> jax.Array:
    """Crop+resize (+horizontal flip) every image with its own box.

    images: [N,H,W,C] (any dtype; promoted to f32), boxes: [N,4] float
    (y0, x0, h, w) in pixels, flip: [N] bool or None.  ``clamp=False``
    reads zeros outside the frame (pad-then-crop semantics); with
    ``fill`` (a [C] vector, implies clamp=False semantics) out-of-frame
    samples read that constant instead — the sampling matrices are
    separable, so the out-of-frame weight is the exact outer product of
    the per-axis row-sum deficits (no second warp needed).  Boundary
    samples blend image and fill bilinearly, which is the correct
    behavior for a window that extends past the frame (SSD zoom-out).
    Returns [N, out_h, out_w, C] float32.  Pure matmuls — no gathers.
    True-f32 precision by default: even at ImageNet batch sizes these
    contractions are <1ms on the MXU, and exact interpolation keeps the
    geometry bit-stable across backends.
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    if fill is not None:
        clamp = False
    mh = _axis_matrix(boxes[:, 0], boxes[:, 2], h, oh,
                      clamp=clamp)                              # [N,OH,H]
    mw = _axis_matrix(boxes[:, 1], boxes[:, 3], w, ow, flip,
                      clamp=clamp)                              # [N,OW,W]
    interp_dtype = jnp.dtype(interp_dtype)
    if interp_dtype == jnp.bfloat16:
        # bf16 MXU path with f32 accumulation: u8 pixel values (<=255)
        # are exact in bf16; only the interpolation weights round
        mh, mw = mh.astype(jnp.bfloat16), mw.astype(jnp.bfloat16)
        xf = images.astype(jnp.bfloat16)
        precision = None
    else:
        xf = images.astype(jnp.float32)
    y = jnp.einsum("nih,nhwc->niwc", mh, xf,
                   preferred_element_type=jnp.float32, precision=precision)
    y = jnp.einsum("njw,niwc->nijc", mw, y.astype(interp_dtype),
                   preferred_element_type=jnp.float32, precision=precision)
    if fill is not None:
        # coverage (in-frame sample weight) factors over the two axes
        # (f32 even under bf16 interp: the deficit must be exact)
        cov = (mh.astype(jnp.float32).sum(-1)[:, :, None]
               * mw.astype(jnp.float32).sum(-1)[:, None, :])  # [N,OH,OW]
        y = y + (1.0 - cov)[..., None] * jnp.asarray(fill, jnp.float32)
    return y


def random_resized_crop_boxes(key: jax.Array, n: int, in_hw: tuple[int, int],
                              area_range=(0.08, 1.0),
                              aspect_range=(3 / 4, 4 / 3)) -> jax.Array:
    """Inception-style random crop boxes [N,4] = (y0, x0, h, w), in-jit.

    The TF reference uses rejection sampling
    (sample_distorted_bounding_box); rejection loops are hostile to XLA,
    so we sample area/aspect once and *clamp* the box to the image — the
    distribution is near-identical for the standard ranges and the code
    is branch-free.
    """
    h, w = in_hw
    k_area, k_aspect, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (n,), minval=area_range[0],
                              maxval=area_range[1]) * (h * w)
    log_ar = jax.random.uniform(
        k_aspect, (n,), minval=jnp.log(aspect_range[0]),
        maxval=jnp.log(aspect_range[1]))
    aspect = jnp.exp(log_ar)
    ch = jnp.sqrt(area / aspect)
    cw = ch * aspect
    ch = jnp.minimum(ch, float(h))
    cw = jnp.minimum(cw, float(w))
    y0 = jax.random.uniform(k_y, (n,)) * (h - ch)
    x0 = jax.random.uniform(k_x, (n,)) * (w - cw)
    return jnp.stack([y0, x0, ch, cw], axis=1)


def pad_crop_boxes(key: jax.Array, n: int, in_hw: tuple[int, int],
                   pad: int) -> jax.Array:
    """CIFAR-style pad-by-p-then-random-crop as a box over the *unpadded*
    image: INTEGER offsets in [-pad, +pad] (the reference shifts by whole
    pixels; fractional offsets would bilinearly blur every image).  Use
    with ``clamp=False`` so out-of-frame samples read the zero padding —
    matching the fused Pallas kernel (ops/pallas/pad_crop_u8.py)."""
    h, w = in_hw
    off = jax.random.randint(key, (n, 2), minval=-pad,
                             maxval=pad + 1).astype(jnp.float32)
    hw = jnp.broadcast_to(jnp.asarray([[float(h), float(w)]]), (n, 2))
    return jnp.concatenate([off, hw], axis=1)


def center_crop_boxes(n: int, in_hw: tuple[int, int],
                      crop_fraction: float = 0.875) -> jax.Array:
    h, w = in_hw
    side = crop_fraction * min(h, w)
    y0 = (h - side) / 2.0
    x0 = (w - side) / 2.0
    box = jnp.asarray([y0, x0, side, side], jnp.float32)
    return jnp.broadcast_to(box[None, :], (n, 4))


def _nearest_axis_matrix(start: jax.Array, extent: jax.Array, in_size: int,
                         out_size: int, flip: jax.Array | None = None,
                         clamp: bool = True) -> jax.Array:
    """One-hot (nearest-neighbor) sampling matrix [N, out, in] — used for
    segmentation masks, where label values must be preserved exactly.
    ``clamp=False`` leaves out-of-frame rows all-zero."""
    n = start.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)
    frac = (i + 0.5) / out_size
    if flip is not None:
        frac = jnp.where(flip[:, None], 1.0 - frac[None, :], frac[None, :])
    else:
        frac = jnp.broadcast_to(frac[None, :], (n, out_size))
    src = start[:, None] + frac * extent[:, None] - 0.5
    src = jnp.round(src)
    if clamp:
        src = jnp.clip(src, 0.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)
    return (src[:, :, None] == j[None, None, :]).astype(jnp.float32)


def batched_crop_nearest(masks: jax.Array, boxes: jax.Array,
                         out_hw: tuple[int, int],
                         flip: jax.Array | None = None,
                         clamp: bool = True,
                         fill_label: int = 255) -> jax.Array:
    """Nearest crop+resize for int label masks [N,H,W] with the same boxes
    as the paired image transform.  One-hot matrices keep values exact
    (ignore_label 255 survives untouched).  With ``clamp=False``
    (pad-crop geometry) out-of-frame pixels become ``fill_label`` — the
    padded border carries no ground truth, so it must be ignored, not
    trained as class 0 or an edge-replicated label."""
    n, h, w = masks.shape
    oh, ow = out_hw
    mh = _nearest_axis_matrix(boxes[:, 0], boxes[:, 2], h, oh, clamp=clamp)
    mw = _nearest_axis_matrix(boxes[:, 1], boxes[:, 3], w, ow, flip,
                              clamp=clamp)
    mf = masks.astype(jnp.float32)
    y = jnp.einsum("nih,nhw->niw", mh, mf, precision="highest")
    y = jnp.einsum("njw,niw->nij", mw, y, precision="highest")
    out = jnp.round(y).astype(masks.dtype)
    if not clamp:
        # per-pixel coverage = (row has a source) x (col has a source)
        cover = (jnp.sum(mh, -1)[:, :, None] *
                 jnp.sum(mw, -1)[:, None, :])          # [N,OH,OW]
        out = jnp.where(cover > 0.5, out,
                        jnp.asarray(fill_label, masks.dtype))
    return out


# ------------------------------------------------------------- photometric

def _rgb_to_gray(x: jax.Array) -> jax.Array:
    coef = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * coef, axis=-1, keepdims=True)


def color_jitter(key: jax.Array, x: jax.Array, *, brightness: float = 0.0,
                 contrast: float = 0.0, saturation: float = 0.0,
                 hue: float = 0.0) -> jax.Array:
    """Random brightness/contrast/saturation/hue on [0,1] float images.

    Factor conventions follow tf.image: brightness adds a delta in
    [-b, b]; contrast/saturation scale around the per-image mean/gray by
    a factor in [1-c, 1+c]; hue rotates chroma by a fraction of the color
    wheel in [-h, h] (implemented as a YIQ-space rotation — a 3x3 matmul,
    not an HSV conversion, so it stays fusable elementwise work).
    """
    n = x.shape[0]
    k_b, k_c, k_s, k_h = jax.random.split(key, 4)
    shape = (n, 1, 1, 1)
    if brightness > 0.0:
        delta = jax.random.uniform(k_b, shape, minval=-brightness,
                                   maxval=brightness)
        x = x + delta
    if contrast > 0.0:
        f = jax.random.uniform(k_c, shape, minval=1.0 - contrast,
                               maxval=1.0 + contrast)
        mean = jnp.mean(_rgb_to_gray(x), axis=(1, 2), keepdims=True)
        x = (x - mean) * f + mean
    if saturation > 0.0:
        f = jax.random.uniform(k_s, shape, minval=1.0 - saturation,
                               maxval=1.0 + saturation)
        gray = _rgb_to_gray(x)
        x = gray + (x - gray) * f
    if hue > 0.0:
        theta = jax.random.uniform(k_h, (n, 1, 1), minval=-hue,
                                   maxval=hue) * (2.0 * jnp.pi)
        # RGB -> YIQ, rotate IQ by theta, back to RGB (exact inverse so
        # theta=0 is a true identity)
        import numpy as _np
        _to = _np.array([[0.299, 0.587, 0.114],
                         [0.596, -0.274, -0.322],
                         [0.211, -0.523, 0.312]], _np.float64)
        to_yiq = jnp.asarray(_to, x.dtype)
        from_yiq = jnp.asarray(_np.linalg.inv(_to), x.dtype)
        yiq = jnp.einsum("nhwc,dc->nhwd", x, to_yiq, precision="highest")
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i, q = yiq[..., 1], yiq[..., 2]
        yiq = jnp.stack([yiq[..., 0], cos * i - sin * q,
                         sin * i + cos * q], axis=-1)
        x = jnp.einsum("nhwd,cd->nhwc", yiq, from_yiq, precision="highest")
    return jnp.clip(x, 0.0, 1.0)


def normalize(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD
              ) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


# ------------------------------------------------------------ fused driver

def _sample_geometry(key: jax.Array, n: int, hw: tuple[int, int],
                     cfg: AugmentConfig):
    """Shared random-geometry draw: (boxes [N,4], flip [N] | None,
    clamp) for the configured crop mode.  The pad-crop mode returns
    clamp=False (zero padding outside the frame)."""
    h, w = hw
    k_box, k_flip = jax.random.split(key)
    clamp = True
    if cfg.area_range is not None:
        boxes = random_resized_crop_boxes(k_box, n, (h, w), cfg.area_range,
                                          cfg.aspect_range)
    elif cfg.pad > 0:
        boxes = pad_crop_boxes(k_box, n, (h, w), cfg.pad)
        clamp = False
    else:
        boxes = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, float(h), float(w)])[None], (n, 4))
    flip = jax.random.bernoulli(k_flip, 0.5, (n,)) if cfg.flip else None
    return boxes, flip, clamp


def augment_train(key: jax.Array, images_u8: jax.Array,
                  cfg: AugmentConfig) -> jax.Array:
    """Full training augmentation chain, one jitted program.

    images_u8: [N,H,W,C] uint8 (as transferred from host).  Returns
    [N,OH,OW,C] float32, normalized.
    """
    n, h, w, _ = images_u8.shape
    k_geom, k_color, k_ra = jax.random.split(key, 3)
    boxes, flip, clamp = _sample_geometry(k_geom, n, (h, w), cfg)
    x = batched_crop_resize(images_u8, boxes, cfg.out_hw, flip,
                            clamp=clamp, interp_dtype=cfg.interp_dtype)
    x = x * (1.0 / 255.0)
    if cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue:
        x = color_jitter(k_color, x, brightness=cfg.brightness,
                         contrast=cfg.contrast, saturation=cfg.saturation,
                         hue=cfg.hue)
    if cfg.randaugment is not None and cfg.autoaugment is not None:
        raise ValueError("set randaugment OR autoaugment, not both")
    if cfg.randaugment is not None:
        from myconvnet_tpu.data.randaugment import (CANONICAL_OPS,
                                                    rand_augment)
        layers, mag = cfg.randaugment
        ops = cfg.randaugment_ops
        if isinstance(ops, str):
            from myconvnet_tpu.data.randaugment import FAST_OPS
            named = {"canonical": CANONICAL_OPS, "fast": FAST_OPS}
            if ops not in named:
                raise ValueError(
                    f"randaugment_ops={ops!r}: named pools are "
                    f"{sorted(named)} (or pass a tuple of op names)")
            ops = named[ops]
        x = rand_augment(k_ra, x, num_layers=int(layers),
                         magnitude=float(mag), ops=ops,
                         backend=cfg.randaugment_backend)
    elif cfg.autoaugment is not None:
        from myconvnet_tpu.data.randaugment import auto_augment
        x = auto_augment(k_ra, x, policy=cfg.autoaugment)
    return normalize(x, cfg.mean, cfg.std).astype(cfg.out_dtype)


def augment_eval(images_u8: jax.Array, cfg: AugmentConfig,
                 crop_fraction: float = 0.875) -> jax.Array:
    """Eval-time chain: center crop -> resize -> normalize."""
    n, h, w, _ = images_u8.shape
    if (h, w) == tuple(cfg.out_hw):
        x = images_u8.astype(jnp.float32)
    else:
        boxes = center_crop_boxes(n, (h, w), crop_fraction)
        x = batched_crop_resize(images_u8, boxes, cfg.out_hw,
                                interp_dtype=cfg.interp_dtype)
    return normalize(x * (1.0 / 255.0), cfg.mean,
                     cfg.std).astype(cfg.out_dtype)


# -------------------------------------------------- paired (segmentation)

def augment_train_pair(key: jax.Array, images_u8: jax.Array,
                       masks: jax.Array, cfg: AugmentConfig
                       ) -> tuple[jax.Array, jax.Array]:
    """Segmentation training chain: identical random geometry applied to
    image (bilinear) and mask (nearest, exact labels); photometric jitter
    on the image only.  ``cfg.area_range`` here means scale range of the
    crop relative to the image (DeepLab-style 0.5-2.0 random scaling is
    expressed as area 0.25-4 clamped to the frame).  Under the pad-crop
    mode the image reads zero padding and the mask reads ignore-label."""
    n, h, w, _ = images_u8.shape
    k_geom, k_color = jax.random.split(key)
    boxes, flip, clamp = _sample_geometry(k_geom, n, (h, w), cfg)
    x = batched_crop_resize(images_u8, boxes, cfg.out_hw, flip,
                            clamp=clamp, interp_dtype=cfg.interp_dtype)
    x = x * (1.0 / 255.0)
    if cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue:
        x = color_jitter(k_color, x, brightness=cfg.brightness,
                         contrast=cfg.contrast, saturation=cfg.saturation,
                         hue=cfg.hue)
    y = batched_crop_nearest(masks, boxes, cfg.out_hw, flip, clamp=clamp)
    return normalize(x, cfg.mean, cfg.std).astype(cfg.out_dtype), y


def augment_eval_pair(images_u8: jax.Array, masks: jax.Array,
                      cfg: AugmentConfig) -> tuple[jax.Array, jax.Array]:
    """Eval chain for segmentation: full-frame resize (no crop — mIoU is
    computed against the full mask)."""
    n, h, w, _ = images_u8.shape
    boxes = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, float(h), float(w)])[None], (n, 4))
    x = batched_crop_resize(images_u8, boxes, cfg.out_hw,
                            interp_dtype=cfg.interp_dtype)
    y = batched_crop_nearest(masks, boxes, cfg.out_hw)
    return (normalize(x * (1.0 / 255.0), cfg.mean,
                      cfg.std).astype(cfg.out_dtype), y)
