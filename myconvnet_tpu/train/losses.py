"""Loss functions: softmax-CE (cls), per-pixel CE (seg), GAN losses.

Rebuild of the reference's ``_build_loss`` variants (SURVEY.md §3.2):
softmax cross-entropy for classification, per-pixel cross-entropy with
ignore-label for segmentation, sigmoid adversarial (+L1) for GANs.
All reduce in f32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array, *,
                          num_classes: int | None = None,
                          label_smoothing: float = 0.0) -> jax.Array:
    """Mean CE. ``labels``: int [N] or one-hot [N, C]."""
    logits = logits.astype(jnp.float32)
    nc = num_classes or logits.shape[-1]
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels, nc, dtype=jnp.float32)
    else:
        onehot = labels.astype(jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / nc
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def pixel_cross_entropy(logits: jax.Array, labels: jax.Array, *,
                        ignore_label: int | None = 255,
                        label_smoothing: float = 0.0) -> jax.Array:
    """Per-pixel CE over [N,H,W,C] logits and [N,H,W] int labels,
    masking ``ignore_label`` pixels (VOC boundary regions)."""
    logits = logits.astype(jnp.float32)
    nc = logits.shape[-1]
    valid = jnp.ones(labels.shape, jnp.float32) if ignore_label is None \
        else (labels != ignore_label).astype(jnp.float32)
    safe = jnp.where(valid > 0, labels, 0)
    onehot = jax.nn.one_hot(safe, nc, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / nc
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1) * valid
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)


def dice_loss(logits: jax.Array, labels: jax.Array, *,
              ignore_label: int | None = 255,
              eps: float = 1.0) -> jax.Array:
    """Soft Dice loss over [N,H,W,C] logits / [N,H,W] int labels —
    the class-imbalance-robust companion to per-pixel CE (medical/thin-
    structure segmentation).  One-hot overlaps are batched matmul-free
    elementwise sums; ignore pixels drop out of both numerator and
    denominator."""
    logits = logits.astype(jnp.float32)
    nc = logits.shape[-1]
    valid = jnp.ones(labels.shape, jnp.float32) if ignore_label is None \
        else (labels != ignore_label).astype(jnp.float32)
    safe = jnp.where(valid > 0, labels, 0)
    onehot = jax.nn.one_hot(safe, nc, dtype=jnp.float32) \
        * valid[..., None]
    probs = jax.nn.softmax(logits, axis=-1) * valid[..., None]
    inter = jnp.sum(probs * onehot, axis=(1, 2))          # [N, C]
    denom = jnp.sum(probs + onehot, axis=(1, 2))
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def focal_loss(logits: jax.Array, labels: jax.Array, *,
               gamma: float = 2.0, alpha=None,
               ignore_label: int | None = None) -> jax.Array:
    """Focal loss (Lin et al.): CE scaled by (1 - p_t)^gamma — easy
    examples fade, hard ones dominate (extreme class imbalance).
    Works for [N,C] classification and [N,H,W,C] segmentation logits
    (int labels of matching rank).

    ``alpha`` — the paper's alpha_t class weighting: a length-C
    sequence gives each *target class* its own weight (the multiclass
    generalization of the paper's binary {alpha, 1-alpha} pair; for
    two classes pass ``(1-a, a)`` to reproduce it exactly).  A scalar
    is a plain uniform loss rescale (kept for convenience; it is NOT
    the paper's alpha_t)."""
    logits = logits.astype(jnp.float32)
    if labels.ndim != logits.ndim - 1:
        raise ValueError(
            "focal_loss needs integer class labels; soft labels "
            "(MixUp/CutMix) have no standard focal form — use "
            "softmax_cross_entropy for mixed batches")
    nc = logits.shape[-1]
    valid = jnp.ones(labels.shape, jnp.float32) if ignore_label is None \
        else (labels != ignore_label).astype(jnp.float32)
    safe = jnp.where(valid > 0, labels, 0)
    onehot = jax.nn.one_hot(safe, nc, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.sum(onehot * logp, axis=-1)
    p_t = jnp.exp(logp_t)
    w = (1.0 - p_t) ** gamma
    if alpha is not None:
        a = jnp.asarray(alpha, jnp.float32)
        if a.ndim == 1:
            if a.shape[0] != nc:
                raise ValueError(
                    f"per-class alpha needs length {nc}, got {a.shape[0]}")
            w = w * jnp.sum(onehot * a, axis=-1)   # alpha_t by target
        else:
            w = w * a                              # uniform rescale
    loss = -w * logp_t * valid
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)


def ce_dice_loss(logits: jax.Array, labels: jax.Array, *,
                 ignore_label: int | None = 255,
                 dice_weight: float = 1.0,
                 label_smoothing: float = 0.0,
                 eps: float = 1.0) -> jax.Array:
    """The standard CE + Dice combination, computed fused: the validity
    mask, one-hot and softmax are shared between the two terms (a
    per-pixel cost that XLA does not reliably CSE across separate
    calls)."""
    logits = logits.astype(jnp.float32)
    nc = logits.shape[-1]
    valid = jnp.ones(labels.shape, jnp.float32) if ignore_label is None \
        else (labels != ignore_label).astype(jnp.float32)
    safe = jnp.where(valid > 0, labels, 0)
    onehot = jax.nn.one_hot(safe, nc, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    target = onehot
    if label_smoothing > 0.0:
        target = onehot * (1.0 - label_smoothing) + label_smoothing / nc
    ce = -jnp.sum(target * logp, axis=-1) * valid
    ce = jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)
    probs = jnp.exp(logp) * valid[..., None]
    onehot_v = onehot * valid[..., None]
    inter = jnp.sum(probs * onehot_v, axis=(1, 2))
    denom = jnp.sum(probs + onehot_v, axis=(1, 2))
    dice = 1.0 - jnp.mean((2.0 * inter + eps) / (denom + eps))
    return ce + dice_weight * dice


def silog_loss(pred: jax.Array, target: jax.Array, *,
               lam: float = 0.5, eps: float = 1e-6) -> jax.Array:
    """Scale-invariant log loss (Eigen, Puhrsch & Fergus, 2014) for
    monocular depth: ``d = log(pred) - log(gt)`` over VALID pixels
    (gt > 0; zeros mark missing sensor returns in the NYU/KITTI
    convention), ``L = mean(d^2) - lam * mean(d)^2``.  ``lam=0.5`` is
    the paper's setting; ``lam=0`` is plain log-MSE.  Computes in f32
    (log of bf16 depths loses the near-range resolution the
    inverse-depth head exists to provide)."""
    p = jnp.maximum(pred.astype(jnp.float32), eps)
    t = target.astype(jnp.float32)
    valid = (t > 0).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    d = (jnp.log(p) - jnp.log(jnp.maximum(t, eps))) * valid
    return jnp.sum(d * d) / n - lam * jnp.square(jnp.sum(d) / n)


def epe_loss(pred: jax.Array, target: jax.Array, *,
             eps: float = 1e-3) -> jax.Array:
    """End-point-error loss for optical flow: mean over valid pixels
    of ``sqrt(du^2 + dv^2 + eps^2)`` (Charbonnier-smoothed so the
    gradient is defined at zero error — the FlowNet training loss).
    ``target`` is ``[N, H, W, 2]``; NaN components (the .flo unknown
    sentinel) mask the pixel out.  Computes in f32."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    valid = jnp.isfinite(t).all(axis=-1)
    t = jnp.where(valid[..., None], t, 0.0)
    d = p - t
    epe = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps * eps)
    vf = valid.astype(jnp.float32)
    return jnp.sum(epe * vf) / jnp.maximum(jnp.sum(vf), 1.0)


_PWC_LEVEL_WEIGHTS = (0.32, 0.08, 0.02, 0.01, 0.005)  # levels 6..2


def _nan_avg_pool_flow(target: jax.Array, hw) -> jax.Array:
    """NaN-aware average pooling of a ``[N, H, W, 2]`` flow map to
    ``hw`` (H, W must be integer multiples): unknown (NaN) pixels are
    excluded from each window's mean; an all-unknown window stays NaN
    so :func:`epe_loss` keeps masking it."""
    n, h, w, c = target.shape
    oh, ow = hw
    if h % oh or w % ow:
        raise ValueError(f"cannot pool {(h, w)} to {hw}: non-integer "
                         "stride")
    ky, kx = h // oh, w // ow
    t = target.reshape(n, oh, ky, ow, kx, c)
    valid = jnp.isfinite(t).all(axis=-1, keepdims=True)
    tz = jnp.where(valid, t, 0.0)
    cnt = jnp.sum(valid, axis=(2, 4))
    s = jnp.sum(tz, axis=(2, 4))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)


def multiscale_epe_loss(preds, target: jax.Array, *,
                        weights=None, eps: float = 1e-3) -> jax.Array:
    """Multi-scale deep supervision for coarse-to-fine flow nets
    (PWC-Net / FlowNet training schedule): a weighted Charbonnier EPE
    per pyramid level, each against the NaN-aware average-pooled
    ground truth.  ``preds`` is the coarse-to-fine list of
    ``[N, h_l, w_l, 2]`` flows in FULL-RESOLUTION pixels (the
    framework's flow convention); default ``weights`` are the PWC-Net
    paper's alphas (0.32 ... 0.005) when five levels are supervised,
    uniform otherwise."""
    preds = list(preds)
    if weights is None:
        weights = (_PWC_LEVEL_WEIGHTS if len(preds) == 5
                   else (1.0 / len(preds),) * len(preds))
    if len(weights) != len(preds):
        raise ValueError(f"{len(weights)} weights for {len(preds)} "
                         "pyramid levels")
    total = 0.0
    for w_l, p in zip(weights, preds):
        t_l = _nan_avg_pool_flow(target, p.shape[1:3])
        total = total + w_l * epe_loss(p, t_l, eps=eps)
    return total


def occlusion_mask(flow_fwd: jax.Array, flow_bwd: jax.Array, *,
                   alpha1: float = 0.01,
                   alpha2: float = 0.5) -> jax.Array:
    """Forward-backward consistency occlusion mask (Meister et al.
    UnFlow / Sundaram et al.): a pixel is NON-occluded (mask 1) where
    the forward flow and the backward flow sampled at the forward
    target roughly cancel,

        ``|f + b∘f|^2 < alpha1 * (|f|^2 + |b∘f|^2) + alpha2``

    — occluded pixels land somewhere whose backward flow points
    elsewhere, so the sum stays large.  Returns ``[N, H, W, 1]`` f32
    in {0, 1}; callers ``stop_gradient`` it (the mask is a gate, not
    a differentiable objective).
    """
    from myconvnet_tpu.ops.warp import warp_bilinear

    f = flow_fwd.astype(jnp.float32)
    b = warp_bilinear(flow_bwd.astype(jnp.float32), f)
    sq_sum = jnp.sum(jnp.square(f + b), axis=-1, keepdims=True)
    sq_mag = (jnp.sum(jnp.square(f), axis=-1, keepdims=True)
              + jnp.sum(jnp.square(b), axis=-1, keepdims=True))
    return (sq_sum < alpha1 * sq_mag + alpha2).astype(jnp.float32)


def _photo_smooth(fl, f_src, f_tgt, *, edge_sharpness, eps, mask=None):
    """Masked photometric Charbonnier (f_src vs f_tgt warped by fl)
    plus edge-aware smoothness of fl w.r.t. f_src's edges."""
    from myconvnet_tpu.ops.warp import warp_bilinear

    warped = warp_bilinear(f_tgt, fl)
    err = jnp.sqrt(jnp.square(f_src - warped) + eps * eps)
    if mask is None:
        photo = jnp.mean(err)
    else:
        m = jax.lax.stop_gradient(mask)
        # normalize by the live-pixel count so a shrinking mask cannot
        # shrink the loss (the degenerate "declare everything occluded"
        # escape); the mask itself carries no gradient
        photo = (jnp.sum(err * m)
                 / (jnp.sum(m) * err.shape[-1] + 1e-6))
    du_x = jnp.abs(fl[:, :, 1:] - fl[:, :, :-1]).sum(-1)
    du_y = jnp.abs(fl[:, 1:] - fl[:, :-1]).sum(-1)
    gx = jnp.mean(jnp.abs(f_src[:, :, 1:] - f_src[:, :, :-1]), axis=-1)
    gy = jnp.mean(jnp.abs(f_src[:, 1:] - f_src[:, :-1]), axis=-1)
    smooth = (jnp.mean(du_x * jnp.exp(-edge_sharpness * gx))
              + jnp.mean(du_y * jnp.exp(-edge_sharpness * gy)))
    return photo, smooth


def unsupervised_flow_loss(pred, frames: jax.Array, *,
                           smooth_weight: float = 0.05,
                           edge_sharpness: float = 50.0,
                           eps: float = 1e-3,
                           occlusion: bool = False,
                           occ_alpha1: float = 0.01,
                           occ_alpha2: float = 0.5) -> jax.Array:
    """Unsupervised optical-flow objective: photometric Charbonnier
    between frame 1 and frame 2 backward-warped by the predicted flow
    (brightness constancy — no ground truth consumed), plus
    first-order edge-aware smoothness (flow gradients are cheap
    except across image edges: ``|d flow| * exp(-sharpness *
    |d image|)``, the Jonschkowski et al. "What Matters in
    Unsupervised Optical Flow" baseline form).

    ``pred`` is ``[N, h, w, 2]`` (full-resolution pixels) or the
    coarse-to-fine pyramid list (the finest level is upsampled and
    supervised); ``frames`` is the ``[N, H, W, 6]`` channel-stacked
    pair in [0, 1] — the recipe passes the augmented frames as the
    training target, so the loss sees exactly what the model saw.

    ``occlusion=True`` enables the bidirectional form: ``pred`` must
    carry ``2N`` flows — the first ``N`` for the (f1, f2) pairs, the
    second ``N`` for the SWAPPED (f2, f1) pairs (the recipe doubles
    the batch inside the jitted step, so both directions ride one
    forward pass).  Photometric terms in both directions are gated by
    the forward-backward consistency mask (:func:`occlusion_mask`,
    stop-gradient, live-pixel normalized) so occluded pixels — whose
    true match is invisible — stop dragging the flow toward wrong
    matches; smoothness stays unmasked (it is exactly the occluded
    pixels that must be filled by their neighborhood).  Computes in
    f32.
    """
    from myconvnet_tpu.ops.resize import resize_bilinear

    if isinstance(pred, (list, tuple)):
        pred = pred[-1]
    fr = frames.astype(jnp.float32)
    n, h, w, _ = fr.shape
    fl = pred.astype(jnp.float32)
    if fl.shape[1:3] != (h, w):
        fl = resize_bilinear(fl, (h, w))
    f1, f2 = fr[..., :3], fr[..., 3:]
    if not occlusion:
        if fl.shape[0] != n:
            raise ValueError(f"{fl.shape[0]} flows for {n} frame pairs")
        photo, smooth = _photo_smooth(
            fl, f1, f2, edge_sharpness=edge_sharpness, eps=eps)
        return photo + smooth_weight * smooth
    if fl.shape[0] != 2 * n:
        raise ValueError(
            f"occlusion=True needs 2N={2 * n} flows (forward pairs "
            f"then swapped pairs), got {fl.shape[0]}")
    f_fwd, f_bwd = fl[:n], fl[n:]
    m_fwd = occlusion_mask(f_fwd, f_bwd,
                           alpha1=occ_alpha1, alpha2=occ_alpha2)
    m_bwd = occlusion_mask(f_bwd, f_fwd,
                           alpha1=occ_alpha1, alpha2=occ_alpha2)
    p_f, s_f = _photo_smooth(f_fwd, f1, f2, edge_sharpness=edge_sharpness,
                             eps=eps, mask=m_fwd)
    p_b, s_b = _photo_smooth(f_bwd, f2, f1, edge_sharpness=edge_sharpness,
                             eps=eps, mask=m_bwd)
    return 0.5 * (p_f + p_b) + smooth_weight * 0.5 * (s_f + s_b)


def siamfc_loss(resp: jax.Array, offsets: jax.Array, *,
                radius: float = 8.0, stride: int = 4,
                eps: float = 1e-6) -> jax.Array:
    """Balanced logistic response-map loss (SiamFC, Bertinetto et al.
    §2.2, generalized to off-center targets): response cell (i, j)
    maps to the search-crop offset ``((j - c) * stride,
    (i - c) * stride)`` from the crop center; cells within ``radius``
    px of the TRUE target offset are positives (+1), the rest
    negatives (-1), and each image's positive and negative sets are
    weighted to contribute equally (the paper's class balancing —
    without it the ~97% negatives drown the peak).

    ``resp`` is ``[N, R, R]`` logits; ``offsets`` is ``[N, 2]``
    (dx, dy) f32 pixels.  Targets that fall outside the response
    map's coverage keep whatever cells lie within ``radius`` (possibly
    none — then the image contributes only its negative term).
    Computes in f32.
    """
    r = resp.astype(jnp.float32)
    off = offsets.astype(jnp.float32)
    n, rh, rw = r.shape
    cy, cx = (rh - 1) / 2.0, (rw - 1) / 2.0
    gy = (jnp.arange(rh, dtype=jnp.float32) - cy) * stride
    gx = (jnp.arange(rw, dtype=jnp.float32) - cx) * stride
    dy = gy[None, :, None] - off[:, 1, None, None]
    dx = gx[None, None, :] - off[:, 0, None, None]
    pos = (dy * dy + dx * dx) <= radius * radius        # [N, R, R]
    label = jnp.where(pos, 1.0, -1.0)
    # log(1 + exp(-y * v)), the numerically-stable softplus form
    per_cell = jax.nn.softplus(-label * r)
    posf = pos.astype(jnp.float32)
    negf = 1.0 - posf
    n_pos = jnp.sum(posf, axis=(1, 2))
    n_neg = jnp.sum(negf, axis=(1, 2))
    pos_term = jnp.sum(per_cell * posf, axis=(1, 2)) / (n_pos + eps)
    neg_term = jnp.sum(per_cell * negf, axis=(1, 2)) / (n_neg + eps)
    return jnp.mean(0.5 * pos_term + 0.5 * neg_term)


def sigmoid_bce(logits: jax.Array, target: float | jax.Array) -> jax.Array:
    """Numerically-stable sigmoid binary CE against a constant or tensor
    target (GAN real/fake labels)."""
    logits = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), logits.shape)
    # max(x,0) - x*t + log(1 + exp(-|x|))
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * t +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def gan_discriminator_loss(real_logits: jax.Array,
                           fake_logits: jax.Array) -> jax.Array:
    """Non-saturating GAN D loss: real->1, fake->0."""
    return sigmoid_bce(real_logits, 1.0) + sigmoid_bce(fake_logits, 0.0)


def gan_generator_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating G loss: fool D (fake->1)."""
    return sigmoid_bce(fake_logits, 1.0)


def lsgan_discriminator_loss(real_logits: jax.Array,
                             fake_logits: jax.Array) -> jax.Array:
    """Least-squares GAN (Mao et al.): D regresses real->1, fake->0.
    Penalizes samples by distance to the decision boundary instead of
    log-likelihood — gradients stay informative for confident D."""
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    return 0.5 * (jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f)))


def lsgan_generator_loss(fake_logits: jax.Array) -> jax.Array:
    f = fake_logits.astype(jnp.float32)
    return 0.5 * jnp.mean(jnp.square(f - 1.0))


def hinge_discriminator_loss(real_logits: jax.Array,
                             fake_logits: jax.Array) -> jax.Array:
    """Hinge GAN loss (geometric-margin D; SAGAN/BigGAN standard)."""
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    return (jnp.mean(jax.nn.relu(1.0 - r)) +
            jnp.mean(jax.nn.relu(1.0 + f)))


def hinge_generator_loss(fake_logits: jax.Array) -> jax.Array:
    return -jnp.mean(fake_logits.astype(jnp.float32))


# (d_loss(real, fake), g_loss(fake)) pairs keyed by config name; pure
# elementwise formulas, so every variant fuses into the single GAN step
GAN_LOSSES = {
    "nonsaturating": (gan_discriminator_loss, gan_generator_loss),
    "lsgan": (lsgan_discriminator_loss, lsgan_generator_loss),
    "hinge": (hinge_discriminator_loss, hinge_generator_loss),
}


def get_gan_losses(name: str):
    try:
        return GAN_LOSSES[name]
    except KeyError as e:
        raise ValueError(f"unknown GAN loss {name!r}; valid: "
                         f"{sorted(GAN_LOSSES)}") from e
