"""Batch-mixing augmentation: MixUp, CutMix, Random Erasing — on-device.

The reference's augmentation chain is per-image (crop/flip/jitter,
SURVEY.md §2#5); the modern classification recipes its model zoo implies
(EfficientNet/MobileNet-era) also use *batch-level* label-mixing
regularizers.  These are a natural fit for the TPU design used across
this package: everything runs inside the one jitted train step, shapes
stay static, and control flow is branch-free.

TPU-native formulation — ONE per-pixel weight map expresses both mixes:

    out[n] = w[n] * x[n] + (1 - w[n]) * x[perm[n]]

* MixUp:  ``w[n] = lam_n`` everywhere (a scalar per image, Beta-drawn).
* CutMix: ``w[n] = 1 - inbox[n]`` where ``inbox`` is a rectangle mask
  built from coordinate comparisons (no gathers, no dynamic shapes).

The per-sample choice between the two is a Bernoulli select on the
weight map, and the soft label uses the *realized* mix ratio
``lam_eff = mean(w[n])`` (for CutMix the drawn box is clamped to the
frame, so the realized area ratio — not the drawn lambda — is what the
label must reflect).  Labels come back one-hot/soft [N, C];
``train.losses.softmax_cross_entropy`` consumes them directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixConfig(NamedTuple):
    """Configuration for batch mixing; zero alphas/probs disable parts."""
    mixup_alpha: float = 0.2       # Beta(a, a) for MixUp; 0 disables
    cutmix_alpha: float = 1.0      # Beta(a, a) for CutMix; 0 disables
    prob: float = 1.0              # per-sample probability of mixing at all
    switch_prob: float = 0.5       # P(CutMix | mixing) when both enabled
    label_smoothing: float = 0.0   # folded into the soft labels


def _rect_mask_sized(key: jax.Array, n: int, hw: tuple[int, int],
                     cut_h: jax.Array, cut_w: jax.Array) -> jax.Array:
    """[N,H,W,1] float rectangle masks of per-image size (cut_h, cut_w),
    centers uniform, clamped to the frame.  Pure coordinate comparisons
    (pixel centers at i+0.5) — no gathers, no dynamic shapes."""
    h, w = hw
    k_cy, k_cx = jax.random.split(key)
    cy = jax.random.uniform(k_cy, (n,)) * h
    cx = jax.random.uniform(k_cx, (n,)) * w
    y0 = jnp.clip(cy - cut_h / 2, 0.0, float(h))
    y1 = jnp.clip(cy + cut_h / 2, 0.0, float(h))
    x0 = jnp.clip(cx - cut_w / 2, 0.0, float(w))
    x1 = jnp.clip(cx + cut_w / 2, 0.0, float(w))
    rows = jnp.arange(h, dtype=jnp.float32) + 0.5            # pixel centers
    cols = jnp.arange(w, dtype=jnp.float32) + 0.5
    in_r = ((rows[None, :] >= y0[:, None]) &
            (rows[None, :] < y1[:, None]))                   # [N,H]
    in_c = ((cols[None, :] >= x0[:, None]) &
            (cols[None, :] < x1[:, None]))                   # [N,W]
    return (in_r[:, :, None] & in_c[:, None, :]
            ).astype(jnp.float32)[..., None]                 # [N,H,W,1]


def _rect_mask(key: jax.Array, n: int, hw: tuple[int, int],
               lam: jax.Array) -> jax.Array:
    """CutMix rectangles: area ~= (1-lam) * H*W (up to frame clamping)."""
    h, w = hw
    ratio = jnp.sqrt(jnp.clip(1.0 - lam, 0.0, 1.0))          # [N]
    return _rect_mask_sized(key, n, hw, ratio * h, ratio * w)


def mixup_cutmix(key: jax.Array, x: jax.Array, labels: jax.Array,
                 num_classes: int, cfg: MixConfig = MixConfig()
                 ) -> tuple[jax.Array, jax.Array]:
    """Apply MixUp/CutMix to a batch inside jit.

    x: [N,H,W,C] float images (post-augmentation), labels: int [N] or
    soft [N, C].  Returns (mixed_x, soft_labels [N, C]).
    """
    n, h, w, _ = x.shape
    if labels.ndim == 1:
        y = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    else:
        y = labels.astype(jnp.float32)
    if cfg.label_smoothing > 0.0:
        y = y * (1.0 - cfg.label_smoothing) + cfg.label_smoothing / \
            num_classes
    if cfg.mixup_alpha <= 0.0 and cfg.cutmix_alpha <= 0.0:
        return x, y

    k_perm, k_mlam, k_clam, k_rect, k_switch, k_apply = \
        jax.random.split(key, 6)
    perm = jax.random.permutation(k_perm, n)
    x2 = x[perm]
    y2 = y[perm]

    # per-sample lambdas for each mode (Beta(a, a); 1 = no mix)
    lam_mix = (jax.random.beta(k_mlam, cfg.mixup_alpha, cfg.mixup_alpha,
                               (n,)) if cfg.mixup_alpha > 0.0
               else jnp.ones((n,)))
    lam_cut = (jax.random.beta(k_clam, cfg.cutmix_alpha, cfg.cutmix_alpha,
                               (n,)) if cfg.cutmix_alpha > 0.0
               else jnp.ones((n,)))

    if cfg.mixup_alpha > 0.0 and cfg.cutmix_alpha > 0.0:
        use_cut = jax.random.bernoulli(k_switch, cfg.switch_prob, (n,))
    else:
        use_cut = jnp.full((n,), cfg.mixup_alpha <= 0.0)

    inbox = _rect_mask(k_rect, n, (h, w), lam_cut)           # [N,H,W,1]
    w_map = jnp.where(use_cut[:, None, None, None],
                      1.0 - inbox,
                      lam_mix[:, None, None, None])          # [N,H,W,1]
    apply = jax.random.bernoulli(k_apply, cfg.prob, (n,))
    w_map = jnp.where(apply[:, None, None, None], w_map, 1.0)

    xf = x.astype(jnp.float32)
    mixed = w_map * xf + (1.0 - w_map) * x2.astype(jnp.float32)
    # realized ratio (CutMix boxes are clamped -> use actual area)
    lam_eff = jnp.mean(w_map, axis=(1, 2, 3))                # [N]
    soft = lam_eff[:, None] * y + (1.0 - lam_eff[:, None]) * y2
    return mixed.astype(x.dtype), soft


def random_erasing(key: jax.Array, x: jax.Array, *,
                   prob: float = 0.25,
                   area_range: tuple[float, float] = (0.02, 1.0 / 3.0),
                   aspect_range: tuple[float, float] = (0.3, 3.3),
                   fill: str = "noise") -> jax.Array:
    """Random Erasing (Zhong et al.): blank a random rectangle per image.

    fill: 'noise' (standard-normal, matches normalized-input statistics)
    or 'zero'.  Branch-free: the rectangle is a coordinate mask; the
    per-sample keep/erase decision is a select.
    """
    n, h, w, c = x.shape
    k_area, k_aspect, k_rect, k_apply, k_fill = jax.random.split(key, 5)
    area = jax.random.uniform(k_area, (n,), minval=area_range[0],
                              maxval=area_range[1])
    log_ar = jax.random.uniform(k_aspect, (n,),
                                minval=jnp.log(aspect_range[0]),
                                maxval=jnp.log(aspect_range[1]))
    aspect = jnp.exp(log_ar)
    cut_h = jnp.sqrt(area * h * w * aspect)
    cut_w = jnp.sqrt(area * h * w / aspect)
    mask = _rect_mask_sized(k_rect, n, (h, w), cut_h, cut_w) > 0.0
    apply = jax.random.bernoulli(k_apply, prob, (n,))
    mask = mask & apply[:, None, None, None]
    if fill == "noise":
        filler = jax.random.normal(k_fill, x.shape, jnp.float32)
    else:
        filler = jnp.zeros(x.shape, jnp.float32)
    out = jnp.where(mask, filler.astype(x.dtype), x)
    return out
