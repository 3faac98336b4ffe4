"""Image-quality metrics: PSNR and SSIM (jittable, NHWC batches).

The paired-translation eval the reference era used for pix2pix-style
models (complementing the GAN metrics in ``eval/gan_metrics.py``).
Both are pure elementwise/window math — SSIM's local statistics are
5 uniform-filter convolutions, which XLA fuses into two passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def psnr(a: jax.Array, b: jax.Array, *,
         max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio per image pair ([N,H,W,C] -> [N] dB)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    mse = jnp.mean(jnp.square(af - bf), axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """Mean over size x size windows (VALID), per channel. [N,H,W,C]."""
    c = x.shape[-1]
    k = jnp.full((size, size, 1, 1), 1.0 / (size * size), jnp.float32)
    k = jnp.tile(k, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def ssim(a: jax.Array, b: jax.Array, *, max_val: float = 1.0,
         window: int = 7, k1: float = 0.01,
         k2: float = 0.03) -> jax.Array:
    """Mean structural similarity per image pair ([N,H,W,C] -> [N]).

    Uniform (not Gaussian) windows — the tf.image.ssim ``filter_sigma``
    default differs slightly; for model-selection purposes the ranking
    is identical and the uniform filter is one fused reduce_window.
    """
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _uniform_filter(af, window)
    mu_b = _uniform_filter(bf, window)
    s_aa = _uniform_filter(af * af, window) - mu_a * mu_a
    s_bb = _uniform_filter(bf * bf, window) - mu_b * mu_b
    s_ab = _uniform_filter(af * bf, window) - mu_a * mu_b
    lum = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    con = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    return jnp.mean(lum * con, axis=(1, 2, 3))


class PairedImageEvaluator:
    """Evaluator-surface wrapper (score/is_better) over PSNR or SSIM for
    paired-translation models: update(pred_images, target_images)."""

    higher_is_better = True

    def __init__(self, metric: str = "psnr", max_val: float = 1.0):
        if metric not in ("psnr", "ssim"):
            raise ValueError(f"unknown image metric {metric!r}")
        self.name = metric
        self._fn = psnr if metric == "psnr" else ssim
        self._max_val = max_val
        self.reset()

    def reset(self):
        self._sum = 0.0
        self._n = 0

    def update(self, pred, target):
        vals = self._fn(jnp.asarray(pred), jnp.asarray(target),
                        max_val=self._max_val)
        self._sum += float(jnp.sum(vals))
        self._n += int(vals.shape[0])

    def score(self) -> float:
        return self._sum / max(self._n, 1)

    def worst_score(self) -> float:
        return float("-inf")

    def is_better(self, curr: float, best: float) -> bool:
        return curr > best
