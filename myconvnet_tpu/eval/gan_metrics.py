"""GAN evaluation metrics: Frechet distance (FID) and Inception Score.

The reference trains GANs but never scores them (SURVEY.md §3.5); a
production framework needs the standard metrics.  Both are implemented
over ANY feature extractor / classifier — plug in
``ConvNet.features`` / ``predict`` of whatever backbone you have
(canonical FID uses an ImageNet Inception-v3; this environment has no
egress for those weights, so the extractor is a parameter, and the
*math* is tested exactly against closed forms).

The Frechet distance uses the eigendecomposition form
``trace(S1 + S2 - 2*(S1^{1/2} S2 S1^{1/2})^{1/2})`` computed with
symmetric eigensolves — no scipy.linalg.sqrtm dependency, jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def activation_statistics(features: jax.Array
                          ) -> tuple[jax.Array, jax.Array]:
    """(mean [D], covariance [D,D]) of [N, D] (or [N,...,D]) features."""
    f = jnp.asarray(features, jnp.float32)
    if f.ndim > 2:
        f = f.reshape(f.shape[0], -1)
    mu = jnp.mean(f, axis=0)
    d = f - mu
    cov = d.T @ d / jnp.maximum(f.shape[0] - 1, 1)
    return mu, cov


def _sqrtm_psd(m: jax.Array) -> jax.Array:
    """Matrix square root of a symmetric PSD matrix via eigh (clamped)."""
    vals, vecs = jnp.linalg.eigh((m + m.T) / 2.0)
    vals = jnp.maximum(vals, 0.0)
    return (vecs * jnp.sqrt(vals)[None, :]) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> jax.Array:
    """FID between two Gaussians: ||mu1-mu2||^2 +
    tr(C1 + C2 - 2 (C1^1/2 C2 C1^1/2)^1/2)."""
    mu1, mu2 = jnp.asarray(mu1), jnp.asarray(mu2)
    cov1, cov2 = jnp.asarray(cov1), jnp.asarray(cov2)
    diff = jnp.sum(jnp.square(mu1 - mu2))
    s1h = _sqrtm_psd(cov1)
    cross = _sqrtm_psd(s1h @ cov2 @ s1h)
    return diff + jnp.trace(cov1) + jnp.trace(cov2) \
        - 2.0 * jnp.trace(cross)


def fid_from_features(real_features, fake_features) -> float:
    """FID given two [N, D] feature batches from the same extractor."""
    mu1, c1 = activation_statistics(real_features)
    mu2, c2 = activation_statistics(fake_features)
    return float(frechet_distance(mu1, c1, mu2, c2))


def inception_score(logits, *, splits: int = 10) -> tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over a classifier's logits.

    Returns (mean, std) over ``splits`` partitions (Salimans et al.).
    """
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(logits, jnp.float32), -1))
    n = probs.shape[0]
    scores = []
    splits = max(1, min(splits, n))
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(np.maximum(part, 1e-12)) -
                            np.log(np.maximum(marginal, 1e-12))),
                    axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
