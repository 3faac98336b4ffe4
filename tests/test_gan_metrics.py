"""GAN metrics (eval/gan_metrics.py): exact closed-form checks."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.eval.gan_metrics import (activation_statistics,
                                            fid_from_features,
                                            frechet_distance,
                                            inception_score)


def test_frechet_identical_gaussians_zero():
    rng = np.random.RandomState(0)
    cov = rng.randn(4, 4)
    cov = cov @ cov.T + np.eye(4)
    mu = rng.randn(4)
    d = float(frechet_distance(mu, cov, mu, cov))
    assert abs(d) < 1e-4


def test_frechet_mean_shift_closed_form():
    """Same covariance, shifted mean: FID == ||dmu||^2 exactly."""
    rng = np.random.RandomState(1)
    cov = rng.randn(5, 5)
    cov = cov @ cov.T + np.eye(5)
    mu1 = rng.randn(5)
    dmu = rng.randn(5)
    d = float(frechet_distance(mu1, cov, mu1 + dmu, cov))
    np.testing.assert_allclose(d, float(np.sum(dmu ** 2)), rtol=1e-4,
                               atol=1e-4)


def test_frechet_diagonal_closed_form():
    """Diagonal covariances: FID = ||dmu||^2 + sum (sqrt(a)-sqrt(b))^2."""
    a = np.array([1.0, 4.0, 9.0])
    b = np.array([4.0, 1.0, 16.0])
    mu1 = np.zeros(3)
    mu2 = np.array([1.0, 0.0, 2.0])
    want = np.sum((mu1 - mu2) ** 2) + np.sum(
        (np.sqrt(a) - np.sqrt(b)) ** 2)
    d = float(frechet_distance(mu1, np.diag(a), mu2, np.diag(b)))
    np.testing.assert_allclose(d, want, rtol=1e-5)


def test_fid_from_features_sampled():
    """Two big samples from the same distribution -> small FID; a
    shifted distribution -> FID near the mean-shift distance."""
    rng = np.random.RandomState(2)
    a = rng.randn(4000, 8).astype(np.float32)
    b = rng.randn(4000, 8).astype(np.float32)
    same = fid_from_features(a, b)
    assert same < 0.1, same
    shifted = fid_from_features(a, b + 3.0)
    np.testing.assert_allclose(shifted, 9.0 * 8, rtol=0.1)


def test_activation_statistics_shapes():
    f = np.random.RandomState(3).randn(16, 2, 2, 3).astype(np.float32)
    mu, cov = activation_statistics(jnp.asarray(f))
    assert mu.shape == (12,) and cov.shape == (12, 12)
    # covariance is symmetric PSD
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov).T,
                               atol=1e-5)


def test_inception_score_bounds():
    """Uniform predictions -> IS 1; one-hot diverse predictions -> IS
    == number of classes."""
    n, c = 100, 7
    uniform = np.zeros((n, c), np.float32)
    mean, _ = inception_score(uniform, splits=2)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
    onehot = np.full((n, c), -30.0, np.float32)
    for i in range(n):
        onehot[i, i % c] = 30.0
    mean2, _ = inception_score(onehot, splits=1)
    np.testing.assert_allclose(mean2, float(c), rtol=1e-3)
