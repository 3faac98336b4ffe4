"""PSNR/SSIM image metrics (eval/image_metrics.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.eval.image_metrics import (PairedImageEvaluator, psnr,
                                              ssim)


def _imgs(seed=0, n=2, hw=24):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, hw, hw, 3).astype(np.float32))


def test_psnr_formula_and_identity():
    a = _imgs()
    assert float(jnp.min(psnr(a, a))) > 100.0  # identical -> ~inf dB
    b = jnp.clip(a + 0.1, 0.0, 1.0)
    p = psnr(a, b)
    mse = np.mean((np.asarray(a) - np.asarray(b)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(p),
                               10 * np.log10(1.0 / mse), rtol=1e-5)


def test_ssim_bounds_and_ordering():
    a = _imgs()
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)
    slight = jnp.clip(a + 0.02, 0.0, 1.0)
    heavy = jnp.clip(a + 0.4, 0.0, 1.0)
    s1 = float(jnp.mean(ssim(a, slight)))
    s2 = float(jnp.mean(ssim(a, heavy)))
    assert 0.0 < s2 < s1 < 1.0
    # jittable
    j = jax.jit(lambda x, y: ssim(x, y))(a, slight)
    np.testing.assert_allclose(np.asarray(j), np.asarray(ssim(a, slight)),
                               rtol=1e-6)


def test_paired_image_evaluator():
    ev = PairedImageEvaluator("psnr")
    a, b = _imgs(0), _imgs(1)
    ev.update(a, b)
    ev.update(a, b)
    single = float(jnp.mean(psnr(a, b)))
    np.testing.assert_allclose(ev.score(), single, rtol=1e-6)
    assert ev.is_better(30.0, 20.0)
    assert ev.worst_score() == float("-inf")
    ev.reset()
    assert ev.score() == 0.0
    with pytest.raises(ValueError):
        PairedImageEvaluator("lpips")
