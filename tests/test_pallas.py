"""Pallas kernels: numerics vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.ops.pallas import (bn_inference_fused,
                                      fused_scale_shift_act, normalize_u8)


def test_fused_scale_shift_act_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 5, 128).astype(np.float32))
    a = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    y = fused_scale_shift_act(x, a, b, act="relu", interpret=True)
    expect = jnp.maximum(x * a + b, 0.0)
    np.testing.assert_allclose(y, expect, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("act", ["none", "relu6", "leaky_relu"])
def test_fused_activations(act):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32) * 5)
    a = jnp.ones(128)
    b = jnp.zeros(128)
    y = fused_scale_shift_act(x, a, b, act=act, interpret=True)
    ref = {"none": x, "relu6": jnp.clip(x, 0, 6),
           "leaky_relu": jnp.where(x >= 0, x, 0.2 * x)}[act]
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_bn_inference_fused_matches_bn():
    from myconvnet_tpu.ops import batch_norm_inference
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 128).astype(np.float32))
    gamma = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(128).astype(np.float32))
    mean = jnp.asarray(rng.randn(128).astype(np.float32))
    var = jnp.asarray(rng.rand(128).astype(np.float32) + 0.1)
    fused = bn_inference_fused(x, gamma, beta, mean, var, 1e-3, act="none",
                               interpret=True)
    ref = batch_norm_inference(x, gamma, beta, mean, var, 1e-3)
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)
    fused_relu = bn_inference_fused(x, gamma, beta, mean, var, 1e-3,
                                    act="relu", interpret=True)
    np.testing.assert_allclose(fused_relu, jnp.maximum(ref, 0), rtol=1e-5,
                               atol=1e-5)


def test_normalize_u8_matches_reference():
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8))
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    y = normalize_u8(imgs, mean, std, interpret=True)
    expect = (imgs.astype(jnp.float32) / 255.0 -
              jnp.asarray(mean)) / jnp.asarray(std)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)
    assert y.dtype == jnp.float32


def test_normalize_u8_bf16_output():
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 256, (1, 4, 4, 3), dtype=np.uint8))
    y = normalize_u8(imgs, (0.5,) * 3, (0.25,) * 3, out_dtype=jnp.bfloat16,
                     interpret=True)
    assert y.dtype == jnp.bfloat16
    expect = (imgs.astype(jnp.float32) / 255.0 - 0.5) / 0.25
    np.testing.assert_allclose(y.astype(jnp.float32), expect, rtol=0.02,
                               atol=0.02)


def test_odd_row_count_remainder_blocks():
    """rows not divisible by the block size must still be exact."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 5, 7, 2).astype(np.float32))  # 105 rows
    a = jnp.asarray([2.0, 0.5])
    b = jnp.asarray([-1.0, 1.0])
    y = fused_scale_shift_act(x, a, b, act="none", interpret=True)
    np.testing.assert_allclose(y, x * a + b, rtol=1e-6, atol=1e-6)


def test_pad_crop_flip_normalize_matches_reference():
    from myconvnet_tpu.ops.pallas.pad_crop_u8 import (
        pad_crop_flip_normalize, reference_pad_crop_flip_normalize)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    offsets = rng.randint(-3, 4, (6, 2)).astype(np.int32)
    flip = np.asarray([0, 1, 0, 1, 1, 0], np.int32)
    mean, std = (0.49, 0.48, 0.44), (0.25, 0.24, 0.26)
    out = pad_crop_flip_normalize(jnp.asarray(imgs), jnp.asarray(offsets),
                                  jnp.asarray(flip), mean, std, pad=3,
                                  interpret=True)
    ref = reference_pad_crop_flip_normalize(imgs, offsets, flip, mean, std,
                                            pad=3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_pad_crop_zero_offsets_no_flip_is_normalize_only():
    from myconvnet_tpu.ops.pallas.pad_crop_u8 import pad_crop_flip_normalize
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = pad_crop_flip_normalize(
        jnp.asarray(imgs), jnp.zeros((2, 2), jnp.int32),
        jnp.zeros((2,), jnp.int32), (0.0,) * 3, (1.0,) * 3, pad=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               imgs.astype(np.float32) / 255.0, rtol=1e-6,
                               atol=1e-6)
