"""Golden-output parity vs TensorFlow (SURVEY.md §4, BASELINE north_star:
'outputs match the TF reference within tolerance on fixed seeds').

TF (CPU) is present in this image, so goldens are computed live against
the exact TF ops the reference uses: tf.nn.conv2d / atrous / depthwise,
tf.nn.fused_batch_norm (fwd + grads), tf.nn.max_pool / avg_pool,
tf.image.resize.  Seed parity reading per SURVEY §7 hard-part #7: fixed
*data*, not bit-identical RNG streams across frameworks.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from myconvnet_tpu.ops import (avg_pool2d, batch_norm_inference,  # noqa: E402
                               batch_norm_train, conv2d,
                               depthwise_conv2d, max_pool2d,
                               resize_bilinear)

RTOL, ATOL = 2e-4, 2e-5
HI = lax.Precision.HIGHEST


@pytest.fixture(autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")
    yield


def test_conv2d_same_matches_tf():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 11, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), padding="SAME",
                  precision=HI)
    golden = tf.nn.conv2d(x, w, strides=1, padding="SAME").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_conv2d_strided_matches_tf():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 12, 12, 3).astype(np.float32)
    w = rng.randn(5, 5, 3, 6).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding="SAME",
                  precision=HI)
    golden = tf.nn.conv2d(x, w, strides=2, padding="SAME").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_atrous_conv_matches_tf():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), dilation=2,
                  padding="SAME", precision=HI)
    golden = tf.nn.atrous_conv2d(x, w, rate=2, padding="SAME").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_depthwise_conv_matches_tf():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 2).astype(np.float32)  # multiplier 2
    ours = depthwise_conv2d(jnp.asarray(x), jnp.asarray(w), padding="SAME",
                            precision=HI)
    golden = tf.nn.depthwise_conv2d(x, w, strides=[1, 1, 1, 1],
                                    padding="SAME").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_fused_batch_norm_train_matches_tf():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 6, 6, 5).astype(np.float32) * 2 + 1
    gamma = rng.rand(5).astype(np.float32) + 0.5
    beta = rng.randn(5).astype(np.float32)
    eps = 1e-3
    y, mean, var = batch_norm_train(jnp.asarray(x), jnp.asarray(gamma),
                                    jnp.asarray(beta), eps)
    gy, gmean, gvar = tf.compat.v1.nn.fused_batch_norm(
        x, gamma, beta, epsilon=eps, is_training=True)
    np.testing.assert_allclose(y, gy.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(mean, gmean.numpy(), rtol=1e-4, atol=1e-5)
    # TF's fused_batch_norm returns the UNBIASED variance as its "batch
    # variance" output but normalizes with the biased one; our var is the
    # biased (normalization) variance, matching the normalized outputs.
    m = x.shape[0] * x.shape[1] * x.shape[2]
    np.testing.assert_allclose(var * m / (m - 1), gvar.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_fused_batch_norm_inference_matches_tf():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 5, 5, 3).astype(np.float32)
    gamma = rng.rand(3).astype(np.float32)
    beta = rng.randn(3).astype(np.float32)
    mean = rng.randn(3).astype(np.float32)
    var = rng.rand(3).astype(np.float32) + 0.2
    eps = 1e-3
    ours = batch_norm_inference(jnp.asarray(x), jnp.asarray(gamma),
                                jnp.asarray(beta), jnp.asarray(mean),
                                jnp.asarray(var), eps)
    gy, _, _ = tf.compat.v1.nn.fused_batch_norm(
        x, gamma, beta, mean=mean, variance=var, epsilon=eps,
        is_training=False)
    np.testing.assert_allclose(ours, gy.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_grads_match_tf():
    rng = np.random.RandomState(6)
    x = rng.randn(3, 4, 4, 6).astype(np.float32)
    gamma = rng.rand(6).astype(np.float32) + 0.5
    beta = rng.randn(6).astype(np.float32)

    def loss(x, g, b):
        y, _, _ = batch_norm_train(x, g, b, 1e-3)
        return jnp.sum(y ** 2)

    dx, dg, db = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))

    xt = tf.constant(x)
    gt = tf.constant(gamma)
    bt = tf.constant(beta)
    with tf.GradientTape() as tape:
        tape.watch([xt, gt, bt])
        y, _, _ = tf.compat.v1.nn.fused_batch_norm(
            xt, gt, bt, epsilon=1e-3, is_training=True)
        l = tf.reduce_sum(y ** 2)
    tdx, tdg, tdb = tape.gradient(l, [xt, gt, bt])
    np.testing.assert_allclose(dx, tdx.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(dg, tdg.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(db, tdb.numpy(), rtol=1e-3, atol=1e-3)


def test_max_pool_matches_tf():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    ours = max_pool2d(jnp.asarray(x), 3, 2, padding="SAME")
    golden = tf.nn.max_pool2d(x, 3, 2, padding="SAME").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_avg_pool_matches_tf():
    rng = np.random.RandomState(8)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = avg_pool2d(jnp.asarray(x), 2, 2, padding="VALID")
    golden = tf.nn.avg_pool2d(x, 2, 2, padding="VALID").numpy()
    np.testing.assert_allclose(ours, golden, rtol=RTOL, atol=ATOL)


def test_resize_bilinear_matches_tf():
    rng = np.random.RandomState(9)
    x = rng.rand(2, 7, 9, 3).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (14, 5), half_pixel=True)
    golden = tf.image.resize(x, (14, 5), method="bilinear").numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_upsample2x_matches_tf():
    rng = np.random.RandomState(10)
    x = rng.rand(1, 8, 8, 2).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (16, 16))
    golden = tf.image.resize(x, (16, 16), method="bilinear").numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_softmax_ce_matches_tf():
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    rng = np.random.RandomState(11)
    logits = rng.randn(8, 10).astype(np.float32) * 3
    labels = rng.randint(0, 10, 8)
    ours = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    golden = tf.reduce_mean(
        tf.nn.sparse_softmax_cross_entropy_with_logits(
            labels=labels, logits=logits)).numpy()
    np.testing.assert_allclose(float(ours), golden, rtol=1e-5)


def test_sigmoid_bce_matches_tf():
    from myconvnet_tpu.train.losses import sigmoid_bce
    rng = np.random.RandomState(12)
    logits = rng.randn(16, 1).astype(np.float32) * 4
    ours = sigmoid_bce(jnp.asarray(logits), 1.0)
    golden = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
        labels=tf.ones_like(logits), logits=logits)).numpy()
    np.testing.assert_allclose(float(ours), golden, rtol=1e-5)


def test_ssim_close_to_tf():
    """Uniform-window SSIM vs tf.image.ssim (Gaussian window): same
    window size, small filter-shape difference -> agree to ~1e-3 on
    natural-noise images (the model-ranking use case)."""
    from myconvnet_tpu.eval.image_metrics import psnr, ssim

    rs = np.random.RandomState(3)
    a = rs.rand(2, 32, 32, 3).astype(np.float32)
    b = np.clip(a + rs.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    ref = tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0,
                        filter_size=7).numpy()
    mine = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(mine, ref, atol=5e-3)
    # PSNR is filter-free: exact parity
    ref_p = tf.image.psnr(tf.constant(a), tf.constant(b),
                          max_val=1.0).numpy()
    np.testing.assert_allclose(np.asarray(psnr(jnp.asarray(a),
                                               jnp.asarray(b))),
                               ref_p, rtol=1e-4)
