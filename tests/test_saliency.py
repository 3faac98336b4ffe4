"""Attribution maps (utils/saliency.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.utils.saliency import (input_gradient,
                                          integrated_gradients,
                                          normalize_map, smoothgrad)


def _linear_forward():
    """Known-gradient model: logits = [sum(x * W0), sum(x * W1)] with
    W0 concentrated in the top-left quadrant."""
    w0 = np.zeros((8, 8, 3), np.float32)
    w0[:4, :4, :] = 1.0
    w1 = np.ones((8, 8, 3), np.float32) * 0.1
    w = jnp.asarray(np.stack([w0, w1]))

    def forward(x):
        return jnp.einsum("nhwc,khwc->nk", x, w)

    return forward, w0


def test_input_gradient_localizes():
    forward, w0 = _linear_forward()
    x = jnp.ones((2, 8, 8, 3))
    sal = input_gradient(forward, x, class_idx=0)
    assert sal.shape == (2, 8, 8)
    s = np.asarray(sal)
    assert np.all(s[:, :4, :4] > 0.9)       # in-support pixels
    assert np.all(s[:, 4:, 4:] < 1e-6)      # out-of-support pixels


def test_integrated_gradients_completeness():
    """IG attributions must sum to score(x) - score(baseline) — exact
    for a linear model at any step count."""
    forward, _ = _linear_forward()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3)
                    .astype(np.float32))
    attr = integrated_gradients(forward, x, steps=8, class_idx=0)
    got = np.asarray(jnp.sum(attr, axis=(1, 2, 3)))
    want = np.asarray(forward(x)[:, 0])  # baseline score is 0
    np.testing.assert_allclose(got.sum(), want.sum(), rtol=1e-4)


def test_smoothgrad_matches_plain_for_linear():
    """A linear model's gradient is input-independent: SmoothGrad must
    equal the vanilla map exactly."""
    forward, _ = _linear_forward()
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    plain = input_gradient(forward, x, class_idx=0)
    smooth = smoothgrad(forward, x, jax.random.key(0), samples=4,
                        class_idx=0)
    np.testing.assert_allclose(np.asarray(smooth), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)


def test_normalize_map_range():
    sal = jnp.asarray(np.random.RandomState(1).randn(3, 5, 5)
                      .astype(np.float32))
    out = np.asarray(normalize_map(sal))
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out.max(axis=(1, 2)), 1.0, atol=1e-5)


def test_saliency_on_real_model():
    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform

    net = transform(lambda x, train=False: models.smallnet(
        x, 5, train=train, width=4, dropout_rate=0.0))
    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 3)
                    .astype(np.float32))
    params, state = net.init(jax.random.key(0), x, False)

    def forward(v):
        return net.apply(params, state, None, v, False)[0]

    sal = jax.jit(lambda v: input_gradient(forward, v))(x)
    assert sal.shape == (2, 16, 16)
    assert np.all(np.isfinite(np.asarray(sal)))
    assert float(jnp.max(sal)) > 0


def test_collect_and_override_intermediates():
    from myconvnet_tpu.core.module import (collecting, overriding,
                                           tag_intermediate)
    from myconvnet_tpu.core import transform

    def fwd(x):
        h = x * 2.0
        h = tag_intermediate("mid", h)
        return h + 1.0

    net = transform(fwd)
    params, state = net.init(jax.random.key(0), jnp.ones(3))
    with collecting() as c:
        out, _ = net.apply(params, state, None, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(c["~/mid"]), 2.0)
    with overriding({"~/mid": jnp.zeros(3)}):
        out2, _ = net.apply(params, state, None, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out2), 1.0)


def test_grad_cam_shapes_and_nonnegative():
    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.utils.saliency import grad_cam

    net = transform(lambda x, train=False: models.smallnet(
        x, 5, train=train, width=4, dropout_rate=0.0))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 3)
                    .astype(np.float32))
    params, state = net.init(jax.random.key(0), x, False)
    cam = grad_cam(net, params, state, x)
    assert cam.shape == (2, 16, 16)
    assert float(jnp.min(cam)) >= 0.0
    assert np.all(np.isfinite(np.asarray(cam)))
    import pytest
    with pytest.raises(ValueError):
        grad_cam(net, params, state, x, tag="nonexistent")


def test_convnet_features_api():
    from myconvnet_tpu import models
    from myconvnet_tpu.models.base import ConvNet

    net = ConvNet(models.smallnet, input_shape=(16, 16, 3), num_classes=5,
                  width=4, dropout_rate=0.0)
    net.build()
    x = np.random.RandomState(4).rand(3, 16, 16, 3).astype(np.float32)
    f = net.features(x, batch_size=2)
    assert f.shape[0] == 3 and f.ndim == 4
    assert np.all(np.isfinite(f))
