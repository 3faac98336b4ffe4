"""Property-based tests (hypothesis): invariants that hold for ALL
shapes/values, not just the fixtures the example-based suite picked.

Settings keep example counts small — each example may trigger an XLA
compile, and the invariants are shape-driven, so breadth beats depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

SET = dict(max_examples=15, deadline=None)


@settings(**SET)
@given(
    h=st.integers(6, 24), w=st.integers(6, 24),
    oh=st.integers(4, 20), ow=st.integers(4, 20),
    value=st.integers(0, 255), n=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_crop_resize_preserves_constant_images(h, w, oh, ow, value, n,
                                               seed):
    """A constant image stays exactly constant under ANY random crop +
    resize geometry (the interpolation matrices are affine with rows
    summing to 1)."""
    from myconvnet_tpu.data.augment import (batched_crop_resize,
                                            random_resized_crop_boxes)
    imgs = np.full((n, h, w, 3), value, np.uint8)
    boxes = random_resized_crop_boxes(jax.random.key(seed), n, (h, w),
                                      (0.3, 1.0), (0.75, 1.333))
    out = batched_crop_resize(jnp.asarray(imgs), boxes, (oh, ow))
    np.testing.assert_allclose(np.asarray(out), float(value), atol=1e-2)


@settings(**SET)
@given(
    h=st.integers(5, 20), w=st.integers(5, 20),
    oh=st.integers(4, 16), ow=st.integers(4, 16),
    n=st.integers(1, 3), seed=st.integers(0, 2**31 - 1),
    labels=st.integers(2, 6),
)
@pytest.mark.slow
def test_mask_crop_emits_only_original_labels(h, w, oh, ow, n, seed,
                                              labels):
    """Nearest mask resampling must never invent label values."""
    from myconvnet_tpu.data.augment import (batched_crop_nearest,
                                            random_resized_crop_boxes)
    rs = np.random.RandomState(seed % 2**31)
    masks = rs.randint(0, labels, (n, h, w)).astype(np.int32)
    boxes = random_resized_crop_boxes(jax.random.key(seed), n, (h, w),
                                      (0.3, 1.0), (0.75, 1.333))
    out = np.asarray(batched_crop_nearest(jnp.asarray(masks), boxes,
                                          (oh, ow)))
    assert set(np.unique(out)) <= set(np.unique(masks))


@settings(**SET)
@given(
    shape=st.sampled_from([(3,), (4, 5), (2, 3, 4), (1, 2, 3, 4)]),
    scale=st.floats(1e-3, 1e3), seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_quantize_roundtrip_error_bound(shape, scale, seed):
    from myconvnet_tpu.ops.quantized import quantize_tensor
    rs = np.random.RandomState(seed % 2**31)
    x = jnp.asarray((rs.randn(*shape) * scale).astype(np.float32))
    q, s = quantize_tensor(x)
    err = float(jnp.max(jnp.abs(q.astype(jnp.float32) * s - x)))
    assert err <= float(s) * 0.5 + 1e-6


@settings(**SET)
@given(
    h=st.integers(2, 17), w=st.integers(2, 17),
    bh=st.integers(1, 8), bw=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_adaptive_pool_preserves_global_mean_weightedly(h, w, bh, bw,
                                                        seed):
    """bins=(1,1) IS the global mean for any input shape; and every
    output bin lies within [min, max] of the input."""
    from myconvnet_tpu.ops.pool import adaptive_avg_pool2d
    rs = np.random.RandomState(seed % 2**31)
    x = jnp.asarray(rs.rand(2, h, w, 3).astype(np.float32))
    g = adaptive_avg_pool2d(x, 1)
    np.testing.assert_allclose(np.asarray(g)[:, 0, 0],
                               np.asarray(x).mean(axis=(1, 2)), atol=1e-5)
    bh2, bw2 = min(bh, h), min(bw, w)
    y = np.asarray(adaptive_avg_pool2d(x, (bh2, bw2)))
    assert y.min() >= float(np.asarray(x).min()) - 1e-6
    assert y.max() <= float(np.asarray(x).max()) + 1e-6


@settings(**SET)
@given(
    n=st.integers(1, 8), c=st.integers(2, 12),
    smoothing=st.floats(0.0, 0.3), seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_cross_entropy_nonnegative_and_smoothing_bounded(n, c, smoothing,
                                                         seed):
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    rs = np.random.RandomState(seed % 2**31)
    logits = jnp.asarray(rs.randn(n, c).astype(np.float32) * 3)
    labels = jnp.asarray(rs.randint(0, c, n))
    loss = float(softmax_cross_entropy(logits, labels,
                                       label_smoothing=smoothing))
    assert np.isfinite(loss) and loss >= 0.0
    # CE is invariant to logit shifts (softmax gauge)
    loss2 = float(softmax_cross_entropy(logits + 7.3, labels,
                                        label_smoothing=smoothing))
    np.testing.assert_allclose(loss, loss2, rtol=1e-4)


@settings(**SET)
@given(
    depth=st.integers(1, 4), seed=st.integers(0, 2**31 - 1),
)
def test_checkpoint_roundtrip_arbitrary_trees(depth, seed, tmp_path_factory):
    """save/restore is the identity for random nested dict pytrees of
    mixed dtypes/shapes."""
    from myconvnet_tpu.ckpt.checkpoint import (restore_checkpoint,
                                               save_checkpoint)
    rs = np.random.RandomState(seed % 2**31)

    def tree(d):
        if d == 0:
            dtype = rs.choice([np.float32, np.int32, np.uint8])
            shape = tuple(rs.randint(1, 4, rs.randint(0, 3)))
            return np.asarray(rs.rand(*shape) * 10).astype(dtype)
        return {f"k{i}": tree(d - 1) for i in range(rs.randint(1, 3))}

    state = {"params": tree(depth), "step": np.int32(7)}
    d = tmp_path_factory.mktemp("ckpt")
    save_checkpoint(str(d), 1, state)
    out = restore_checkpoint(str(d), state)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state)[0],
            jax.tree_util.tree_flatten_with_path(out)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@settings(**SET)
@given(
    h=st.integers(8, 24), w=st.integers(8, 24),
    seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_ssim_symmetric_bounded_and_psnr_order(h, w, seed):
    from myconvnet_tpu.eval.image_metrics import psnr, ssim
    rs = np.random.RandomState(seed % 2**31)
    a = jnp.asarray(rs.rand(2, h, w, 3).astype(np.float32))
    b = jnp.asarray(rs.rand(2, h, w, 3).astype(np.float32))
    s_ab = np.asarray(ssim(a, b))
    s_ba = np.asarray(ssim(b, a))
    np.testing.assert_allclose(s_ab, s_ba, atol=1e-5)  # symmetry
    assert (s_ab <= 1.0 + 1e-5).all() and (s_ab >= -1.0 - 1e-5).all()
    # a closer pair scores at least as high on both metrics
    mid = (a + b) / 2
    assert float(jnp.mean(ssim(a, mid))) >= float(jnp.mean(ssim(a, b))) \
        - 1e-3
    assert float(jnp.mean(psnr(a, mid))) >= float(jnp.mean(psnr(a, b)))


@settings(**SET)
@given(
    c=st.sampled_from([4, 8, 16]), groups=st.sampled_from([1, 2, 4]),
    scale=st.floats(0.5, 100.0), seed=st.integers(0, 2**31 - 1),
)
@pytest.mark.slow
def test_group_norm_scale_invariant(c, groups, scale, seed):
    """GN output is invariant to input scaling up to the eps term
    (eps/(var*s^2) shifts the denominator ~0.6% at s=0.1, so the scale
    floor stays above that regime)."""
    from myconvnet_tpu.core import transform
    from myconvnet_tpu import nn

    net = transform(lambda x: nn.group_norm(x, groups=groups))
    rs = np.random.RandomState(seed % 2**31)
    x = jnp.asarray(rs.rand(2, 6, 6, c).astype(np.float32))
    params, state = net.init(jax.random.key(0), x)
    y1, _ = net.apply(params, state, None, x)
    y2, _ = net.apply(params, state, None, x * scale)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=2e-2)


@pytest.mark.slow
@given(h=st.integers(8, 40), w=st.integers(8, 40),
       slope=st.floats(-0.29, 0.29))
@settings(max_examples=12, deadline=None)
def test_property_shear_matches_direct_bilinear(h, w, slope):
    """The Pallas shear (interpret mode) equals direct bilinear
    inverse-map sampling for arbitrary sizes and slopes — incl. the
    lane-padding and row-block edge cases."""
    from myconvnet_tpu.ops.pallas.affine import shear_x

    rng = np.random.RandomState(h * 41 + w)
    img = rng.rand(h, w, 3).astype(np.float32)
    got = np.asarray(shear_x(jnp.asarray(img[None]),
                             jnp.asarray([slope], np.float32),
                             max_abs_slope=0.3, interpret=True))[0]
    cy = (h - 1) / 2.0
    # reference: out[y,x] = in[y, x + slope*(y-cy)] bilinear, 0.5 fill
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    src = xs + slope * (ys - cy)
    x0 = np.floor(src).astype(int)
    f = (src - x0).astype(np.float32)
    def take(xi):
        valid = (xi >= 0) & (xi < w)
        v = img[np.arange(h)[:, None], np.clip(xi, 0, w - 1)]
        return np.where(valid[..., None], v, 0.0), valid.astype(np.float32)
    v0, c0 = take(x0)
    v1, c1 = take(x0 + 1)
    cov = (1 - f) * c0 + f * c1
    want = (1 - f[..., None]) * v0 + f[..., None] * v1 \
        + (1 - cov[..., None]) * 0.5
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
@given(seed=st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_property_equalize_matches_pil(seed):
    from PIL import Image, ImageOps

    from myconvnet_tpu.data.randaugment import op_equalize
    rng = np.random.RandomState(seed)
    h, w = rng.randint(4, 40), rng.randint(4, 40)
    # mix of skewed / flat / narrow histograms
    base = rng.rand(h, w, 3) ** rng.uniform(0.3, 3.0)
    img8 = (base * rng.uniform(0.3, 1.0) * 255).astype(np.uint8)
    x = jnp.asarray(img8[None], jnp.float32) / 255.0
    out = np.asarray(op_equalize(x, None))[0]
    got = np.round(out * 255.0).astype(np.int32)
    want = np.asarray(ImageOps.equalize(Image.fromarray(img8)), np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
@given(n_stages=st.integers(2, 5), hw=st.sampled_from([8, 16]),
       batch_mult=st.integers(1, 3))
@settings(max_examples=6, deadline=None)
def test_property_stage_param_roundtrip_and_forward(n_stages, hw,
                                                    batch_mult):
    """stack/unstack stage params is lossless and the staged VGG
    composes to the same function regardless of the stage count."""
    from myconvnet_tpu.models.staged import init_stage_params, vgg_stages
    from myconvnet_tpu.parallel.pipeline import (stack_stage_params,
                                                 unstack_stage_params)

    aps, inits = vgg_stages(5, 11, n_stages)
    x = jnp.asarray(np.random.RandomState(n_stages)
                    .rand(2 * batch_mult, hw, hw, 3).astype(np.float32))
    params = init_stage_params(aps, inits, jax.random.key(7), x[:1])
    flat, metas = stack_stage_params(params)
    back = unstack_stage_params(flat, metas)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = x
    for ap, p in zip(aps, back):
        out = ap(p, out)
    assert out.shape == (2 * batch_mult, 5)
    assert np.isfinite(np.asarray(out)).all()
