"""Model zoo: shapes, param counts, jit-ability, gradient flow.

Small spatial sizes keep CPU CI fast; architecture is size-agnostic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform


def _build(fn, x, *args, **kwargs):
    net = transform(fn)
    key = jax.random.key(0)
    params, state = net.init(key, x, *args, **kwargs)
    return net, params, state


def _n_params(params):
    return sum(int(np.prod(p.shape)) for b in params.values()
               for p in b.values())


def test_smallnet_forward():
    x = jnp.zeros((2, 32, 32, 3))
    net, params, state = _build(models.smallnet, x, 10, train=True)
    y, _ = net.apply(params, state, jax.random.key(1), x, 10, train=True)
    assert y.shape == (2, 10)


@pytest.mark.slow
@pytest.mark.parametrize("depth,expected_m", [(18, 11.7), (50, 25.6)])
def test_resnet_param_count(depth, expected_m):
    """Match the canonical ImageNet parameter counts (sanity vs torchvision:
    resnet18=11.69M, resnet50=25.56M)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.resnet, x, 1000, depth)
    n = _n_params(params) / 1e6
    assert abs(n - expected_m) < 0.15, f"resnet{depth}: {n:.2f}M params"


@pytest.mark.slow
def test_resnet_forward_and_grad():
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    net, params, state = _build(models.resnet, x, 10, 18, train=True)
    y, _ = net.apply(params, state, None, x, 10, 18, train=True)
    assert y.shape == (2, 10)

    def loss(p):
        out, _ = net.apply(p, state, None, x, 10, 18, train=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_resnet_output_stride_dilation():
    x = jnp.zeros((1, 64, 64, 3))

    def bb(x, os):
        return models.resnet_backbone(x, 18, output_stride=os)

    net, params, state = _build(bb, x, 16)
    y16, _ = net.apply(params, state, None, x, 16)
    assert y16.shape[1:3] == (4, 4)  # 64/16
    net, params, state = _build(bb, x, 32)
    y32, _ = net.apply(params, state, None, x, 32)
    assert y32.shape[1:3] == (2, 2)  # 64/32


@pytest.mark.slow
def test_vgg16_param_count():
    """vgg16 conv trunk = 14.71M conv weights (canonical); classic head
    adds (flatten->4096->4096->1000).  At 32x32 input flatten = 512, so
    expected total = trunk + BN + 512*4096+4096 + 4096*4096+4096 +
    4096*1000+1000."""
    x = jnp.zeros((1, 32, 32, 3))

    def f(x):
        return models.vgg(x, 1000, 16, classic_head=True)

    _, params, _ = _build(f, x)
    conv_w = sum(int(np.prod(b["w"].shape)) for k, b in params.items()
                 if k.startswith("conv"))
    assert conv_w == 14_710_464, conv_w  # canonical VGG16 conv weights
    n = _n_params(params)
    bn = 2 * sum(b["gamma"].shape[0] for k, b in params.items()
                 if k.startswith("bn"))
    head = (512 * 4096 + 4096) + (4096 * 4096 + 4096) + (4096 * 1000 + 1000)
    assert n == conv_w + bn + head, (n, conv_w + bn + head)


@pytest.mark.slow
def test_densenet121_param_count():
    """densenet121 = 7.98M params (torchvision)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.densenet, x, 1000, 121)
    n = _n_params(params) / 1e6
    assert abs(n - 7.98) < 0.1, f"densenet121: {n:.2f}M"


@pytest.mark.slow
def test_deeplab_output_shape():
    x = jnp.zeros((1, 33, 33, 3))

    def f(x, train):
        return models.deeplab_v3_plus(x, 21, train=train, backbone_depth=18)

    net, params, state = _build(f, x, False)
    y, _ = net.apply(params, state, None, x, False)
    assert y.shape == (1, 33, 33, 21)
    assert y.dtype == jnp.float32


@pytest.mark.slow
def test_dcgan_shapes():
    z = jnp.zeros((2, 100))

    def g(z, train):
        return models.dcgan_generator(z, train=train, image_size=32,
                                      base_features=128)

    net, params, state = _build(g, z, True)
    img, _ = net.apply(params, state, None, z, True)
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0

    def d(x, train):
        return models.dcgan_discriminator(x, train=train)

    netd, pd, sd = _build(d, img, True)
    logits, _ = netd.apply(pd, sd, None, img, True)
    assert logits.shape == (2, 1)


@pytest.mark.slow
def test_pix2pix_shapes():
    x = jnp.zeros((2, 32, 32, 3))

    def g(x, train):
        return models.unet_generator(x, train=train, n_levels=5)

    net, params, state = _build(g, x, True)
    y, _ = net.apply(params, state, jax.random.key(0), x, True)
    assert y.shape == (2, 32, 32, 3)

    def d(a, b, train):
        return models.patchgan_discriminator(a, b, train=train)

    netd, pd, sd = _build(d, x, y, True)
    logits, _ = netd.apply(pd, sd, None, x, y, True)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] > 1  # patch output, not scalar


def test_registry():
    assert models.get_model("resnet50") is models.resnet50
    with pytest.raises(ValueError, match="unknown model"):
        models.get_model("resnet13")


@pytest.mark.slow
def test_alexnet_param_count():
    """torchvision alexnet = 61.10M params (classic head, no BN)."""
    def f(x):
        return models.alexnet(x, 1000, use_bn=False)
    x = jnp.zeros((1, 224, 224, 3))
    _, params, _ = _build(f, x)
    n = _n_params(params) / 1e6
    assert abs(n - 61.10) < 0.2, n


@pytest.mark.slow
def test_resnet_s2d_stem():
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))

    def f(x, train):
        return models.resnet(x, 10, 18, train=train, stem="s2d")

    net, params, state = _build(f, x, True)
    assert params["stem/conv"]["w"].shape == (4, 4, 12, 64)
    y, _ = net.apply(params, state, None, x, True)
    assert y.shape == (2, 10)
    g = jax.grad(lambda p: float(0) + jnp.sum(
        net.apply(p, state, None, x, True)[0] ** 2))(params)
    assert np.isfinite(np.asarray(g["stem/conv"]["w"])).all()


@pytest.mark.slow
@pytest.mark.parametrize("fn,expected", [
    (models.resnext50_32x4d, 25.03),   # torchvision: 25,028,904
    (models.se_resnet50, 28.09),       # Hu et al.: 28.088M
])
def test_resnext_se_param_counts(fn, expected):
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(fn, x, 1000)
    n = _n_params(params) / 1e6
    assert abs(n - expected) < 0.15, f"{fn}: {n:.3f}M params"


def test_se_block_gates_channels():
    """SE gate in (0,1): output magnitude never exceeds input."""
    from myconvnet_tpu.models.resnet import se_block
    net = transform(lambda x: se_block(x, ratio=4))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16)
                    .astype(np.float32))
    params, state = net.init(jax.random.key(0), x)
    y, _ = net.apply(params, state, None, x)
    assert y.shape == x.shape
    assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)


@pytest.mark.slow
def test_resnext_forward_and_grad():
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    net, params, state = _build(models.se_resnext50_32x4d, x, 10,
                                train=True)
    y, _ = net.apply(params, state, None, x, 10, train=True)
    assert y.shape == (2, 10)

    def loss(p):
        out, _ = net.apply(p, state, None, x, 10, train=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_grouped_blocks_require_bottleneck():
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError):
        _build(models.resnet, x, 10, 18, groups=32, width_per_group=4)


@pytest.mark.slow
def test_wrn_28_10_param_count():
    """Canonical WRN-28-10 CIFAR-10 count: 36.48M (Zagoruyko tab. 1)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.wrn_28_10, x, 10)
    n = _n_params(params) / 1e6
    assert abs(n - 36.48) < 0.1, f"wrn_28_10: {n:.3f}M params"


def test_wide_resnet_forward_and_grad():
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    net, params, state = _build(models.wide_resnet, x, 10, depth=10,
                                width_mult=1, dropout_rate=0.1,
                                train=True)
    y, _ = net.apply(params, state, jax.random.key(1), x, 10, depth=10,
                     width_mult=1, dropout_rate=0.1, train=True)
    assert y.shape == (2, 10)
    # spatial reduction: 32 -> 8 through the two stride-2 groups
    with pytest.raises(ValueError):
        _build(models.wide_resnet, x, 10, depth=11)


@pytest.mark.slow
def test_unet_output_shape_and_grads():
    x = jnp.zeros((1, 32, 32, 3))

    def f(x, train):
        return models.unet(x, 7, train=train, base_features=8, depth=3)

    net, params, state = _build(f, x, True)
    y, _ = net.apply(params, state, None, x, True)
    assert y.shape == (1, 32, 32, 7)
    assert y.dtype == jnp.float32

    def loss(p):
        out, _ = net.apply(p, state, None, jnp.ones_like(x), True)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    # every level (down/bottleneck/up/logits) receives gradient
    total = sum(float(jnp.sum(jnp.abs(g))) for b in grads.values()
                for g in b.values())
    assert np.isfinite(total) and total > 0


def test_unet_rejects_indivisible_input():
    x = jnp.zeros((1, 30, 30, 3))
    with pytest.raises(AssertionError, match="not divisible"):
        _build(lambda x, train: models.unet(x, 3, train=train,
                                            base_features=4, depth=3),
               x, True)


@pytest.mark.slow
def test_fcn_output_shape():
    x = jnp.zeros((1, 33, 33, 3))

    def f(x, train):
        return models.fcn(x, 21, train=train, backbone_depth=18,
                          head_features=64)

    net, params, state = _build(f, x, False)
    y, _ = net.apply(params, state, None, x, False)
    assert y.shape == (1, 33, 33, 21)
    assert y.dtype == jnp.float32


def test_segmenter_registry():
    for name in ("unet", "fcn", "deeplab_v3_plus"):
        assert models.get_model(name) is not None


@pytest.mark.slow
def test_shufflenet_v2_param_count():
    """Canonical 1.0x ImageNet size (torchvision shufflenet_v2_x1_0:
    2.28M params)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.shufflenet_v2, x, 1000)
    n = _n_params(params) / 1e6
    assert abs(n - 2.28) < 0.05, f"shufflenet_v2: {n:.3f}M"


@pytest.mark.slow
def test_shufflenet_forward_and_shuffle():
    from myconvnet_tpu.models.shufflenet import channel_shuffle
    # shuffle interleaves the two groups: [a1 a2 b1 b2] -> [a1 b1 a2 b2]
    v = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 4)
    np.testing.assert_array_equal(
        channel_shuffle(v, 2)[0, 0, 0], [0.0, 2.0, 1.0, 3.0])
    x = jnp.zeros((2, 32, 32, 3))
    net, params, state = _build(
        lambda x, train: models.shufflenet_v2(x, 10, train=train,
                                              width_multiplier=0.5),
        x, True)
    y, _ = net.apply(params, state, None, x, True)
    assert y.shape == (2, 10)


def test_squeezenet_param_count_and_forward():
    """SqueezeNet 1.1 canonical size (torchvision: 1.24M params)."""
    x = jnp.zeros((2, 64, 64, 3))
    net, params, state = _build(models.squeezenet, x, 1000, train=True)
    n = _n_params(params) / 1e6
    assert abs(n - 1.24) < 0.02, f"squeezenet: {n:.3f}M"
    y, _ = net.apply(params, state, jax.random.key(1), x, 1000, train=True)
    assert y.shape == (2, 1000) and y.dtype == jnp.float32


@pytest.mark.slow
def test_xception_backbone_strides():
    from myconvnet_tpu.models.xception import xception_backbone
    x = jnp.zeros((1, 64, 64, 3))
    for os_, want in ((32, 2), (16, 4), (8, 8)):
        net, params, state = _build(
            lambda x, train, _os=os_: xception_backbone(
                x, train=train, output_stride=_os), x, False)
        y, _ = net.apply(params, state, None, x, False)
        assert y.shape[1] == want, (os_, y.shape)
        assert y.shape[-1] == 2048


@pytest.mark.slow
def test_xception65_classifier_and_deeplab():
    x = jnp.zeros((1, 64, 64, 3))
    net, params, state = _build(models.xception65, x, 1000, train=False)
    y, _ = net.apply(params, state, None, x, 1000, train=False)
    assert y.shape == (1, 1000)
    n = _n_params(params) / 1e6
    assert 35 < n < 45, f"xception65: {n:.1f}M"  # aligned-65 ballpark

    def f(x, train):
        return models.deeplab_v3_plus(x, 21, train=train,
                                      backbone="xception")

    net, params, state = _build(f, x, False)
    y, _ = net.apply(params, state, None, x, False)
    assert y.shape == (1, 64, 64, 21)


@pytest.mark.slow
def test_resnet_group_norm_variant():
    """norm='group' swaps every BN for GroupNorm: no moving statistics
    in the state, microbatch-size-independent outputs."""
    x = jnp.zeros((2, 32, 32, 3))

    def f(x, train):
        return models.resnet(x, 10, 18, train=train, norm="group")

    net, params, state = _build(f, x, True)
    # no BN moving stats anywhere
    for scope_name, entries in state.items():
        assert "moving_mean" not in entries, scope_name
    rs = np.random.RandomState(0)
    xa = jnp.asarray(rs.rand(4, 32, 32, 3).astype(np.float32))
    ya, _ = net.apply(params, state, None, xa, False)
    # batch-independence: per-example output unchanged in a different
    # batch composition (BN would couple them at train time; GN never)
    yb, _ = net.apply(params, state, None, xa[:2], True)
    ya2, _ = net.apply(params, state, None, xa, True)
    np.testing.assert_allclose(np.asarray(ya2[:2]), np.asarray(yb),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pspnet_output_shape_and_registry():
    x = jnp.zeros((1, 32, 32, 3))

    def f(x, train):
        return models.pspnet(x, 21, train=train, backbone_depth=18,
                             head_features=32)

    net, params, state = _build(f, x, True)
    y, _ = net.apply(params, state, jax.random.key(1), x, True)
    assert y.shape == (1, 32, 32, 21) and y.dtype == jnp.float32
    assert models.get_model("pspnet") is models.pspnet
    # PPM parameter scopes exist for every bin level
    names = set(params)
    assert any("ppm" in n and "bin1" in n for n in names)
    assert any("bin6" in n for n in names)


@pytest.mark.slow
def test_convnext_tiny_param_count():
    """ConvNeXt-T canonical size (paper/timm: 28.6M params)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.convnext_tiny, x, 1000, train=False)
    n = _n_params(params) / 1e6
    assert abs(n - 28.6) < 0.4, f"convnext_tiny: {n:.2f}M"


@pytest.mark.slow
def test_convnext_forward_and_droppath():
    x = jnp.zeros((2, 32, 32, 3))
    net, params, state = _build(
        lambda x, train: models.convnext(x, 10, train=train,
                                         variant="tiny",
                                         drop_path_rate=0.5), x, True)
    y, _ = net.apply(params, state, jax.random.key(1), x, True)
    assert y.shape == (2, 10)
    # eval mode is deterministic (drop_path off) and rng-free
    y1, _ = net.apply(params, state, None, x, False)
    y2, _ = net.apply(params, state, None, x, False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # layer-scale parameters exist
    assert any("layer_scale" in d for b in params.values() for d in b)


def test_list_models_registry():
    names = models.list_models()
    assert "resnet50" in names and "pspnet" in names
    assert models.list_models("segmenter") == sorted(models.SEGMENTERS)
    assert set(models.list_models("classifier")) == set(models.CLASSIFIERS)
    assert "dcgan" in models.list_models("gan")
    assert models.list_models("detector") == sorted(models.DETECTORS)
    with pytest.raises(ValueError):
        models.list_models("keypoint")
    # every registry entry actually resolves
    for n in names:
        assert models.get_model(n) is not None


@pytest.mark.slow
@pytest.mark.parametrize("variant,expected_m", [
    ("x_400mf", 5.16), ("y_400mf", 4.34),
    ("x_1_6gf", 9.19), ("y_1_6gf", 11.20)])
def test_regnet_param_counts(variant, expected_m):
    """Match the published parameter counts (paper Table / torchvision:
    y_400mf=4.344M, x_1_6gf=9.190M, y_1_6gf=11.202M exactly;
    x_400mf=5.16M per the paper's 5.2M row)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.regnet, x, 1000, variant)
    n = _n_params(params) / 1e6
    assert abs(n - expected_m) < 0.05, f"regnet_{variant}: {n:.3f}M"


@pytest.mark.slow
def test_regnet_forward_and_registry():
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    net, params, state = _build(models.regnet_y_400mf, x, 10, train=True)
    y, _ = net.apply(params, state, None, x, 10, train=True)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()
    assert models.get_model("regnet_y_400mf") is models.regnet_y_400mf
    with pytest.raises(ValueError, match="unknown RegNet"):
        models.regnet(x, 10, "z_9gf")


@pytest.mark.slow
def test_efficientnet_b4_param_count():
    """The compound-scaling presets extend to B4-B7; B4's count matches
    torchvision exactly (19.342M — the others follow the same rule)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.efficientnet_b4, x, 1000)
    n = _n_params(params) / 1e6
    assert abs(n - 19.342) < 0.02, f"b4: {n:.3f}M"
    assert models.get_model("efficientnet_b7") is models.efficientnet_b7


@pytest.mark.slow
@pytest.mark.parametrize("variant,expected_m", [("s", 21.458), ("m", 54.139)])
def test_efficientnet_v2_param_counts(variant, expected_m):
    """Stage tables match the published V2 configs (torchvision:
    v2_s=21.458M, v2_m=54.139M)."""
    x = jnp.zeros((1, 32, 32, 3))
    _, params, _ = _build(models.efficientnet_v2, x, 1000, variant)
    n = _n_params(params) / 1e6
    assert abs(n - expected_m) < 0.05, f"v2_{variant}: {n:.3f}M"


@pytest.mark.slow
def test_efficientnet_v2_forward_and_registry():
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    net, params, state = _build(models.efficientnet_v2_s, x, 10, train=True)
    y, _ = net.apply(params, state, jax.random.key(1), x, 10, train=True)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()
    assert models.get_model("efficientnet_v2_m") is models.efficientnet_v2_m
    with pytest.raises(ValueError, match="unsupported EfficientNetV2"):
        models.efficientnet_v2(x, 10, "xl9")


@pytest.mark.slow
def test_ssd300_output_shapes_and_grad():
    from myconvnet_tpu.ops import boxes as B
    x = jax.random.normal(jax.random.key(0), (1, 300, 300, 3))
    net, params, state = _build(models.ssd300, x, 21, train=True)
    (cls, loc), _ = net.apply(params, state, None, x, 21, train=True)
    assert cls.shape == (1, 8732, 21) and loc.shape == (1, 8732, 4)
    # the head layout agrees with the anchor grid
    assert B.ssd_anchors().shape[0] == cls.shape[1]
    assert np.isfinite(np.asarray(cls)).all()

    def loss(p):
        (c, ll), _ = net.apply(p, state, None, x, 21, train=True)
        return jnp.mean(c ** 2) + jnp.mean(ll ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
    assert models.get_model("ssd300") is models.ssd300


@pytest.mark.slow
def test_ssd300_rejects_wrong_input_size():
    x = jnp.zeros((1, 224, 224, 3))
    from myconvnet_tpu.core import transform
    with pytest.raises(ValueError, match="feature pyramid"):
        transform(models.ssd300).init(jax.random.key(0), x, 21)


def test_vit_b16_param_count():
    """ViT-B/16 at 224^2/1000 classes: torchvision vit_b_16 has exactly
    86,567,656 parameters — the packed-qkv layout is parameter-identical
    to torch's in_proj."""
    fwd = transform(lambda x: models.vit_b16(x, 1000))
    params, _ = jax.eval_shape(
        lambda: fwd.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3))))
    assert _n_params(params) == 86_567_656


def test_vit_variants_param_ratio():
    """Ti/S/B widths 192/384/768: transformer param count scales ~d^2."""
    counts = {}
    for name, f in (("ti", models.vit_ti16), ("s", models.vit_s16)):
        fwd = transform(lambda x, f=f: f(x, 1000))
        p, _ = jax.eval_shape(
            lambda fwd=fwd: fwd.init(jax.random.key(0),
                                     jnp.zeros((1, 224, 224, 3))))
        counts[name] = _n_params(p)
    assert abs(counts["ti"] / 1e6 - 5.72) < 0.2   # DeiT-Ti ~5.7M
    assert abs(counts["s"] / 1e6 - 22.05) < 0.4   # DeiT-S ~22.1M
