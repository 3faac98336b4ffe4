"""Super-resolution family (sixth task family; reference mount empty,
SURVEY.md §0): pixel-shuffle op, EDSR/SRResNet forwards, the
flat-image-directory subset, the build_sr recipe end-to-end, and the
SRGAN fused dual-optimizer step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models, nn, recipes
from myconvnet_tpu.core.module import transform
from myconvnet_tpu.subsets import images as images_mod


# ------------------------------------------------------------ pixel_shuffle

def test_pixel_shuffle_matches_manual_depth_to_space():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 2 * 2 * 5).astype(np.float32)
    out = np.asarray(nn.pixel_shuffle(jnp.asarray(x), 2))
    assert out.shape == (2, 6, 8, 5)
    # manual reference: output[n, h*r+i, w*r+j, c] = x[n, h, w, (i*r+j)*C+c]
    # with the (H, r, W, r, C) interleave order used by ESPCN/torch
    ref = x.reshape(2, 3, 4, 2, 2, 5).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(2, 6, 8, 5)
    np.testing.assert_array_equal(out, ref)


def test_pixel_shuffle_rejects_bad_channels():
    with pytest.raises(ValueError, match="not divisible"):
        nn.pixel_shuffle(jnp.zeros((1, 2, 2, 5)), 2)


def test_pixel_shuffle_inverts_space_to_depth():
    # shuffle(reshape-based s2d(x)) == x for C=1: round-trip identity
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    s2d = x.reshape(1, 2, 2, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(1, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(nn.pixel_shuffle(s2d, 2)),
                                  np.asarray(x))


# ---------------------------------------------------------- model forwards

def _init_apply(fn, x, **kw):
    t = transform(lambda a, train=False: fn(a, train=train, **kw))
    params, state = t.init(jax.random.key(0), x, True)
    out, _ = t.apply(params, state, None, x, False)
    return out, params


def test_edsr_output_shape_x4():
    x = jnp.zeros((2, 8, 8, 3))
    out, _ = _init_apply(models.edsr, x, scale=4, width=8, blocks=2)
    assert out.shape == (2, 32, 32, 3)


def test_edsr_scale3_and_residual_scaling():
    x = jnp.ones((1, 4, 4, 3))
    out, _ = _init_apply(models.edsr, x, scale=3, width=8, blocks=1,
                         res_scale=0.1)
    assert out.shape == (1, 12, 12, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tinysr_shape_x2():
    x = jnp.zeros((2, 8, 8, 3))
    out, _ = _init_apply(models.tinysr, x)
    assert out.shape == (2, 16, 16, 3)


def test_srresnet_shape_and_bn_state():
    x = jnp.zeros((2, 8, 8, 3))
    t = transform(lambda a, train=False: models.srresnet(
        a, train=train, scale=4, width=8, blocks=1))
    params, state = t.init(jax.random.key(0), x, True)
    # SRResNet has batch-norm: moving stats must exist in state
    assert state, "expected BN moving stats in SRResNet state"
    out, new_state = t.apply(params, state, None, x, True)
    assert out.shape == (2, 32, 32, 3)


def test_sr_discriminator_logits():
    x = jnp.zeros((4, 32, 32, 3))
    t = transform(lambda a, train=False: models.sr_discriminator(
        a, train=train, width=8))
    params, state = t.init(jax.random.key(0), x, True)
    out, _ = t.apply(params, state, None, x, False)
    assert out.shape == (4, 1)


def test_sr_models_in_registry():
    assert "edsr" in models.list_models("sr")
    assert models.get_model("tinysr") is models.tinysr
    assert "tinysr" in models.list_models()


def test_edsr_init_is_depth_stable():
    # regression: He-init BN-free residual branches have gain ~2, so a
    # 16-block body amplified init activations ~3^16 (outputs +-1e4).
    # Zero-init branch/tail convs start the net at the mean-image
    # baseline: output exactly 0 regardless of depth.
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3),
                    jnp.float32)
    out, _ = _init_apply(models.edsr, x, scale=2, width=16, blocks=16)
    assert float(jnp.max(jnp.abs(out))) == 0.0


# ------------------------------------------------------------ images subset

def test_synthetic_subset_structured():
    imgs, labels = images_mod.synthetic_subset(4, (32, 32), seed=0)
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.shape == (4,) and not labels.any()
    # structured, not constant: real dynamic range per image
    assert all(im.max() - im.min() > 100 for im in imgs)


def test_read_subset_flat_and_nested(tmp_path):
    from PIL import Image
    d = tmp_path / "train"
    (d / "sub").mkdir(parents=True)
    Image.new("RGB", (8, 8)).save(d / "b.png")
    Image.new("RGB", (8, 8)).save(d / "a.jpg")
    Image.new("RGB", (8, 8)).save(d / "sub" / "c.png")
    (d / "notes.txt").write_text("ignored")
    paths = images_mod.read_subset(str(tmp_path), "train")
    assert [os.path.basename(p) for p in paths] == ["a.jpg", "b.png",
                                                    "c.png"]
    with pytest.raises(FileNotFoundError):
        images_mod.read_subset(str(tmp_path), "val")


# ----------------------------------------------------------- build_sr e2e

SR_CFG = dict(
    task="sr", model="tinysr", model_kwargs=dict(width=8, blocks=1),
    scale=2, hr_size=32, sr_metric="psnr", dataset="images",
    data_dir=None, num_classes=0, batch_size=8, total_steps=40,
    val_every=40, seed=0, precision="f32",
    optimizer=dict(name="adam", lr=dict(kind="constant", lr=2e-3)),
)


def test_build_sr_trains_and_evaluates(tmp_path):
    from myconvnet_tpu.train import optim

    net, train_set, val_set = recipes.build_sr(
        SR_CFG, synthetic=True, ckpt_dir=str(tmp_path))
    net.logger.stdout = False
    evaluator = recipes.build_evaluator(SR_CFG)
    net.build(optim.adam(2e-3))
    score0 = net.evaluate(val_set, evaluator, batch_size=8)
    net.train(train_set, val_set, batch_size=8, total_steps=60,
              optimizer=optim.adam(2e-3), evaluator=evaluator,
              val_every=60)
    score = net.evaluate(val_set, evaluator, batch_size=8)
    # training must lift PSNR well above the untrained net, and the
    # structured synthetic images put a trained x2 net above the
    # "garbage image" band (~10 dB)
    assert score > score0 + 3.0, (score0, score)
    assert score > 15.0, score

    # predict path: REAL LR uint8 input -> HR prediction
    lr_imgs = images_mod.synthetic_subset(4, (16, 16), seed=2)[0]
    pred = net.predict(lr_imgs, batch_size=4)
    assert pred.shape == (4, 32, 32, 3)
    assert np.all(np.isfinite(pred))

    # checkpoint roundtrip
    net.save()
    net2, _, _ = recipes.build_sr(SR_CFG, synthetic=True,
                                  ckpt_dir=str(tmp_path))
    net2.build(optim.adam(2e-3))
    net2.restore()
    np.testing.assert_allclose(net2.predict(lr_imgs, batch_size=4), pred,
                               atol=1e-5)


def test_build_sr_rejects_bad_scale():
    cfg = dict(SR_CFG, hr_size=33)
    with pytest.raises(ValueError, match="not divisible"):
        recipes.build_sr(cfg, synthetic=True)


# ----------------------------------------------------------------- SRGAN

# --------------------------------------------------- shared SR transforms

def test_area_downsample_exact_box_mean():
    from myconvnet_tpu.models.sr import area_downsample
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = np.asarray(area_downsample(x, 2))
    ref = np.asarray([[2.5, 4.5], [10.5, 12.5]], np.float32)
    np.testing.assert_array_equal(out[0, :, :, 0], ref)
    with pytest.raises(ValueError, match="not divisible"):
        area_downsample(x, 3)


def test_center_crop_hw_geometry_and_rejection():
    from myconvnet_tpu.models.sr import center_crop_hw
    x = np.arange(6 * 8, dtype=np.float32).reshape(1, 6, 8, 1)
    out = np.asarray(center_crop_hw(x, 4))
    np.testing.assert_array_equal(out, x[:, 1:5, 2:6])
    with pytest.raises(ValueError, match="smaller than crop"):
        center_crop_hw(x, 7)


# ----------------------------------------------- x8 TTA (self-ensemble)

def _randomized_sr_net():
    """build_sr net with random (non-zero) params — the zero-init tail
    makes the untrained net output a constant image, which would make
    any equivariance test trivially pass."""
    from myconvnet_tpu.train import optim
    net, _, _ = recipes.build_sr(SR_CFG, synthetic=True)
    net.build(optim.adam(1e-3))
    rng = np.random.RandomState(0)
    net.state = net.state._replace(params=jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0.0, 0.05, np.shape(p)),
                              np.asarray(p).dtype), net.state.params))
    return net


def test_sr_x8_tta_is_dihedral_equivariant():
    # the group-averaged ensemble f_ens(x) = 1/8 sum_g g^-1 f(g x) is
    # exactly equivariant under every dihedral element; a wrong inverse
    # transform in any view breaks this
    net = _randomized_sr_net()
    x = images_mod.synthetic_subset(2, (16, 16), seed=3)[0]
    out = net.predict(x, batch_size=2, tta="x8")
    assert out.shape == (2, 32, 32, 3)
    assert float(np.std(out)) > 1e-3  # non-constant: the test is live
    out_rot = net.predict(np.rot90(x, 1, axes=(1, 2)).copy(),
                          batch_size=2, tta="x8")
    np.testing.assert_allclose(out_rot, np.rot90(out, 1, axes=(1, 2)),
                               atol=1e-4, rtol=1e-4)


def test_sr_flip_tta_is_mirror_equivariant():
    net = _randomized_sr_net()
    x = images_mod.synthetic_subset(2, (16, 16), seed=4)[0]
    out = net.predict(x, batch_size=2, tta="flip")
    out_m = net.predict(x[:, :, ::-1].copy(), batch_size=2, tta="flip")
    np.testing.assert_allclose(out_m, out[:, :, ::-1],
                               atol=1e-4, rtol=1e-4)
    # plain (no-TTA) predict differs from the ensemble on a random net
    plain = net.predict(x, batch_size=2)
    assert float(np.max(np.abs(plain - out))) > 1e-4


def test_tta_mode_task_mismatch_rejected():
    net = _randomized_sr_net()
    x = images_mod.synthetic_subset(2, (16, 16), seed=5)[0]
    with pytest.raises(ValueError, match="classification protocol"):
        net.predict(x, batch_size=2, tta="ten_crop")
    cfg = recipes.load_config("configs/cifar10_smallnet.py",
                              total_steps=2, batch_size=4)
    from myconvnet_tpu.train import optim
    clf, _, _ = recipes.build_classifier(cfg, synthetic=True)
    clf.build(optim.adam(1e-3))
    xc = np.zeros((4, 32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="image-output protocol"):
        clf.predict(xc, batch_size=4, tta="x8")


SRGAN_CFG = dict(
    task="gan", gan_kind="srgan", scale=4, hr_size=32, image_size=32,
    generator_kwargs=dict(width=8, blocks=1),
    discriminator_kwargs=dict(width=8),
    l1_weight=100.0, gan_loss="nonsaturating", dataset="images",
    data_dir=None, batch_size=4, total_steps=2, seed=0, precision="f32",
    g_optimizer=dict(name="adam", lr=dict(kind="constant", lr=1e-4)),
    d_optimizer=dict(name="adam", lr=dict(kind="constant", lr=1e-4)),
)


def test_srgan_fused_step_and_sampler():
    state, step, data_iter, kind = recipes.build_gan(SRGAN_CFG,
                                                     synthetic=True)
    assert kind == "srgan"
    it = data_iter()
    for _ in range(2):
        lr, hr = next(it)
        assert lr.shape == (4, 8, 8, 3) and hr.shape == (4, 32, 32, 3)
        state, metrics = step(state, (jnp.asarray(lr), jnp.asarray(hr)))
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
    assert int(state.step) == 2

    sampler = recipes.make_gan_sampler(SRGAN_CFG)
    out = sampler(state, lr)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8


def test_srgan_g_pretrain_grafts_srresnet_checkpoint(tmp_path):
    # the paper's SRResNet-then-adversarial schedule: a build_sr
    # checkpoint of the SAME generator architecture warm-starts the GAN
    # generator exactly (shared transform scopes + value space)
    from myconvnet_tpu.train import optim
    sr_cfg = dict(SR_CFG, model="srresnet", scale=4,
                  model_kwargs=dict(width=8, blocks=1))
    net, _, _ = recipes.build_sr(sr_cfg, synthetic=True)
    net.build(optim.adam(1e-3))
    rng = np.random.RandomState(1)
    net.state = net.state._replace(params=jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0.0, 0.05, np.shape(p)),
                              np.asarray(p).dtype), net.state.params))
    net.save(str(tmp_path))

    cfg = dict(SRGAN_CFG, g_pretrain=str(tmp_path))
    state, _step, _it, _kind = recipes.build_gan(cfg, synthetic=True)
    flat_sr = jax.tree_util.tree_leaves_with_path(net.state.params)
    flat_gan = jax.tree_util.tree_leaves_with_path(state.g_params)
    assert len(flat_sr) == len(flat_gan) > 0
    for (path_a, leaf_a), (path_b, leaf_b) in zip(flat_sr, flat_gan):
        assert path_a == path_b
        np.testing.assert_array_equal(np.asarray(leaf_a),
                                      np.asarray(leaf_b))


def test_srgan_g_pretrain_shape_mismatch_rejected(tmp_path):
    from myconvnet_tpu.train import optim
    sr_cfg = dict(SR_CFG, model="srresnet", scale=4,
                  model_kwargs=dict(width=16, blocks=1))  # wrong width
    net, _, _ = recipes.build_sr(sr_cfg, synthetic=True)
    net.build(optim.adam(1e-3))
    net.save(str(tmp_path))
    cfg = dict(SRGAN_CFG, g_pretrain=str(tmp_path))
    with pytest.raises(ValueError):
        recipes.build_gan(cfg, synthetic=True)
