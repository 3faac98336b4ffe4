"""Style-transfer family tests (models/style.py, train/perceptual.py,
train/style.py, recipes.build_style)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.train import perceptual
from myconvnet_tpu.train import style as style_lib


def _tiny_cfg(**over):
    cfg = dict(task="style", dataset="images", data_dir=None,
               image_size=32, gen_width=8, gen_res_blocks=2,
               style_image=None, style_seed=7,
               style_layers=("relu1_2", "relu2_2"),
               content_weight=1.0, style_weight=5.0, tv_weight=1e-4,
               batch_size=4, total_steps=3, log_every=1,
               sample_every=0, synthetic_n=32,
               optimizer=dict(name="adam", lr=1e-3),
               precision="f32", seed=0)
    cfg.update(over)
    # tiny generator via the transformer_net kwargs path
    return cfg


# ------------------------------------------------------------ perceptual

def test_vgg_taps_exist():
    t, feats = perceptual.make_vgg_extractor(("relu1_2", "relu2_2",
                                              "relu3_3", "relu4_3"))
    x = jnp.zeros((1, 64, 64, 3))
    params, state = t.init(jax.random.PRNGKey(0), x)
    out = feats(params, state, x)
    assert set(out) == {"relu1_2", "relu2_2", "relu3_3", "relu4_3"}
    assert out["relu1_2"].shape == (1, 64, 64, 64)
    assert out["relu4_3"].shape == (1, 8, 8, 512)


def test_gram_matrix_properties():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(2, 6, 5, 4).astype(np.float32))
    g = np.asarray(perceptual.gram_matrix(f))
    assert g.shape == (2, 4, 4)
    # symmetric PSD
    np.testing.assert_allclose(g, np.swapaxes(g, 1, 2), atol=1e-5)
    assert (np.linalg.eigvalsh(g) > -1e-4).all()
    # spatial-permutation invariant (style, not layout)
    perm = rng.permutation(30)
    fp = f.reshape(2, 30, 4)[:, perm, :].reshape(2, 6, 5, 4)
    np.testing.assert_allclose(np.asarray(perceptual.gram_matrix(fp)),
                               g, atol=1e-5)
    # manual check at one entry
    f0 = np.asarray(f)[0].reshape(30, 4)
    np.testing.assert_allclose(g[0, 1, 2],
                               (f0[:, 1] * f0[:, 2]).sum() / (6 * 5 * 4),
                               rtol=1e-5)


def test_tv_loss():
    flat = jnp.ones((1, 4, 4, 3))
    assert float(perceptual.tv_loss(flat)) == 0.0
    stripes = jnp.tile(jnp.asarray([0.0, 1.0]), (1, 4, 2, 1))
    stripes = stripes.reshape(1, 4, 4, 1)
    assert float(perceptual.tv_loss(stripes)) > 0.4


def test_style_content_losses_zero_at_target():
    t, feats = perceptual.make_vgg_extractor(("relu1_2",))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, 32, 32, 3).astype(np.float32))
    params, state = t.init(jax.random.PRNGKey(0), x)
    f = feats(params, state, x)
    grams = {k: perceptual.gram_matrix(v) for k, v in f.items()}
    assert float(perceptual.style_loss(f, grams)) < 1e-8
    assert float(perceptual.content_loss(f, f, "relu1_2")) == 0.0


# --------------------------------------------------------------- models

def test_transformer_net_shapes_and_range():
    t = transform(lambda x, train=False: models.transformer_net(
        x, width=8, n_res=2, train=train))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, 32, 32, 3).astype(np.float32))
    params, state = t.init(jax.random.PRNGKey(0), x)
    y, _ = t.apply(params, state, None, x, False)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_transformer_net_rejects_bad_hw():
    t = transform(lambda x, train=False: models.transformer_net(
        x, width=8, n_res=1, train=train))
    with pytest.raises(ValueError, match="multiples of 4"):
        t.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 32, 3)))


# --------------------------------------------------------------- recipe

def test_style_step_reduces_losses():
    """The fused step optimizes: total loss drops and the style term
    moves toward the target Grams."""
    cfg = _tiny_cfg(total_steps=30)
    state, step, data_iter_fn, kind = recipes.build_style(
        cfg, synthetic=True)
    assert kind == "johnson"
    it = data_iter_fn()
    x0 = next(it)
    _, m0 = step(state, x0)  # throwaway measurement state
    # re-build (step donated the state above)
    state, step, data_iter_fn, _ = recipes.build_style(
        cfg, synthetic=True)
    it = data_iter_fn()
    first = None
    for i, x in enumerate(it):
        if i >= 30:
            break
        state, m = step(state, x)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
    last = {k: float(v) for k, v in m.items()}
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first, last)
    assert last["style"] < first["style"], (first, last)
    it.close()


def test_procedural_style_image_deterministic():
    a = recipes.procedural_style_image((32, 32), seed=7)
    b = recipes.procedural_style_image((32, 32), seed=7)
    c = recipes.procedural_style_image((32, 32), seed=8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 32, 32, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, c)


def test_stylizer_roundtrip():
    cfg = _tiny_cfg()
    state, step, data_iter_fn, _ = recipes.build_style(cfg,
                                                       synthetic=True)
    stylize = recipes.make_stylizer(cfg, state)
    x_u8 = np.random.RandomState(0).randint(
        0, 256, (2, 32, 32, 3), np.uint8)
    y = np.asarray(stylize(x_u8))
    assert y.shape == (2, 32, 32, 3)
    assert y.min() >= 0.0 and y.max() <= 1.0
    # float [0,1] input takes the same path
    y2 = np.asarray(stylize(x_u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(y, y2, atol=1e-5)


def test_vgg16_features_import_roundtrip():
    """A torch-layout vgg16 state_dict (numpy stand-in) maps onto the
    extractor's params with exact OIHW->HWIO transposition."""
    from myconvnet_tpu.models.pretrained import (
        _VGG16_FEATURES_IDX, import_torch_vgg16_features)
    t, feats = perceptual.make_vgg_extractor(("relu1_2",))
    x = jnp.zeros((1, 32, 32, 3))
    params, state = t.init(jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(0)
    sd = {}
    shapes = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
              (256, 256), (256, 256), (512, 256), (512, 512),
              (512, 512), (512, 512), (512, 512), (512, 512)]
    for idx, (o, i) in zip(_VGG16_FEATURES_IDX, shapes):
        sd[f"features.{idx}.weight"] = rng.randn(o, i, 3, 3) \
            .astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(o).astype(np.float32)
    new = import_torch_vgg16_features(sd, params)
    np.testing.assert_allclose(
        np.asarray(new["conv"]["w"]),
        np.transpose(sd["features.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(new["conv_12"]["b"]),
                               sd["features.28.bias"])
    # BN checkpoints are refused
    sd["features.1.weight"] = np.zeros(64, np.float32)
    with pytest.raises(ValueError, match="vgg16_bn"):
        import_torch_vgg16_features(sd, params)


@pytest.mark.slow
def test_cli_style_run(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/coco_style_johnson.py", "--synthetic", "--steps", "3",
         "--batch", "2", "--out", str(out), "--platform", "cpu",
         "--set", "image_size=32", "--set", "gen_width=8",
         "--set", "gen_res_blocks=2", "--set", "log_every=1",
         "--set", "style_layers=('relu1_2','relu2_2')",
         "--set", "sample_every=2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    import os
    assert any(f.startswith("ckpt") or f.endswith(".npz")
               for f in os.listdir(out)), list(os.listdir(out))


# ------------------------------------------------- review-finding fixes

def test_style_layers_without_content_layer():
    """style_layers omitting relu2_2 must still work: the extractor
    adds the content tap, and the Gram term covers ONLY the style
    layers."""
    cfg = _tiny_cfg(style_layers=("relu1_2",))
    state, step, data_iter_fn, _ = recipes.build_style(cfg,
                                                       synthetic=True)
    it = data_iter_fn()
    state, m = step(state, next(it))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["content"]))
    it.close()


def test_stylizer_static_dtype_detection():
    """uint8 is detected by dtype, not value: an all-dark uint8 batch
    must still be scaled /255 (a runtime max()>1.5 heuristic broke
    this)."""
    cfg = _tiny_cfg()
    state, _step, _it, _ = recipes.build_style(cfg, synthetic=True)
    stylize = recipes.make_stylizer(cfg, state)
    dark_u8 = np.ones((1, 32, 32, 3), np.uint8)  # max = 1
    y_u8 = np.asarray(stylize(dark_u8))
    y_f = np.asarray(stylize(dark_u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(y_u8, y_f, atol=1e-6)


def test_stylizer_fn_is_state_generic():
    """make_stylizer_fn takes params as arguments — the same compiled
    fn serves evolving weights without retracing."""
    cfg = _tiny_cfg()
    state, step, data_iter_fn, _ = recipes.build_style(cfg,
                                                       synthetic=True)
    fn = recipes.make_stylizer_fn(cfg)
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    y0 = np.asarray(fn(state.params, state.model_state, x))
    it = data_iter_fn()
    state, _ = step(state, next(it))
    y1 = np.asarray(fn(state.params, state.model_state, x))
    it.close()
    assert y0.shape == y1.shape == (1, 32, 32, 3)
    assert not np.allclose(y0, y1)  # weights moved


def test_vgg_import_rejects_bad_bias():
    from myconvnet_tpu.models.pretrained import (
        _VGG16_FEATURES_IDX, import_torch_vgg16_features)
    t, _f = perceptual.make_vgg_extractor(("relu1_2",))
    params, _s = t.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(0)
    shapes = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
              (256, 256), (256, 256), (512, 256), (512, 512),
              (512, 512), (512, 512), (512, 512), (512, 512)]
    sd = {}
    for idx, (o, i) in zip(_VGG16_FEATURES_IDX, shapes):
        sd[f"features.{idx}.weight"] = rng.randn(o, i, 3, 3) \
            .astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(o).astype(np.float32)
    sd["features.5.bias"] = np.zeros(3, np.float32)  # corrupt
    with pytest.raises(ValueError, match="bias"):
        import_torch_vgg16_features(sd, params)


@pytest.mark.slow
def test_generate_stylize_roundtrip(tmp_path):
    """train.py (3 steps) -> generate.py writes a content|stylized
    grid from the checkpoint."""
    import subprocess
    import sys
    out = tmp_path / "run"
    common = ["--set", "image_size=32", "--set", "gen_width=8",
              "--set", "gen_res_blocks=2",
              "--set", "style_layers=('relu1_2','relu2_2')"]
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/coco_style_johnson.py", "--synthetic", "--steps", "2",
         "--batch", "2", "--out", str(out), "--platform", "cpu",
         "--set", "log_every=1"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    grid = tmp_path / "styled.png"
    r2 = subprocess.run(
        [sys.executable, "generate.py", "--config",
         "configs/coco_style_johnson.py", "--ckpt", str(out),
         "--n", "2", "--out", str(grid), "--platform", "cpu"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert grid.exists() and grid.stat().st_size > 0
