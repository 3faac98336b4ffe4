"""Video family tests (models/video.py, ops/conv3d.py,
subsets/video.py, recipes.build_video)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.ops.conv3d import (avg_pool3d, conv3d,
                                      global_avg_pool3d, max_pool3d)
from myconvnet_tpu.subsets import video as video_mod


def _tiny_cfg(**over):
    cfg = dict(task="video", model="tinyvideo", model_kwargs={},
               dataset="video", data_dir=None, num_classes=4,
               num_frames=6, input_hw=(16, 16), batch_size=8,
               total_steps=3, val_every=0, log_every=1,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=0.1),
               precision="f32", seed=0)
    cfg.update(over)
    return cfg


# ------------------------------------------------------------------ ops

def test_conv3d_matches_manual_valid():
    """3-D conv against a hand-rolled sliding-window sum."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 5, 5, 2).astype(np.float32)
    w = rng.randn(2, 3, 3, 2, 3).astype(np.float32)
    y = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w),
                          padding="VALID", precision="highest"))
    assert y.shape == (1, 3, 3, 3, 3)
    # manual at one output position
    for (d, i, j, o) in [(0, 0, 0, 0), (2, 1, 2, 2), (1, 2, 1, 1)]:
        ref = np.sum(x[0, d:d + 2, i:i + 3, j:j + 3, :]
                     * w[..., o])
        np.testing.assert_allclose(y[0, d, i, j, o], ref, rtol=1e-4)


def test_pool3d_shapes_and_values():
    x = jnp.arange(2 * 4 * 4 * 4 * 1, dtype=jnp.float32).reshape(
        2, 4, 4, 4, 1)
    mx = max_pool3d(x, 2, 2, padding="VALID")
    av = avg_pool3d(x, 2, 2, padding="VALID")
    assert mx.shape == (2, 2, 2, 2, 1) and av.shape == mx.shape
    block = np.asarray(x)[0, 0:2, 0:2, 0:2, 0]
    assert float(mx[0, 0, 0, 0, 0]) == block.max()
    np.testing.assert_allclose(float(av[0, 0, 0, 0, 0]), block.mean(),
                               rtol=1e-6)
    g = global_avg_pool3d(x)
    assert g.shape == (2, 1)


# --------------------------------------------------------------- models

def test_video_models_shapes_and_params():
    # r3d_18 must match torchvision's 33.4M; r2plus1d_18 is built on
    # the paper's parameter-MATCHING mid-width formula, so its count
    # lands near the 3-D one by construction (33.4M here; published
    # tables vary with mid-width rounding choices)
    for name, lo, hi in [("r3d_18", 33.0, 33.8),
                         ("r2plus1d_18", 31.0, 33.8)]:
        fn = models.VIDEO_MODELS[name]
        model = transform(lambda x, train=False, _f=fn:
                          _f(x, 400, train=train))
        x = jnp.zeros((1, 4, 32, 32, 3))
        params, state = model.init(jax.random.key(0), x, True)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(params)) / 1e6
        assert lo < n < hi, (name, n)
        out, _ = model.apply(params, state, None, x, False)
        assert out.shape == (1, 400)


def test_synthetic_clips_are_temporally_labeled():
    x, y = video_mod.synthetic_clips(16, 6, (16, 16), seed=0)
    assert x.shape == (16, 6, 16, 16, 3) and x.dtype == np.uint8
    assert set(np.unique(y)).issubset({0, 1, 2, 3})
    # frames move: consecutive frames differ
    assert not np.array_equal(x[0, 0], x[0, 1])


def test_clip_source_real_layout(tmp_path):
    """read_subset + ClipSource over an on-disk frame tree."""
    from PIL import Image
    rng = np.random.RandomState(0)
    for cls in ("jump", "run"):
        for vid in range(2):
            d = tmp_path / "train" / cls / f"v{vid}"
            d.mkdir(parents=True)
            for f in range(5):
                Image.fromarray(
                    rng.randint(0, 255, (20, 24, 3), np.uint8)).save(
                        d / f"frame_{f:03d}.jpg")
    dirs, labels, classes = video_mod.read_subset(str(tmp_path), "train")
    assert classes == ["jump", "run"] and len(dirs) == 4
    src = video_mod.ClipSource(dirs, labels, num_frames=3,
                               raw_hw=(16, 16))
    clips, y = src.get_batch(np.array([0, 3]))
    assert clips.shape == (2, 3, 16, 16, 3) and clips.dtype == np.uint8
    np.testing.assert_array_equal(y, labels[[0, 3]])


# --------------------------------------------------------------- recipe

def test_video_recipe_trains():
    """Fast smoke: the full ConvNet ride (5-D clips through the jitted
    step with clip-coherent hflip) trains and the loss drops."""
    cfg = _tiny_cfg(total_steps=150, batch_size=16,
                    optimizer=dict(name="momentum", momentum_coef=0.9,
                                   lr=0.2))
    net, train_set, val_set = recipes.build_video(cfg, synthetic=True)
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    opt = recipes.make_optimizer(cfg["optimizer"])
    net.train(train_set, val_set, batch_size=16, total_steps=150,
              optimizer=opt, evaluator=AccuracyEvaluator(),
              val_every=0)
    # well above the 4-class chance on the training pool = the 5-D
    # step optimizes; full val generalization is the slow test below
    acc = net.evaluate(train_set, AccuracyEvaluator(), batch_size=16)
    assert acc > 0.4, acc


@pytest.mark.slow
def test_video_recipe_learns_motion_direction():
    """The functional test: motion-direction labels are solvable ONLY
    through temporal modeling (single frames are class-ambiguous by
    construction, appearance is identical across classes) — val
    generalization proves the 3-D conv path learns motion.  The
    train-time hflip remaps labels right<->left (HFLIP_LABEL_SWAP) so
    mirroring is a CORRECT augmentation rather than a 0.75 accuracy
    cap (mislabeled horizontal motion)."""
    cfg = _tiny_cfg(total_steps=300, batch_size=16, synthetic_n=512)
    net, train_set, val_set = recipes.build_video(cfg, synthetic=True)
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    ev = AccuracyEvaluator()
    opt = recipes.make_optimizer(cfg["optimizer"])
    net.train(train_set, val_set, batch_size=16, total_steps=300,
              optimizer=opt, evaluator=ev, val_every=0)
    acc = net.evaluate(val_set, ev, batch_size=16)
    assert acc > 0.5, f"temporal learning failed: acc={acc}"


def test_video_hflip_remaps_direction_labels():
    """Synthetic labels ARE motion directions: the train augmentation
    must swap right(0)<->left(2) on the clips it mirrors and leave
    vertical motion (1, 3) alone, or horizontal examples train
    mislabeled (regression: unconditional flip capped acc at 0.75)."""
    from myconvnet_tpu.subsets.video import HFLIP_LABEL_SWAP
    assert list(HFLIP_LABEL_SWAP) == [2, 1, 0, 3]
    cfg = _tiny_cfg(batch_size=64)
    net, _tr, _va = recipes.build_video(cfg, synthetic=True)
    train_fn = net.augment_fns[0]
    t, h, w = cfg.get("num_frames", 8), *cfg["input_hw"]
    # clips with an off-center bright column so a flip is detectable
    x = np.zeros((64, t, h, w, 3), np.uint8)
    x[:, :, :, 1, :] = 255
    y = np.tile(np.arange(4, dtype=np.int32), 16)
    xo, yo = jax.jit(train_fn)(jax.random.PRNGKey(7), x, y)
    xo, yo = np.asarray(xo), np.asarray(yo)
    flipped = xo[:, 0, 0, w - 2, 0] > xo[:, 0, 0, 1, 0]
    assert flipped.any() and not flipped.all()  # both branches hit
    np.testing.assert_array_equal(
        yo, np.where(flipped, HFLIP_LABEL_SWAP[y], y))


def test_video_ckpt_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    net, train_set, val_set = recipes.build_video(
        cfg, synthetic=True, ckpt_dir=str(tmp_path))
    opt = recipes.make_optimizer(cfg["optimizer"])
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    net.train(train_set, val_set, batch_size=8, total_steps=2,
              optimizer=opt, evaluator=AccuracyEvaluator(), val_every=0)
    net.save()
    net2, _tr, _va = recipes.build_video(cfg, synthetic=True,
                                         ckpt_dir=str(tmp_path))
    net2.build(opt)
    net2.restore(str(tmp_path))
    assert int(net2.state.step) == 2
    x, _ = val_set.source.get_batch(np.arange(4))
    np.testing.assert_allclose(np.asarray(net.predict(x)),
                               np.asarray(net2.predict(x)), atol=1e-5)


def test_registry_and_config():
    assert set(models.list_models("video")) == {"r3d_18", "r2plus1d_18",
                                                "tinyvideo"}
    cfg = recipes.load_config("configs/kinetics_r3d18.py")
    assert cfg["task"] == "video"


@pytest.mark.slow
def test_cli_roundtrip(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/kinetics_r3d18.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "model=tinyvideo", "--set", "num_classes=4",
         "--set", "num_frames=4", "--set", "input_hw=(16,16)",
         "--set", "val_every=0", "--set", "log_every=1",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/kinetics_r3d18.py", "--ckpt", str(out),
         "--synthetic", "--platform", "cpu", "--batch", "4",
         "--set", "model=tinyvideo", "--set", "num_classes=4",
         "--set", "num_frames=4", "--set", "input_hw=(16,16)",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "accuracy" in r2.stdout
