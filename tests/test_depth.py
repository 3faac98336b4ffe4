"""Depth family tests (models/depth.py, train/losses.py:silog_loss,
eval/depth.py, subsets/depth.py, recipes.build_depth)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.depth import DepthEvaluator
from myconvnet_tpu.subsets import depth as depth_mod
from myconvnet_tpu.train.losses import silog_loss


# ---------------------------------------------------------------- loss

def test_silog_matches_numpy():
    rng = np.random.RandomState(0)
    pred = rng.uniform(0.5, 9.0, (2, 8, 8, 1)).astype(np.float32)
    gt = rng.uniform(0.5, 9.0, (2, 8, 8, 1)).astype(np.float32)
    gt[0, :2] = 0.0  # invalid pixels must drop out
    got = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), lam=0.5))
    mask = gt > 0
    d = np.log(pred[mask]) - np.log(gt[mask])
    want = float(np.mean(d * d) - 0.5 * np.mean(d) ** 2)
    assert got == pytest.approx(want, rel=1e-5)


def test_silog_zero_at_perfect_prediction():
    gt = np.full((1, 4, 4, 1), 3.0, np.float32)
    assert float(silog_loss(jnp.asarray(gt), jnp.asarray(gt))) == \
        pytest.approx(0.0, abs=1e-9)


def test_silog_scale_invariant_at_lam_1():
    """lam=1 makes a global scale factor free (Eigen's property)."""
    rng = np.random.RandomState(1)
    gt = rng.uniform(1.0, 5.0, (1, 6, 6, 1)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, gt.shape).astype(np.float32)
    l1 = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), lam=1.0))
    l2 = float(silog_loss(jnp.asarray(pred * 2.7), jnp.asarray(gt),
                          lam=1.0))
    assert l1 == pytest.approx(l2, rel=1e-4)


def test_silog_grad_finite_with_invalid_pixels():
    gt = np.zeros((1, 4, 4, 1), np.float32)  # ALL invalid
    gt[0, 0, 0, 0] = 2.0
    pred = np.full((1, 4, 4, 1), 1.0, np.float32)
    g = jax.grad(lambda p: silog_loss(p, jnp.asarray(gt)))(
        jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------- evaluator

def test_depth_evaluator_matches_numpy():
    """Per-image metrics averaged over images — the published
    monodepth/BTS eval-script convention (mean of per-image RMSE
    roots, equal weight per image regardless of valid-pixel count)."""
    rng = np.random.RandomState(2)
    gt = rng.uniform(0.5, 9.0, (3, 8, 8, 1))
    pred = gt * rng.uniform(0.7, 1.4, gt.shape)
    gt[1, :3] = 0.0
    ev = DepthEvaluator()
    ev.update(pred[:2], gt[:2])
    ev.update(pred[2:], gt[2:])
    rep = ev.report()
    absrel, rmse, d1 = [], [], []
    for i in range(3):
        m = gt[i] > 1e-3
        p, t = pred[i][m], gt[i][m]
        absrel.append(np.mean(np.abs(p - t) / t))
        rmse.append(np.sqrt(np.mean((p - t) ** 2)))
        r = np.maximum(p / t, t / p)
        d1.append(np.mean(r < 1.25))
    assert rep["absrel"] == pytest.approx(float(np.mean(absrel)),
                                          rel=1e-6)
    assert rep["rmse"] == pytest.approx(float(np.mean(rmse)), rel=1e-6)
    assert rep["delta1"] == pytest.approx(float(np.mean(d1)), rel=1e-6)
    assert ev.score() == pytest.approx(rep["absrel"])
    assert not ev.higher_is_better


def test_depth_evaluator_median_scaling_fixes_scale():
    gt = np.random.RandomState(3).uniform(1, 8, (2, 8, 8, 1))
    ev = DepthEvaluator(median_scaling=True)
    ev.update(gt * 3.0, gt)  # wrong by a pure scale
    assert ev.score() == pytest.approx(0.0, abs=1e-9)
    ev2 = DepthEvaluator(metric="delta1")
    ev2.update(gt * 3.0, gt)
    assert ev2.higher_is_better
    assert ev2.score() == 0.0  # ratio 3 > 1.25 everywhere


def test_depth_evaluator_rejects_unknown_metric():
    with pytest.raises(ValueError):
        DepthEvaluator(metric="mae")


def test_depth_models_reject_misaligned_hw():
    f = transform(lambda a: models.DEPTH_MODELS["tinydepth"](a))
    with pytest.raises(ValueError, match="divisible by 8"):
        f.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 32, 3)))
    g = transform(lambda a: models.DEPTH_MODELS["depth_unet"](a))
    with pytest.raises(ValueError, match="divisible by 32"):
        g.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 128, 3)))


# -------------------------------------------------------------- models

def test_tinydepth_shapes_and_range():
    f = transform(lambda a: models.DEPTH_MODELS["tinydepth"](
        a, train=False, min_depth=0.2, max_depth=8.0))
    params, state = f.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 48, 3)))
    y, _ = f.apply(params, state, None, jnp.ones((2, 32, 48, 3)) * 0.5)
    assert y.shape == (2, 32, 48, 1)
    assert y.dtype == jnp.float32
    assert float(y.min()) >= 0.2 - 1e-5
    assert float(y.max()) <= 8.0 + 1e-4


@pytest.mark.slow
def test_depth_unet_shapes():
    f = transform(lambda a: models.DEPTH_MODELS["depth_unet"](
        a, train=False, depth=18))
    params, state = f.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3)))
    y, _ = f.apply(params, state, None, jnp.zeros((1, 64, 96, 3)))
    assert y.shape == (1, 64, 96, 1)
    # inverse-depth default range [0.1, 10]
    assert float(y.min()) >= 0.1 - 1e-5
    assert float(y.max()) <= 10.0 + 1e-3


# -------------------------------------------------------------- subset

def test_synthetic_scenes_deterministic_and_valid():
    imgs, depths = depth_mod.synthetic_depth_scenes(4, (24, 32), seed=5)
    imgs2, depths2 = depth_mod.synthetic_depth_scenes(4, (24, 32),
                                                      seed=5)
    assert np.array_equal(imgs, imgs2)
    assert np.array_equal(depths, depths2)
    assert imgs.shape == (4, 24, 32, 3) and imgs.dtype == np.uint8
    assert depths.shape == (4, 24, 32, 1)
    valid = depths[depths > 0]
    assert valid.size > 0.9 * depths.size  # dropout is sparse
    assert valid.max() <= depth_mod.DEFAULT_MAX_DEPTH + 1e-5


def test_depth_fog_cue_correlates():
    """The renderer's contract: appearance encodes depth (darker =
    farther), so brightness and depth must anti-correlate."""
    imgs, depths = depth_mod.synthetic_depth_scenes(8, (32, 48), seed=7)
    lum = imgs.astype(np.float32).mean(-1).ravel()
    z = depths[..., 0].ravel()
    m = z > 0
    r = np.corrcoef(lum[m], z[m])[0, 1]
    assert r < -0.5


def test_depth_pair_layout_roundtrip(tmp_path):
    from PIL import Image
    root = tmp_path / "train"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 60, 3), np.uint8)
                        ).save(root / "rgb" / f"f{i}.png")
        d_mm = (rng.uniform(0.5, 9.0, (40, 60)) * 1000).astype(np.uint16)
        Image.fromarray(d_mm).save(
            root / "depth" / f"f{i}.png")
    rgb, dep = depth_mod.read_subset(str(tmp_path), "train")
    assert len(rgb) == 3
    src = depth_mod.DepthPairSource(rgb, dep, hw=(32, 48))
    x, y = src.get_batch(np.array([0, 2]))
    assert x.shape == (2, 32, 48, 3) and x.dtype == np.uint8
    assert y.shape == (2, 32, 48, 1)
    assert 0.4 < y.min() and y.max() < 9.5  # millimeters became meters


def test_depth_missing_twin_raises(tmp_path):
    from PIL import Image
    root = tmp_path / "train"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        root / "rgb" / "a.png")
    with pytest.raises(FileNotFoundError):
        depth_mod.read_subset(str(tmp_path), "train")


# -------------------------------------------------------------- recipe

def test_build_depth_smoke():
    cfg = dict(task="depth", model="tinydepth", input_hw=(24, 32),
               synthetic_n=16, max_depth=10.0,
               optimizer=dict(name="adam",
                              lr=dict(kind="constant", lr=1e-3)))
    net, tr, va = recipes.build_depth(cfg, synthetic=True)
    x, y = tr.source.get_batch(np.arange(4))
    assert x.dtype == np.uint8 and y.shape == (4, 24, 32, 1)
    ev = recipes.build_evaluator(cfg)
    assert isinstance(ev, DepthEvaluator)


def test_build_depth_rejects_unknown_model():
    with pytest.raises(ValueError, match="unknown depth model"):
        recipes.build_depth(dict(task="depth", model="nope"),
                            synthetic=True)


@pytest.mark.slow
def test_cli_roundtrip(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    common = ["--set", "model=tinydepth", "--set", "model_kwargs={}",
              "--set", "input_hw=(24, 32)",
              "--set", "synthetic_n=32", "--set", "val_every=0",
              "--set", "precision=f32"]
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/nyu_depth_unet.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "log_every=1"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/nyu_depth_unet.py", "--ckpt", str(out),
         "--synthetic", "--platform", "cpu", "--batch", "4",
         "--report"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "absrel" in r2.stdout


@pytest.mark.slow
def test_depth_learns_synthetic():
    """A short run on the fogged scenes must beat the
    predict-the-prior baseline on AbsRel."""
    cfg = dict(task="depth", model="tinydepth", input_hw=(32, 48),
               synthetic_n=64, max_depth=10.0, min_depth=0.1,
               aug_brightness=0.0, aug_contrast=0.0,
               optimizer=dict(name="adam",
                              lr=dict(kind="constant", lr=2e-3)))
    net, tr, va = recipes.build_depth(cfg, synthetic=True)
    opt = recipes.make_optimizer(cfg["optimizer"])
    ev = DepthEvaluator()
    base = net.evaluate(va, ev, batch_size=16)  # untrained
    net.train(tr, batch_size=16, total_steps=400, optimizer=opt)
    ev2 = DepthEvaluator()
    trained = net.evaluate(va, ev2, batch_size=16)
    # measured trajectory on this corpus: base ~0.95, 0.43 @200,
    # 0.14 @400 — the margin below is wide on purpose
    assert trained < base * 0.5, (base, trained)
    assert trained < 0.35
