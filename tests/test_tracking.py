"""Tracking family tests (ops/xcorr.py, models/tracking.py,
train/losses.py:siamfc_loss, eval/tracking.py, subsets/tracking.py,
recipes.build_tracking)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.tracking import TrackingEvaluator
from myconvnet_tpu.ops.xcorr import cross_correlate
from myconvnet_tpu.subsets import tracking as track_mod
from myconvnet_tpu.train.losses import siamfc_loss


# --------------------------------------------------------------- xcorr

def test_xcorr_matches_numpy():
    rng = np.random.RandomState(0)
    s = rng.randn(2, 9, 11, 5).astype(np.float32)
    e = rng.randn(2, 4, 3, 5).astype(np.float32)
    got = np.asarray(cross_correlate(jnp.asarray(s), jnp.asarray(e)))
    oh, ow = 9 - 4 + 1, 11 - 3 + 1
    want = np.zeros((2, oh, ow), np.float32)
    for n in range(2):
        for y in range(oh):
            for x in range(ow):
                want[n, y, x] = np.sum(s[n, y:y + 4, x:x + 3] * e[n])
    assert np.abs(got - want).max() < 1e-4
    assert got.shape == (2, oh, ow)


def test_xcorr_peak_localizes_embedded_patch():
    """Planting the exemplar inside the search puts the correlation
    peak exactly at the planted position."""
    rng = np.random.RandomState(1)
    e = rng.randn(1, 3, 3, 4).astype(np.float32)
    s = rng.randn(1, 10, 10, 4).astype(np.float32) * 0.1
    s[0, 5:8, 2:5] = e[0] * 3.0
    r = np.asarray(cross_correlate(jnp.asarray(s), jnp.asarray(e)))
    iy, ix = np.unravel_index(r[0].argmax(), r[0].shape)
    assert (iy, ix) == (5, 2)


def test_xcorr_rejects_bad_shapes():
    with pytest.raises(ValueError, match="larger"):
        cross_correlate(jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 6, 6, 2)))
    with pytest.raises(ValueError, match="N/C"):
        cross_correlate(jnp.zeros((1, 8, 8, 2)), jnp.zeros((1, 3, 3, 4)))


# --------------------------------------------------------------- models

def test_siamfc_shapes_and_translation():
    """tinysiamfc emits the documented 9x9 response, and translating
    the in-search object moves the (eval-mode) response peak the same
    direction — the fully-convolutional property end to end."""
    m = transform(lambda x, train=False: models.TRACK_MODELS
                  ["tinysiamfc"](x, 0, train=train))
    blobs, offs = track_mod.synthetic_track_scenes(
        2, (64, 64), (32, 32), max_offset=8, seed=3, noise=0.0)
    x = jnp.asarray(blobs.astype(np.float32) / 255.0)
    p, s = m.init(jax.random.key(0), x, True)
    r, _ = m.apply(p, s, None, x, False)
    assert r.shape == (2, 9, 9)
    assert r.dtype == jnp.float32


# ----------------------------------------------------------------- loss

def test_siamfc_loss_labels_and_balance():
    """A response that is hot exactly at the target cell scores far
    better than a uniformly-hot one; perfect +inf/-inf-style logits
    drive the loss toward 0; the pos/neg balance keeps a zero response
    at log(2)."""
    off = jnp.asarray([[8.0, -4.0]])         # cell (y=1, x=4) of 9x9
    zero = jnp.zeros((1, 9, 9))
    l_zero = float(siamfc_loss(zero, off, radius=2.0, stride=4))
    assert l_zero == pytest.approx(np.log(2.0), rel=1e-5)
    hot = zero.at[0, 1, 6].set(10.0) - 0.0   # center (4,4)+(dx/4,dy/4)
    # dx=8 -> +2 cells -> x=6; dy=-4 -> -1 cell -> y=3
    hot = zero.at[0, 3, 6].set(10.0)
    l_hot = float(siamfc_loss(hot, off, radius=2.0, stride=4))
    wrong = zero.at[0, 7, 1].set(10.0)
    l_wrong = float(siamfc_loss(wrong, off, radius=2.0, stride=4))
    assert l_hot < l_zero < l_wrong
    # fully-separated logits -> loss ~ 0
    cy = cx = 4
    gy = (np.arange(9) - cy)[:, None] * 4
    gx = (np.arange(9) - cx)[None, :] * 4
    lab = np.where((gy - (-4.0)) ** 2 + (gx - 8.0) ** 2 <= 4.0,
                   1.0, -1.0)
    perfect = jnp.asarray(lab[None] * 20.0)
    assert float(siamfc_loss(perfect, off, radius=2.0,
                             stride=4)) < 1e-6


# ------------------------------------------------------------ evaluator

def test_tracking_evaluator_center_error():
    ev = TrackingEvaluator(stride=4)
    resp = np.zeros((2, 9, 9), np.float32)
    resp[0, 4, 6] = 5.0        # peak at dx=+8, dy=0
    resp[1, 2, 4] = 5.0        # peak at dx=0, dy=-8
    ev.update(resp, np.asarray([[8.0, 0.0], [0.0, 0.0]]))
    rep = ev.report()
    # image 0 exact (err 0), image 1 off by 8px
    assert rep["cerr"] == pytest.approx(4.0)
    assert rep["p8"] == 1.0
    ev2 = TrackingEvaluator(metric="p16", stride=4)
    assert ev2.higher_is_better


# --------------------------------------------------------------- corpus

def test_synthetic_track_scenes_contract():
    blobs, offs = track_mod.synthetic_track_scenes(
        8, (64, 64), (32, 32), max_offset=10, seed=0)
    assert blobs.shape == (8, 64, 64, 6) and blobs.dtype == np.uint8
    assert offs.shape == (8, 2)
    assert np.abs(offs).max() <= 10 + 16   # offset + object-half bound
    # exemplar corner is live, its dead padding is zero
    assert blobs[:, :32, :32, 3:].any()
    assert not blobs[:, 32:, :, 3:].any()
    assert not blobs[:, :, 32:, 3:].any()


def test_got10k_reader_roundtrip(tmp_path):
    """Write a 2-video GOT-10k-style tree, read pairs, check crop
    geometry: with zero motion the offset is ~0; with pure-x motion
    the offset is x-only and scale-consistent."""
    from PIL import Image
    rng = np.random.RandomState(0)
    for vid, dx in (("vid_a", 0), ("vid_b", 6)):
        d = tmp_path / "train" / vid
        d.mkdir(parents=True)
        rows = []
        for t in range(3):
            img = rng.randint(0, 255, (48, 64, 3), np.uint8)
            Image.fromarray(img).save(d / f"{t + 1:08d}.jpg")
            x = 20 + t * dx
            rows.append(f"{x},{12},{16},{16}")
        (d / "groundtruth.txt").write_text("\n".join(rows) + "\n")
    src = track_mod.make_source(str(tmp_path), "train",
                                search_hw=(64, 64),
                                exemplar_hw=(32, 32), frame_gap=2,
                                pairs_per_video=8)
    blobs, offs = src.get_batch(np.arange(len(src)))
    assert blobs.shape[1:] == (64, 64, 6)
    vids = [src.pairs[i][0] for i in range(len(src))]
    for i in range(len(src)):
        vi, fa, fb = src.pairs[i]
        if vi == 0:                       # static video -> zero offset
            assert np.abs(offs[i]).max() < 1e-6
        else:                             # pure-x motion
            assert abs(offs[i][1]) < 1e-6
            gap = fb - fa
            s_z = track_mod._context_side(16, 16)
            expect = 6 * gap * (64.0 / (s_z * 2.0))
            assert offs[i][0] == pytest.approx(expect, abs=1e-4)


def test_reader_rejects_empty(tmp_path):
    (tmp_path / "train").mkdir()
    with pytest.raises(FileNotFoundError, match="groundtruth"):
        track_mod.read_subset(str(tmp_path), "train")


# --------------------------------------------------------------- recipe

def test_tracking_recipe_step_and_eval():
    """build_tracking end to end: a few steps run, loss finite, the
    evaluator consumes the predict path."""
    cfg = dict(task="tracking", model="tinysiamfc",
               model_kwargs=dict(width=8, exemplar_hw=(32, 32)),
               input_hw=(64, 64), synthetic_n=32, max_offset=8,
               batch_size=8, num_classes=0,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.01)),
               precision="f32", seed=0)
    net, tr, va = recipes.build_tracking(cfg, synthetic=True)
    opt = recipes.make_optimizer(cfg["optimizer"])
    ev = recipes.build_evaluator(cfg)
    base = net.evaluate(va, ev, batch_size=8)
    net.train(tr, batch_size=8, total_steps=5, optimizer=opt)
    assert int(net.state.step) == 5


@pytest.mark.slow
def test_siamfc_learns_synthetic():
    """tinysiamfc trained on the textured-square corpus must localize
    far better than the untrained net (center error drops)."""
    cfg = dict(task="tracking", model="tinysiamfc",
               model_kwargs=dict(width=8, exemplar_hw=(32, 32)),
               input_hw=(64, 64), synthetic_n=128, max_offset=8,
               batch_size=16, num_classes=0, aug_brightness=0.0,
               aug_contrast=0.0,
               optimizer=dict(name="adam",
                              lr=dict(kind="constant", lr=2e-3)),
               precision="f32", seed=0)
    net, tr, va = recipes.build_tracking(cfg, synthetic=True)
    opt = recipes.make_optimizer(cfg["optimizer"])
    base = net.evaluate(va, recipes.build_evaluator(cfg), batch_size=16)
    net.train(tr, batch_size=16, total_steps=500, optimizer=opt)
    trained = net.evaluate(va, recipes.build_evaluator(cfg),
                           batch_size=16)
    assert trained < base * 0.5, (base, trained)
    assert trained < 6.0, trained      # px — synthetic peaks are sharp


def test_tracking_export_roundtrip(tmp_path):
    """serving.export_tracking: the artifact reloads and reproduces
    the evaluator's peak decode on synthetic blobs."""
    import numpy as np

    from myconvnet_tpu import serving
    from myconvnet_tpu.subsets.tracking import synthetic_track_scenes
    cfg = dict(task="tracking", model="tinysiamfc",
               model_kwargs=dict(width=8, exemplar_hw=(32, 32)),
               input_hw=(64, 64), synthetic_n=16, max_offset=8,
               batch_size=8, num_classes=0, seed=0,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=dict(kind="constant", lr=0.01)),
               precision="f32")
    net, tr, _va = recipes.build_tracking(cfg, synthetic=True)
    net.train(tr, batch_size=8, total_steps=2,
              optimizer=recipes.make_optimizer(cfg["optimizer"]))
    path = str(tmp_path / "track.bin")
    sample = np.zeros((8, 64, 64, 6), np.float32)
    size = serving.export_tracking(
        net._transformed, net.state.params, net.state.model_state,
        sample, path, stride=4)
    assert size > 1000
    fn = serving.load_inference(path)
    blobs, _offs = synthetic_track_scenes(8, (64, 64), (32, 32),
                                          max_offset=8, seed=3)
    offsets, scores = (np.asarray(t)
                       for t in fn(blobs.astype(np.float32) / 255.0))
    assert offsets.shape == (8, 2) and scores.shape == (8,)
    # parity with the direct (unfolded) forward + evaluator decode
    resp = np.asarray(net.predict(blobs, batch_size=8))
    n, rh, rw = resp.shape
    flat = resp.reshape(n, -1).argmax(axis=1)
    iy, ix = np.divmod(flat, rw)
    px = (ix - (rw - 1) / 2.0) * 4
    py = (iy - (rh - 1) / 2.0) * 4
    np.testing.assert_allclose(offsets[:, 0], px, atol=4.01)
    np.testing.assert_allclose(offsets[:, 1], py, atol=4.01)
    assert np.all((scores > 0) & (scores < 1))
