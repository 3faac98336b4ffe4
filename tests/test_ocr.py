"""OCR family tests (ops/ctc.py, ops/rnn.py, models/ocr.py,
subsets/ocr.py, eval/text.py, recipes.build_ocr)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.eval.text import (CharErrorRateEvaluator,
                                     SequenceAccuracyEvaluator,
                                     edit_distance)
from myconvnet_tpu.ops.ctc import (collapse, ctc_beam_decode,
                                   ctc_greedy_decode, ctc_loss)
from myconvnet_tpu.ops.rnn import bilstm, lstm
from myconvnet_tpu.subsets import ocr as ocr_mod


# ------------------------------------------------------------------ ctc

def _random_case(rng, n=3, t=12, c=7, l=5, empty_first=False,
                 short_inputs=False):
    logits = rng.randn(n, t, c).astype(np.float32) * 2
    lens = rng.randint(0, l + 1, n)
    if empty_first:
        lens[0] = 0
    labels = np.zeros((n, l), np.int64)
    for i, ln in enumerate(lens):
        labels[i, :ln] = rng.randint(1, c, ln)
    in_lens = (rng.randint(max(2 * l + 1, 6), t + 1, n)
               if short_inputs else np.full(n, t, np.int64))
    return logits, labels, lens, in_lens


def _torch_ctc(logits, labels, lens, in_lens):
    import torch
    lt = torch.tensor(logits, requires_grad=True)
    logp = torch.log_softmax(lt, -1).transpose(0, 1)
    tgt = torch.tensor(np.concatenate(
        [labels[i, :lens[i]] for i in range(len(lens))]))
    loss = torch.nn.functional.ctc_loss(
        logp, tgt, torch.tensor(in_lens), torch.tensor(lens),
        blank=0, reduction="mean")
    loss.backward()
    return float(loss.detach()), lt.grad.numpy()


@pytest.mark.parametrize("empty_first,short_inputs",
                         [(True, False), (False, False), (False, True)])
def test_ctc_loss_matches_torch(empty_first, short_inputs):
    """Values AND gradients vs torch.nn.functional.ctc_loss, covering
    empty targets, repeated symbols and truncated input lengths."""
    rng = np.random.RandomState(hash((empty_first, short_inputs)) % 997)
    logits, labels, lens, in_lens = _random_case(
        rng, empty_first=empty_first, short_inputs=short_inputs)
    tval, tgrad = _torch_ctc(logits, labels, lens, in_lens)

    def f(lg):
        return ctc_loss(jnp.asarray(lg), jnp.asarray(labels),
                        logit_lengths=jnp.asarray(in_lens),
                        reduction="mean_label")

    np.testing.assert_allclose(float(f(logits)), tval, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(logits)), tgrad,
                               atol=2e-4)


def test_ctc_loss_repeated_symbols_need_blank():
    """p('aa') must come only from paths with a blank between the two
    a's: with T=2 that is impossible, so NLL is ~the _NEG scale."""
    logits = jnp.zeros((1, 2, 3))  # uniform
    labels = jnp.asarray([[1, 1]])
    nll = ctc_loss(logits, labels, reduction="none")
    assert float(nll[0]) > 1e20  # impossible alignment
    # with T=3 the single path (a, blank, a) scores 3*log(1/3)
    nll3 = ctc_loss(jnp.zeros((1, 3, 3)), labels, reduction="none")
    np.testing.assert_allclose(float(nll3[0]), 3 * np.log(3.0),
                               rtol=1e-5)


def test_ctc_loss_reductions():
    rng = np.random.RandomState(3)
    logits, labels, lens, in_lens = _random_case(rng)
    nll = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none"))
    assert nll.shape == (3,)
    s = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                       reduction="sum"))
    m = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                       reduction="mean"))
    np.testing.assert_allclose(s, nll.sum(), rtol=1e-6)
    np.testing.assert_allclose(m, nll.mean(), rtol=1e-6)
    with pytest.raises(ValueError):
        ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                 reduction="bogus")


def test_ctc_decode_collapse():
    assert collapse([1, 1, 0, 2, 2, 3]) == [1, 2, 3]
    assert collapse([0, 0, 0]) == []
    assert collapse([1, 0, 1]) == [1, 1]  # blank separates repeats
    lg = np.full((1, 6, 4), -5.0, np.float32)
    for t, c in enumerate([1, 1, 0, 2, 2, 3]):
        lg[0, t, c] = 5.0
    assert ctc_greedy_decode(lg) == [[1, 2, 3]]
    assert ctc_beam_decode(lg, beam_width=4) == [[1, 2, 3]]


def test_ctc_beam_can_beat_greedy():
    """The classic case: the best PATH is blank but the best LABELING
    sums two symbol paths — beam search aggregates, greedy cannot."""
    # blank=0: per-frame p(blank)=0.6, p(a)=0.4
    p = np.log(np.asarray([[[0.6, 0.4], [0.6, 0.4]]], np.float32))
    # greedy best path = [blank, blank] -> ""; but p("a") =
    # p(a,b)+p(b,a)+p(a,a) = .4*.6+.6*.4+.4*.4 = 0.64 > p("") = 0.36
    assert ctc_greedy_decode(p) == [[]]
    assert ctc_beam_decode(p, beam_width=4) == [[1]]


# ------------------------------------------------------------------ rnn

def test_lstm_shapes_and_reverse_equivalence():
    """Running reversed input through a reverse LSTM must equal
    flipping the forward LSTM's output (same params)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 4).astype(np.float32)

    fwd = transform(lambda a: lstm(a, 8, name="cell"))
    rev = transform(lambda a: lstm(a, 8, reverse=True, name="cell"))
    key = jax.random.PRNGKey(0)
    params, state = fwd.init(key, jnp.asarray(x))
    y_fwd, _ = fwd.apply(params, state, None, jnp.asarray(x[:, ::-1]))
    y_rev, _ = rev.apply(params, state, None, jnp.asarray(x))
    assert y_rev.shape == (2, 9, 8)
    np.testing.assert_allclose(np.asarray(y_rev),
                               np.asarray(y_fwd)[:, ::-1], atol=1e-5)


def test_lstm_matches_torch():
    """One forward LSTM layer vs torch.nn.LSTM with copied weights."""
    import torch
    rng = np.random.RandomState(1)
    n, t, d, h = 2, 7, 3, 5
    x = rng.randn(n, t, d).astype(np.float32)

    f = transform(lambda a: lstm(a, h, name="cell"))
    params, state = f.init(jax.random.PRNGKey(0), jnp.asarray(x))
    (path,) = [k for k in params if "cell" in k]
    wx = np.asarray(params[path]["wx"])      # [D, 4H] (i, f, g, o)
    wh = np.asarray(params[path]["wh"])
    b = np.asarray(params[path]["b"])

    m = torch.nn.LSTM(d, h, batch_first=True)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.tensor(wx.T))
        m.weight_hh_l0.copy_(torch.tensor(wh.T))
        bias = torch.tensor(b)
        bias_f = bias.clone()
        bias_f[h:2 * h] += 1.0               # our unit forget bias
        m.bias_ih_l0.copy_(bias_f)
        m.bias_hh_l0.copy_(torch.zeros(4 * h))
        y_t, _ = m(torch.tensor(x))
    y_j, _ = f.apply(params, state, None, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=1e-5)


def test_bilstm_concat():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 5, 3),
                    jnp.float32)
    f = transform(lambda a: bilstm(a, 4))
    params, state = f.init(jax.random.PRNGKey(0), x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape == (1, 5, 8)


# ----------------------------------------------------------------- models

def test_tinyocr_shapes():
    x = jnp.zeros((2, 32, 64, 1))
    f = transform(lambda a: models.OCR_MODELS["tinyocr"](a, 8,
                                                         train=False))
    params, state = f.init(jax.random.PRNGKey(0), x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape == (2, 64 // 4 - 1, 9)   # T = W/4 - 1, C+1 logits
    assert y.dtype == jnp.float32


@pytest.mark.slow
def test_crnn_shapes_and_params():
    x = jnp.zeros((1, 32, 128, 1))
    f = transform(lambda a: models.OCR_MODELS["crnn"](a, 36,
                                                      train=False))
    params, state = f.init(jax.random.PRNGKey(0), x)
    y, _ = f.apply(params, state, None, x)
    assert y.shape == (1, 31, 37)
    n = sum(int(np.prod(p.shape)) for bucket in params.values()
            for p in bucket.values())
    assert 8.0e6 < n < 9.5e6  # paper-scale CRNN (~8.3M)


@pytest.mark.slow
def test_crnn_conv_shapes():
    x = jnp.zeros((1, 32, 128, 1))
    f = transform(lambda a: models.OCR_MODELS["crnn_conv"](a, 36,
                                                           train=True))
    params, state = f.init(jax.random.PRNGKey(0), x)
    y, _ = f.apply(params, state, jax.random.PRNGKey(1), x)
    assert y.shape == (1, 31, 37)


# ------------------------------------------------------------------ eval

def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1      # delete
    assert edit_distance([1, 2], [1, 2, 3]) == 1      # insert
    assert edit_distance([1, 2, 3], [1, 4, 3]) == 1   # substitute
    assert edit_distance("kitten", "sitting") == 3


def test_cer_evaluator():
    ev = CharErrorRateEvaluator()
    # logits that decode to [1,2] and [] respectively
    lg = np.full((2, 4, 3), -5.0, np.float32)
    for t, c in enumerate([1, 0, 2, 0]):
        lg[0, t, c] = 5.0
    lg[1, :, 0] = 5.0
    labels = np.asarray([[1, 2, 0], [3, 0, 0]])
    ev.update(lg, labels)
    # row 0 exact (0 edits / 2 chars); row 1 pred [] vs [3]: 1 edit
    assert ev.score() == pytest.approx(1 / 3)
    assert ev.sequence_accuracy == pytest.approx(0.5)
    sa = SequenceAccuracyEvaluator()
    sa.update(lg, labels)
    assert sa.score() == pytest.approx(0.5)
    assert sa.is_better(0.6, 0.5)
    assert not ev.is_better(0.6, 0.5)  # CER: lower is better


# ---------------------------------------------------------------- subsets

def test_encode_decode_roundtrip():
    cs = ocr_mod.DEFAULT_CHARSET
    enc = ocr_mod.encode_text("abc01", cs, 8)
    assert enc.shape == (8,) and enc[5] == 0
    assert ocr_mod.decode_ids(enc, cs) == "abc01"
    with pytest.raises(ValueError):
        ocr_mod.encode_text("ABC", cs, 8)      # out-of-charset
    with pytest.raises(ValueError):
        ocr_mod.encode_text("a" * 9, cs, 8)    # too long


def test_synthetic_text_images_deterministic():
    imgs, texts = ocr_mod.synthetic_text_images(8, hw=(32, 64),
                                                max_len=6, seed=3)
    imgs2, texts2 = ocr_mod.synthetic_text_images(8, hw=(32, 64),
                                                  max_len=6, seed=3)
    assert imgs.shape == (8, 32, 64, 1) and imgs.dtype == np.uint8
    assert texts == texts2
    np.testing.assert_array_equal(imgs, imgs2)
    # rendered text must actually mark the canvas
    assert all(im.std() > 5 for im in imgs[..., 0])


def test_labels_txt_layout_roundtrip(tmp_path):
    from PIL import Image
    root = tmp_path / "train"
    root.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i, text in enumerate(["abc", "0z9"]):
        arr = rng.randint(0, 255, (20, 50), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.png")
        rows.append(f"img{i}.png\t{text}")
    (root / "labels.txt").write_text("\n".join(rows) + "\n")
    src = ocr_mod.make_source(str(tmp_path), "train", hw=(32, 64),
                              max_len=8)
    assert len(src) == 2
    x, y = src.get_batch(np.asarray([0, 1]))
    assert x.shape == (2, 32, 64, 1) and x.dtype == np.uint8
    assert ocr_mod.decode_ids(y[0], ocr_mod.DEFAULT_CHARSET) == "abc"
    assert ocr_mod.decode_ids(y[1], ocr_mod.DEFAULT_CHARSET) == "0z9"


def test_labels_txt_missing_image_raises(tmp_path):
    root = tmp_path / "train"
    root.mkdir()
    (root / "labels.txt").write_text("ghost.png\tabc\n")
    with pytest.raises(FileNotFoundError):
        ocr_mod.read_subset(str(tmp_path), "train")


# ----------------------------------------------------------------- recipe

def _tiny_cfg(**over):
    cfg = dict(task="ocr", model="tinyocr", dataset="ocr",
               data_dir=None, charset="abcdefgh", input_hw=(32, 64),
               max_len=6, synthetic_n=64, batch_size=16,
               total_steps=8, val_every=0, log_every=100, seed=0,
               optimizer=dict(name="adam",
                              lr=dict(kind="constant", lr=2e-3)))
    cfg.update(over)
    return cfg


def test_build_ocr_smoke():
    cfg = _tiny_cfg()
    net, tr, va = recipes.build_ocr(cfg, synthetic=True)
    ev = recipes.build_evaluator(cfg)
    assert ev.name == "cer" and not ev.higher_is_better
    opt = recipes.make_optimizer(cfg["optimizer"])
    net.train(tr, None, batch_size=16, total_steps=4, optimizer=opt,
              evaluator=None, val_every=0)
    cer = net.evaluate(va, ev, batch_size=16)
    assert 0.0 <= cer <= 2.0


def test_build_ocr_num_classes_mismatch():
    with pytest.raises(ValueError):
        recipes.build_ocr(_tiny_cfg(num_classes=99), synthetic=True)


def test_registry_and_config():
    assert set(models.list_models("ocr")) == {"crnn", "crnn_conv",
                                              "tinyocr"}
    cfg = recipes.load_config("configs/mjsynth_crnn.py")
    assert cfg["task"] == "ocr" and cfg["model"] == "crnn"
    assert len(cfg["charset"]) == 36
    with pytest.raises(ValueError, match="unknown ocr model"):
        recipes.build_ocr(_tiny_cfg(model="nope"), synthetic=True)
    with pytest.raises(ValueError, match="unknown ocr_metric"):
        recipes.build_evaluator(_tiny_cfg(ocr_metric="bogus"))


@pytest.mark.slow
def test_cli_roundtrip(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    common = ["--set", "model=tinyocr", "--set", "charset='abcdefgh'",
              "--set", "input_hw=(32, 64)", "--set", "max_len=6",
              "--set", "synthetic_n=32", "--set", "val_every=0",
              "--set", "precision=f32"]
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/mjsynth_crnn.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "log_every=1"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cer" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/mjsynth_crnn.py", "--ckpt", str(out),
         "--synthetic", "--platform", "cpu", "--batch", "4"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "cer" in r2.stdout


@pytest.mark.slow
def test_ocr_learns_synthetic():
    """tinyocr on a 48-string synthetic corpus: loss falls and train
    CER beats the untrained baseline by a wide margin."""
    cfg = _tiny_cfg(synthetic_n=48, total_steps=120,
                    optimizer=dict(name="adam",
                                   lr=dict(kind="constant", lr=3e-3)))
    net, tr, va = recipes.build_ocr(cfg, synthetic=True)
    ev = recipes.build_evaluator(cfg)
    opt = recipes.make_optimizer(cfg["optimizer"])
    before = net.evaluate(tr, ev, batch_size=16)
    net.train(tr, None, batch_size=16, total_steps=120, optimizer=opt,
              evaluator=None, val_every=0)
    after = net.evaluate(tr, ev, batch_size=16)
    assert after < before * 0.55, (before, after)


def test_decode_ids_rejects_oversized_symbol_ids():
    """A served artifact trained with a larger charset than the route's
    must produce a clear error, not a bare IndexError 500
    (serving_http text routes / serve.py --text)."""
    assert ocr_mod.decode_ids([1, 2, 0], "ab") == "ab"
    with pytest.raises(ValueError, match="exceeds"):
        ocr_mod.decode_ids([1, 40, 2], ocr_mod.DEFAULT_CHARSET[:36])


def test_text_route_image_codec_uses_line_fit_geometry():
    """HTTP text routes must preprocess posted line images with the
    TRAINING loader's geometry (scale-to-height + right-pad/center-
    crop, subsets.ocr._fit_line), not an aspect-warping resize: a
    narrow line must come out right-padded with the border value, with
    the glyph region unsquashed."""
    import io

    from PIL import Image

    from myconvnet_tpu.serving_http import ModelServer, Route

    h, w = 16, 64
    route = Route(name="t", kind="text", fn=None,
                  input_shape=(1, h, w, 1))
    srv = ModelServer.__new__(ModelServer)
    # a 16x16 black square: aspect-preserving fit keeps it 16 wide and
    # pads the remaining 48 columns with the border value (black)
    img = Image.fromarray(np.zeros((16, 16), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    x = srv._decode_body(route, buf.getvalue(), "image/png")
    assert x.shape == (1, h, w, 1)
    expect = ocr_mod._fit_line(np.zeros((16, 16), np.uint8),
                               (h, w)).astype(np.float32) / 255.0
    np.testing.assert_allclose(x[0, :, :, 0], expect)
