"""Audio family tests (ops/audio.py, models/audio.py,
subsets/audio.py, recipes.build_audio)."""

import os
import wave

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import models, recipes
from myconvnet_tpu.core import transform
from myconvnet_tpu.ops.audio import (avg_pool1d, conv1d, dft_conv_basis,
                                     global_avg_pool1d, hann_window,
                                     hz_to_mel, log_mel_spectrogram,
                                     max_pool1d, mel_filterbank,
                                     mel_to_hz, stft_power)
from myconvnet_tpu.subsets import audio as audio_mod


# ------------------------------------------------------------------ ops

def test_conv1d_matches_manual_valid():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 3).astype(np.float32)
    w = rng.randn(4, 3, 5).astype(np.float32)
    y = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w),
                          padding="VALID", precision="highest"))
    assert y.shape == (2, 8, 5)
    for (n, t, o) in [(0, 0, 0), (1, 3, 4), (0, 7, 2)]:
        ref = np.sum(x[n, t:t + 4, :] * w[:, :, o])
        np.testing.assert_allclose(y[n, t, o], ref, rtol=1e-5)


def test_conv1d_stride_and_same_padding():
    x = jnp.ones((1, 16, 1))
    w = jnp.ones((3, 1, 1))
    assert conv1d(x, w, stride=2, padding="SAME").shape == (1, 8, 1)
    assert conv1d(x, w, stride=1, padding="SAME").shape == (1, 16, 1)


def test_pool1d():
    x = jnp.asarray(np.arange(8, dtype=np.float32)[None, :, None])
    mp = np.asarray(max_pool1d(x, window=4))
    np.testing.assert_allclose(mp[0, :, 0], [3.0, 7.0])
    ap = np.asarray(avg_pool1d(x, window=4))
    np.testing.assert_allclose(ap[0, :, 0], [1.5, 5.5])
    ga = np.asarray(global_avg_pool1d(x))
    np.testing.assert_allclose(ga[0, 0], 3.5)


def test_stft_power_matches_numpy_rfft():
    """The conv-form STFT == framed, Hann-windowed np.fft.rfft power."""
    rng = np.random.RandomState(1)
    n_fft, hop, t = 64, 16, 200
    x = rng.randn(3, t).astype(np.float32)
    got = np.asarray(stft_power(jnp.asarray(x)[..., None], n_fft=n_fft,
                                hop=hop, precision="highest"))
    frames = (t - n_fft) // hop + 1
    assert got.shape == (3, frames, n_fft // 2 + 1)
    win = hann_window(n_fft).astype(np.float64)
    for n in range(3):
        for f in range(frames):
            seg = x[n, f * hop:f * hop + n_fft].astype(np.float64)
            ref = np.abs(np.fft.rfft(seg * win)) ** 2
            np.testing.assert_allclose(got[n, f], ref, rtol=2e-4,
                                       atol=1e-4)


def test_dft_basis_shape_and_dc_bin():
    basis = dft_conv_basis(32)
    assert basis.shape == (32, 1, 2 * 17)
    # DC bin: Re = sum of window, Im = 0
    np.testing.assert_allclose(basis[:, 0, 0], hann_window(32), rtol=1e-6)
    np.testing.assert_allclose(basis[:, 0, 1], 0.0, atol=1e-7)


def test_mel_scale_roundtrip():
    f = np.asarray([0.0, 440.0, 4000.0, 7999.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)


def test_mel_filterbank_properties():
    sr, n_fft, n_mels = 16000, 400, 40
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr)
    assert fb.shape == (201, 40)
    assert fb.min() >= 0.0 and fb.max() <= 1.0 + 1e-6
    # every filter has support, peaks once, and centers ascend
    assert (fb.sum(axis=0) > 0).all()
    centers = fb.argmax(axis=0)
    assert (np.diff(centers) > 0).all()
    # a pure tone's energy lands in the filter whose center is nearest
    tone_hz = 1000.0
    sr_bins = np.arange(201) * sr / n_fft
    tone_bin = int(np.argmin(np.abs(sr_bins - tone_hz)))
    assert fb[tone_bin].argmax() == np.argmin(
        np.abs(mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2),
                                     n_mels + 2))[1:-1] - tone_hz))


def test_mel_filterbank_validates():
    with pytest.raises(ValueError, match="nyquist"):
        mel_filterbank(201, 40, 16000, fmin=9000.0)


def test_log_mel_shape_and_tone_selectivity():
    """A pure tone must light up the mel band containing it."""
    sr, n_fft, hop, n_mels = 16000, 400, 160, 64
    t = np.arange(sr, dtype=np.float32) / sr
    for tone, other in ((500.0, 6000.0), (6000.0, 500.0)):
        x = np.sin(2 * np.pi * tone * t)[None, :, None]
        lm = np.asarray(log_mel_spectrogram(
            jnp.asarray(x), sample_rate=sr, n_fft=n_fft, hop=hop,
            n_mels=n_mels, precision="highest"))
        assert lm.shape == (1, (sr - n_fft) // hop + 1, n_mels, 1)
        mean_db = lm[0, :, :, 0].mean(axis=0)
        edges = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2),
                                      n_mels + 2))[1:-1]
        band = int(np.argmin(np.abs(edges - tone)))
        far = int(np.argmin(np.abs(edges - other)))
        assert mean_db[band] > mean_db[far] + 3.0


# --------------------------------------------------------------- models

def test_audio_models_shapes_and_params():
    """m5/m11 match Dai et al. param counts (at paper widths)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4000, 1).astype(np.float32))
    for name, expect_m in (("m5", 0.56), ("m11", 1.79)):
        fn = models.AUDIO_MODELS[name]
        t = transform(lambda x, train=False: fn(x, 35, train=train))
        params, state = t.init(jax.random.PRNGKey(0), x)
        logits, _ = t.apply(params, state, None, x, False)
        assert logits.shape == (2, 35)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
        assert abs(n / 1e6 - expect_m) < 0.12, (name, n)


def test_tinyaudio_forward():
    x = jnp.zeros((2, 1024, 1), jnp.float32)
    t = transform(lambda x, train=False: models.tinyaudio(
        x, 4, train=train))
    params, state = t.init(jax.random.PRNGKey(0), x)
    logits, _ = t.apply(params, state, None, x, False)
    assert logits.shape == (2, 4)


def test_melspec_cnn_forward():
    """On-device log-mel frontend feeding a 2-D zoo backbone."""
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 2048, 1).astype(np.float32))
    t = transform(lambda x, train=False: models.melspec_cnn(
        x, 6, train=train, backbone="smallnet", sample_rate=4000,
        n_fft=256, hop=128, n_mels=32,
        backbone_kwargs=dict(width=8)))
    params, state = t.init(jax.random.PRNGKey(0), x)
    logits, _ = t.apply(params, state, None, x, False)
    assert logits.shape == (2, 6)
    # the frontend is parameter-free: every param lives in backbone/
    for path in jax.tree_util.tree_leaves_with_path(params):
        assert "backbone" in jax.tree_util.keystr(path[0])


def test_melspec_cnn_rejects_unknown_backbone():
    x = jnp.zeros((1, 2048, 1), jnp.float32)
    t = transform(lambda x: models.melspec_cnn(x, 4, backbone="nope"))
    with pytest.raises(ValueError, match="backbone"):
        t.init(jax.random.PRNGKey(0), x)


# -------------------------------------------------------------- subsets

def _write_wav(path, data_i16, sr=16000, nch=1):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.asarray(data_i16, "<i2").tobytes())


def test_load_wav_pad_crop_and_mixdown(tmp_path):
    short = (np.arange(100) - 50).astype(np.int16)
    _write_wav(tmp_path / "short.wav", short)
    out = audio_mod.load_wav(str(tmp_path / "short.wav"), 160)
    np.testing.assert_array_equal(out[:100], short)
    assert (out[100:] == 0).all()
    long = np.arange(300, dtype=np.int16)
    _write_wav(tmp_path / "long.wav", long)
    out = audio_mod.load_wav(str(tmp_path / "long.wav"), 100)
    np.testing.assert_array_equal(out, long[100:200])  # center crop
    st = np.stack([np.full(50, 100, np.int16),
                   np.full(50, 200, np.int16)], axis=1)
    _write_wav(tmp_path / "stereo.wav", st.reshape(-1), nch=2)
    out = audio_mod.load_wav(str(tmp_path / "stereo.wav"), 50)
    assert (out == 150).all()  # mixdown


def test_read_subset_split_dirs(tmp_path):
    for split in ("train", "val"):
        for cls in ("no", "yes"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(2):
                _write_wav(d / f"{i}.wav",
                           np.zeros(20, np.int16))
    paths, labels, classes = audio_mod.read_subset(str(tmp_path), "train")
    assert classes == ["no", "yes"] and len(paths) == 4
    np.testing.assert_array_equal(np.sort(labels), [0, 0, 1, 1])
    src = audio_mod.WavSource(paths, labels, num_samples=32)
    wavs, y = src.get_batch(np.array([0, 2]))
    assert wavs.shape == (2, 32, 1) and wavs.dtype == np.int16
    np.testing.assert_array_equal(y, labels[[0, 2]])


def test_read_subset_speech_commands_layout(tmp_path):
    """Flat class dirs + validation/testing list files; train is the
    complement and _background_noise_ is skipped."""
    for cls in ("go", "stop", "_background_noise_"):
        (tmp_path / cls).mkdir()
    for cls in ("go", "stop"):
        for i in range(3):
            _write_wav(tmp_path / cls / f"{i}.wav",
                       np.zeros(20, np.int16))
    (tmp_path / "validation_list.txt").write_text("go/0.wav\n")
    (tmp_path / "testing_list.txt").write_text("stop/1.wav\n\n")
    tr = audio_mod.read_subset(str(tmp_path), "train")
    va = audio_mod.read_subset(str(tmp_path), "val")
    te = audio_mod.read_subset(str(tmp_path), "test")
    assert tr[2] == ["go", "stop"]
    rel = lambda sub: {os.path.relpath(p, tmp_path) for p in sub[0]}
    assert rel(va) == {"go/0.wav"}
    assert rel(te) == {"stop/1.wav"}
    assert rel(tr) == {"go/1.wav", "go/2.wav", "stop/0.wav",
                       "stop/2.wav"}


def test_synthetic_waveforms_are_band_labeled():
    """Per-class mean spectra must peak in distinct, ascending bands."""
    x, y = audio_mod.synthetic_waveforms(64, num_samples=2048,
                                         sample_rate=4000, n_classes=4)
    assert x.shape == (64, 2048, 1) and x.dtype == np.int16
    peaks = []
    for c in range(4):
        spec = np.abs(np.fft.rfft(
            x[y == c, :, 0].astype(np.float64), axis=1)).mean(axis=0)
        spec[0] = 0.0
        peaks.append(spec.argmax())
    assert all(a < b for a, b in zip(peaks, peaks[1:])), peaks


# --------------------------------------------------------------- recipe

def _tiny_cfg(**over):
    cfg = dict(task="audio", model="tinyaudio", model_kwargs={},
               dataset="audio", data_dir=None, num_classes=4,
               num_samples=2048, sample_rate=4000,
               aug_gain=0.1, aug_shift=128, aug_noise=0.003,
               batch_size=16, total_steps=3, val_every=0, log_every=1,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=0.1),
               precision="f32", seed=0)
    cfg.update(over)
    return cfg


def test_audio_recipe_learns_frequency_bands():
    """Functional test: band labels are unsolvable from time-domain
    amplitude stats (random gain/phase/noise), so val generalization
    proves the 1-D conv path resolves spectral content."""
    cfg = _tiny_cfg(total_steps=200, synthetic_n=512,
                    optimizer=dict(name="momentum", momentum_coef=0.9,
                                   lr=0.05))
    net, train_set, val_set = recipes.build_audio(cfg, synthetic=True)
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    ev = AccuracyEvaluator()
    opt = recipes.make_optimizer(cfg["optimizer"])
    net.train(train_set, val_set, batch_size=16, total_steps=200,
              optimizer=opt, evaluator=ev, val_every=0)
    acc = net.evaluate(val_set, ev, batch_size=16)
    assert acc > 0.6, f"spectral learning failed: acc={acc}"


def test_audio_augment_is_gain_shift_noise():
    """Train augmentation preserves labels and only rescales/rolls/
    perturbs; eval/predict paths are the pure int16->float norm."""
    cfg = _tiny_cfg(aug_noise=0.0)
    net, _tr, _va = recipes.build_audio(cfg, synthetic=True)
    train_fn, eval_fn, predict_fn = net.augment_fns
    x = np.zeros((8, 2048, 1), np.int16)
    x[:, 512, 0] = 16384  # single spike: roll/gain visible
    y = np.arange(8, dtype=np.int32) % 4
    xo, yo = jax.jit(train_fn)(jax.random.PRNGKey(3), x, y)
    xo, yo = np.asarray(xo), np.asarray(yo)
    np.testing.assert_array_equal(yo, y)
    # exactly one nonzero sample per clip, amplitude within gain range
    nz = (np.abs(xo[:, :, 0]) > 1e-6).sum(axis=1)
    np.testing.assert_array_equal(nz, 1)
    amp = np.abs(xo).max(axis=(1, 2))
    base = 16384 / 32768.0
    assert (amp >= base * 0.9 - 1e-6).all()
    assert (amp <= base * 1.1 + 1e-6).all()
    # shift stays within the configured window
    pos = np.abs(xo[:, :, 0]).argmax(axis=1)
    assert (np.abs(pos - 512) <= cfg["aug_shift"]).all()
    xe, ye = jax.jit(eval_fn)(x, y)
    np.testing.assert_allclose(np.asarray(xe),
                               x.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(np.asarray(jax.jit(predict_fn)(x)),
                               x.astype(np.float32) / 32768.0)


def test_audio_ckpt_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    net, train_set, val_set = recipes.build_audio(
        cfg, synthetic=True, ckpt_dir=str(tmp_path))
    opt = recipes.make_optimizer(cfg["optimizer"])
    from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
    net.train(train_set, val_set, batch_size=8, total_steps=2,
              optimizer=opt, evaluator=AccuracyEvaluator(), val_every=0)
    net.save()
    net2, _tr, _va = recipes.build_audio(cfg, synthetic=True,
                                         ckpt_dir=str(tmp_path))
    net2.build(opt)
    net2.restore(str(tmp_path))
    assert int(net2.state.step) == 2
    x, _ = val_set.source.get_batch(np.arange(4))
    np.testing.assert_allclose(np.asarray(net.predict(x)),
                               np.asarray(net2.predict(x)), atol=1e-5)


def test_registry_and_config():
    assert set(models.list_models("audio")) == {"m5", "m11",
                                                "melspec_cnn",
                                                "tinyaudio"}
    cfg = recipes.load_config("configs/speechcommands_m5.py")
    assert cfg["task"] == "audio" and cfg["model"] == "m5"
    with pytest.raises(ValueError, match="unknown audio model"):
        recipes.build_audio(_tiny_cfg(model="nope"), synthetic=True)


@pytest.mark.slow
def test_cli_roundtrip(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    common = ["--set", "model=tinyaudio", "--set", "num_classes=4",
              "--set", "num_samples=2048", "--set", "sample_rate=4000",
              "--set", "aug_shift=128", "--set", "val_every=0",
              "--set", "precision=f32"]
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/speechcommands_m5.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "log_every=1"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/speechcommands_m5.py", "--ckpt", str(out),
         "--synthetic", "--platform", "cpu", "--batch", "4"] + common,
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "accuracy" in r2.stdout


# ------------------------------------------------- review-finding fixes

def test_load_wav_rejects_wrong_sample_rate(tmp_path):
    _write_wav(tmp_path / "a.wav", np.zeros(20, np.int16), sr=8000)
    with pytest.raises(ValueError, match="sample rate 8000"):
        audio_mod.load_wav(str(tmp_path / "a.wav"), 32, 16000)
    # matching rate (or unchecked) passes
    out = audio_mod.load_wav(str(tmp_path / "a.wav"), 32, 8000)
    assert out.shape == (32,)
    audio_mod.load_wav(str(tmp_path / "a.wav"), 32)


def test_speech_commands_split_validation(tmp_path):
    (tmp_path / "go").mkdir()
    _write_wav(tmp_path / "go" / "0.wav", np.zeros(8, np.int16))
    (tmp_path / "validation_list.txt").write_text("go/0.wav\n")
    with pytest.raises(ValueError, match="unknown split"):
        audio_mod.read_subset(str(tmp_path), "bogus")
    with pytest.raises(FileNotFoundError, match="testing_list"):
        audio_mod.read_subset(str(tmp_path), "test")


def test_build_audio_melspec_inherits_corpus_rate():
    """cfg sample_rate must reach melspec_cnn's filterbank default."""
    cfg = _tiny_cfg(model="melspec_cnn",
                    model_kwargs=dict(backbone="smallnet", n_fft=256,
                                      hop=128, n_mels=32,
                                      backbone_kwargs=dict(width=8)))
    net, _tr, _va = recipes.build_audio(cfg, synthetic=True)
    assert net.model_kwargs["sample_rate"] == cfg["sample_rate"]
    # explicit model_kwargs rate wins over the corpus rate
    cfg2 = _tiny_cfg(model="melspec_cnn",
                     model_kwargs=dict(backbone="smallnet",
                                       sample_rate=8000))
    net2, _tr, _va = recipes.build_audio(cfg2, synthetic=True)
    assert net2.model_kwargs["sample_rate"] == 8000


def test_build_audio_validates_num_classes(tmp_path):
    """A real corpus whose discovered class count disagrees with cfg
    num_classes must fail at build time, not train silently with
    out-of-range labels."""
    for split in ("train", "val"):
        for cls in ("a", "b", "c"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            _write_wav(d / "0.wav", np.zeros(8, np.int16), sr=4000)
    cfg = _tiny_cfg(num_classes=4, data_dir=str(tmp_path))
    with pytest.raises(ValueError, match="num_classes"):
        recipes.build_audio(cfg)


def test_bf16_policy_keeps_waveform_f32_until_frontend():
    """Under precision=bf16 the audio recipes skip the global input
    cast (cast_input=False): a bf16 waveform has only an 8-bit
    mantissa (~48 dB SNR), which would destroy quiet spectral content
    before the f32 STFT.  The model's first op must see f32."""
    cfg = _tiny_cfg(precision="bf16")
    net, _tr, _va = recipes.build_audio(cfg, synthetic=True)
    assert net.cast_input is False
    seen = {}
    orig = models.tinyaudio

    def spy(x, *a, **k):
        seen["dtype"] = x.dtype
        return orig(x, *a, **k)

    net._model_fn = spy
    net.build()
    assert seen["dtype"] == jnp.float32
    # and a quiet tone MASKED BY a loud one survives: bf16's 8-bit
    # mantissa sets an absolute quantization floor ~loud*2^-9, burying
    # content ~-80 dB below the loud tone that f32 resolves cleanly
    sr = 4000
    t = np.arange(2048, dtype=np.float32) / sr
    x = (0.5 * np.sin(2 * np.pi * 300.0 * t)
         + 5e-5 * np.sin(2 * np.pi * 1500.0 * t))[None, :, None]
    lm_f32 = np.asarray(log_mel_spectrogram(
        jnp.asarray(x), sample_rate=sr, n_fft=256, hop=128, n_mels=32,
        precision="highest"))
    lm_bf16 = np.asarray(log_mel_spectrogram(
        jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32),
        sample_rate=sr, n_fft=256, hop=128, n_mels=32,
        precision="highest"))
    edges = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2),
                                  34))[1:-1]
    quiet = int(np.argmin(np.abs(edges - 1500.0)))
    # f32 resolves the -80 dB tone well above the eps floor; the bf16
    # pre-cast quantizes it away (the band collapses toward log(eps))
    assert (lm_f32[0, :, quiet, 0].mean()
            > lm_bf16[0, :, quiet, 0].mean() + 2.0), (
        lm_f32[0, :, quiet, 0].mean(), lm_bf16[0, :, quiet, 0].mean())
