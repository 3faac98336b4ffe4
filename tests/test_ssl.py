"""Self-supervised family tests (train/ssl.py, models/mae.py).

Covers the objective math (NT-Xent, masked MSE), the masking machinery
(static shapes, restore consistency), both fused steps (loss decreases),
the encoder-export -> ViT warm-start contract, and the kNN probe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myconvnet_tpu import recipes
from myconvnet_tpu.models.mae import (patchify, random_masking, tinymae,
                                      unpatchify)
from myconvnet_tpu.train import ssl as ssl_lib


def _simclr_cfg(**over):
    cfg = recipes.load_config("configs/cifar10_simclr.py")
    cfg.update(batch_size=8, total_steps=4,
               model_kwargs=dict(width=8), proj_dim=16)
    cfg.update(over)
    return cfg


def _mae_cfg(**over):
    cfg = recipes.load_config("configs/cifar10_mae.py")
    cfg.update(batch_size=8, total_steps=4)
    cfg.update(over)
    return cfg


# ------------------------------------------------------------- objectives

def test_nt_xent_matches_manual():
    rng = np.random.RandomState(0)
    z = rng.randn(6, 4).astype(np.float32)  # N = 3 pairs
    loss, acc = ssl_lib.nt_xent(jnp.asarray(z), temperature=0.5)
    # manual computation
    zn = z / np.linalg.norm(z, axis=1, keepdims=True)
    sim = zn @ zn.T / 0.5
    np.fill_diagonal(sim, -1e9)
    labels = np.array([3, 4, 5, 0, 1, 2])
    logp = sim - np.log(np.exp(sim).sum(1, keepdims=True))
    want = -np.mean(logp[np.arange(6), labels])
    assert np.isclose(float(loss), want, rtol=1e-5)
    want_acc = np.mean(sim.argmax(1) == labels)
    assert np.isclose(float(acc), want_acc)


def test_nt_xent_perfect_pairs_low_loss():
    # identical views -> positives are the only sim-1 entries
    base = np.eye(4, 8, dtype=np.float32)
    z = jnp.asarray(np.concatenate([base, base]))
    loss, acc = ssl_lib.nt_xent(z, temperature=0.1)
    assert float(acc) == 1.0
    assert float(loss) < 0.1


def test_masked_mse_only_masked_patches():
    pred = jnp.ones((2, 4, 3))
    target = jnp.zeros((2, 4, 3))
    mask = jnp.asarray([[1.0, 0, 0, 0], [1, 1, 0, 0]])
    # masked entries all have error 1.0; unmasked are ignored
    assert np.isclose(float(ssl_lib.masked_mse(pred, target, mask)), 1.0)
    # flip: error only on unmasked -> 0 contribution
    pred2 = jnp.where(mask[:, :, None] > 0, 0.0, 5.0)
    assert float(ssl_lib.masked_mse(pred2, target, mask)) == 0.0


# ---------------------------------------------------------------- masking

def test_random_masking_static_and_consistent():
    key = jax.random.key(0)
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    kept, mask, ids_restore = random_masking(key, x, 0.75)
    assert kept.shape == (2, 4, 4)          # 25% of 16, static
    assert mask.shape == (2, 16)
    assert np.allclose(np.asarray(mask).sum(1), 12)  # 12 masked each
    # every kept row must be an original row, and its mask entry 0
    xn, kn, mn = map(np.asarray, (x, kept, mask))
    for b in range(2):
        for row in kn[b]:
            idx = int(row[0] // 4) % 16
            assert np.allclose(row, xn[b, idx])
            assert mn[b, idx] == 0


def test_patchify_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    p = patchify(jnp.asarray(x), 4)
    assert p.shape == (2, 4, 48)
    back = unpatchify(p, 4, (8, 8))
    assert np.allclose(np.asarray(back), x, atol=1e-6)


def test_mae_features_only_shape():
    from myconvnet_tpu.core import transform
    model = transform(lambda x, train=False, features_only=False: tinymae(
        x, train=train, features_only=features_only))
    params, state = model.init(jax.random.key(0),
                               jnp.zeros((2, 8, 8, 3)), True)
    feats, _ = model.apply(params, state, None, jnp.zeros((2, 8, 8, 3)),
                           False, features_only=True)
    assert feats.shape == (2, 32)            # pooled encoder dim


# ------------------------------------------------------------- fused steps

def test_mae_step_loss_decreases():
    cfg = _mae_cfg()
    state, step, tr, _va, _feats, kind = recipes.build_ssl(
        cfg, synthetic=True)
    assert kind == "mae"
    x = np.asarray(tr.source.get_batch(np.arange(8))[0])
    losses = []
    for _ in range(8):
        state, m = step(state, jnp.asarray(x))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]            # overfits one fixed batch


def test_simclr_step_loss_decreases():
    cfg = _simclr_cfg()
    state, step, tr, _va, _feats, kind = recipes.build_ssl(
        cfg, synthetic=True)
    assert kind == "simclr"
    x = np.asarray(tr.source.get_batch(np.arange(8))[0])
    losses = []
    for _ in range(8):
        state, m = step(state, jnp.asarray(x))
        losses.append(float(m["loss"]))
        assert 0.0 <= float(m["contrast_acc"]) <= 1.0
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# --------------------------------------------------- export / warm start

def test_mae_encoder_warm_starts_tinyvit():
    import tempfile

    from myconvnet_tpu import models
    from myconvnet_tpu.models.base import ConvNet
    from myconvnet_tpu.models.pretrained import load_npz_weights

    cfg = _mae_cfg()
    state, step, tr, _va, _feats, _ = recipes.build_ssl(cfg,
                                                        synthetic=True)
    x = np.asarray(tr.source.get_batch(np.arange(8))[0])
    state, _ = step(state, jnp.asarray(x))   # move off init values
    with tempfile.TemporaryDirectory() as d:
        path = ssl_lib.export_encoder_npz(state.params, d + "/enc.npz")
        with np.load(path) as data:
            keys = sorted(data.files)
            flat = {k: data[k] for k in keys}
        assert not any(k.startswith("decoder") for k in keys)
        net = ConvNet(models.tinyvit, input_shape=(32, 32, 3),
                      num_classes=10)
        net.build()
        new_params = load_npz_weights(path, net.state.params)
        # EVERY exported array must land in the ViT tree (scope contract)
        for k in keys:
            scope, _, name = k.rpartition("::")
            assert scope in new_params and name in new_params[scope], k
            assert np.allclose(flat[k], new_params[scope][name])
        # the classifier head stays fresh (not in the npz)
        assert not any(k.startswith("head") for k in keys)


def test_simclr_export_excludes_projector_and_head():
    cfg = _simclr_cfg()
    state, _step, _tr, _va, _feats, _ = recipes.build_ssl(cfg,
                                                          synthetic=True)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = ssl_lib.export_encoder_npz(state.params, d + "/enc.npz")
        with np.load(path) as data:
            keys = data.files
        assert keys, "empty export"
        for bad in ("projector", "logits", "head"):
            assert not any(k.split("/", 1)[0].startswith(bad)
                           for k in keys), (bad, keys)


# ------------------------------------------------------------- kNN probe

def test_knn_classify_exact_neighbors():
    # bank of 3 one-hot clusters; queries equal to bank rows
    bank = np.repeat(np.eye(3, dtype=np.float32), 5, axis=0)
    bank += np.random.RandomState(0).randn(*bank.shape) * 0.01
    labels = np.repeat(np.arange(3), 5)
    pred = ssl_lib.knn_classify(jnp.asarray(bank), jnp.asarray(labels),
                                jnp.asarray(np.eye(3, dtype=np.float32)),
                                k=3, num_classes=3)
    assert np.array_equal(np.asarray(pred), [0, 1, 2])


def test_knn_eval_on_separable_synthetic():
    cfg = _simclr_cfg()
    state, _step, tr, va, feats_fn, _ = recipes.build_ssl(cfg,
                                                          synthetic=True)
    acc = ssl_lib.knn_eval(feats_fn, state, tr.eval_iter(8),
                           va.eval_iter(8), k=5, num_classes=10,
                           max_bank=64, max_query=32)
    assert 0.0 <= acc <= 1.0


# ------------------------------------------------------------ CLI (slow)

@pytest.mark.slow
def test_ssl_cli_roundtrip(tmp_path):
    import subprocess
    import sys

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}
    out = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/cifar10_mae.py", "--synthetic", "--steps", "3",
         "--batch", "8", "--val_every", "3", "--out", out],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "encoder exported" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/cifar10_mae.py", "--synthetic", "--batch", "8",
         "--ckpt", out],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "kNN top-1" in r2.stdout
