"""FixMatch semi-supervised family tests (train/semisup.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import recipes
from myconvnet_tpu.train import semisup as semi


def _tiny_cfg(**over):
    cfg = dict(task="semisup", model="smallnet", model_kwargs={},
               dataset="cifar10", data_dir=None, num_classes=10,
               labeled_per_class=4, mu=2, threshold=0.95, lambda_u=1.0,
               ema_decay=0.99, batch_size=8, total_steps=3,
               log_every=1, val_every=0,
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=0.05),
               augment=dict(out_hw=(32, 32), area_range=None, pad=4,
                            flip=True,
                            mean=(0.4914, 0.4822, 0.4465),
                            std=(0.2470, 0.2435, 0.2616)),
               augment_strong=dict(randaugment=(2, 10)),
               precision="f32", seed=0)
    cfg.update(over)
    return cfg


def test_labeled_subset_protocol():
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (200, 4, 4, 3), np.uint8)
    labels = np.repeat(np.arange(10), 20)
    x, y = semi.labeled_subset(images, labels, per_class=5,
                               num_classes=10, seed=3)
    assert x.shape == (50, 4, 4, 3)
    counts = np.bincount(y, minlength=10)
    assert np.all(counts == 5)
    # deterministic draw
    x2, y2 = semi.labeled_subset(images, labels, per_class=5,
                                 num_classes=10, seed=3)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_build_and_step_learns():
    cfg = _tiny_cfg()
    state, step, data_iter, val_set, eval_fn = recipes.build_semisup(
        cfg, synthetic=True)
    batch = next(data_iter())
    x_l, y_l, x_u = batch
    assert x_l.shape[0] == 8 and x_u.shape[0] == 16  # mu=2
    first = None
    for _ in range(8):
        state, m = step(state, (jnp.asarray(x_l), jnp.asarray(y_l),
                                jnp.asarray(x_u)))
        if first is None:
            first = float(m["sup_loss"])
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["mask_rate"]) <= 1.0
    assert float(m["sup_loss"]) < first  # memorizes the labeled batch
    acc = eval_fn(state, val_set.eval_iter(8))
    assert 0.0 <= acc <= 1.0


def test_unsup_loss_gated_by_threshold():
    """threshold > 1 means nothing can pass -> unsup term exactly 0."""
    cfg = _tiny_cfg(threshold=1.01)
    state, step, data_iter, _val, _ev = recipes.build_semisup(
        cfg, synthetic=True)
    x_l, y_l, x_u = next(data_iter())
    state, m = step(state, (jnp.asarray(x_l), jnp.asarray(y_l),
                            jnp.asarray(x_u)))
    assert float(m["unsup_loss"]) == 0.0
    assert float(m["mask_rate"]) == 0.0


def test_ema_tracks_not_aliases():
    cfg = _tiny_cfg()
    state, step, data_iter, _val, _ev = recipes.build_semisup(
        cfg, synthetic=True)
    x_l, y_l, x_u = next(data_iter())
    for _ in range(2):
        state, _ = step(state, (jnp.asarray(x_l), jnp.asarray(y_l),
                                jnp.asarray(x_u)))
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_checkpoint_resume_exact(tmp_path):
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    cfg = _tiny_cfg()
    state, step, data_iter, _val, _ev = recipes.build_semisup(
        cfg, synthetic=True)
    b = tuple(jnp.asarray(a) for a in next(data_iter()))
    state, _ = step(state, b)
    ckpt_lib.save_checkpoint(str(tmp_path), 1, state._asdict(), keep=1)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path),
                                           state._asdict())
    rstate = type(state)(**restored)
    _s1, m1 = step(state, b)
    _s2, m2 = step(rstate, b)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_cli_roundtrip(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "train.py", "--config",
         "configs/cifar10_fixmatch.py", "--synthetic", "--steps", "2",
         "--batch", "4", "--out", str(out), "--platform", "cpu",
         "--set", "model=smallnet", "--set", "model_kwargs={}",
         "--set", "mu=2", "--set", "labeled_per_class=2",
         "--set", "log_every=1", "--set", "val_every=2",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val_acc" in r.stdout
    # test.py scores the checkpoint (EMA accuracy path)
    r2 = subprocess.run(
        [sys.executable, "test.py", "--config",
         "configs/cifar10_fixmatch.py", "--ckpt", str(out),
         "--synthetic", "--platform", "cpu", "--batch", "4",
         "--set", "model=smallnet", "--set", "model_kwargs={}",
         "--set", "mu=2", "--set", "labeled_per_class=2",
         "--set", "precision=f32"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "val accuracy (EMA)" in r2.stdout
