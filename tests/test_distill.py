"""Knowledge distillation (train/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.train import optim
from myconvnet_tpu.train.distill import (DistillState, distillation_loss,
                                         make_distill_step)
from myconvnet_tpu.train.trainer import init_train_state


def test_distillation_loss_limits():
    """alpha=0 reduces to plain CE; identical logits zero the KL term."""
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(8, 5).astype(np.float32))
    t = jnp.asarray(rng.randn(8, 5).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, 8))
    hard_only = distillation_loss(s, t, y, alpha=0.0)
    np.testing.assert_allclose(float(hard_only),
                               float(softmax_cross_entropy(s, y)),
                               rtol=1e-6)
    self_kd = distillation_loss(s, s, y, alpha=1.0)
    np.testing.assert_allclose(float(self_kd), 0.0, atol=1e-5)


def test_distillation_loss_temperature_scaling():
    """With the T^2 factor, the soft-loss gradient scale stays O(1)
    across temperatures (Hinton): grads at T=1 and T=8 are same order."""
    rng = np.random.RandomState(1)
    s = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 6, 4))
    g1 = jax.grad(lambda s: distillation_loss(
        s, t, y, temperature=1.0, alpha=1.0))(s)
    g8 = jax.grad(lambda s: distillation_loss(
        s, t, y, temperature=8.0, alpha=1.0))(s)
    r = float(jnp.linalg.norm(g8) / jnp.linalg.norm(g1))
    assert 0.05 < r < 20.0, r


def test_distill_step_student_learns_teacher():
    """Student distilling from a fixed random teacher: agreement with the
    teacher's argmax rises over steps; teacher params never change."""
    teacher = transform(lambda x, train=False: models.smallnet(
        x, 4, train=train, width=8, dropout_rate=0.0))
    student = transform(lambda x, train=False: models.smallnet(
        x, 4, train=train, width=4, dropout_rate=0.0))
    x0 = jnp.zeros((16, 16, 16, 3))
    t_params, t_state = teacher.init(jax.random.key(0), x0, False)
    opt = optim.momentum(0.2, 0.9)
    s_train = init_train_state(student, opt, jax.random.key(1), x0)
    state = DistillState(s_train, t_params, t_state)
    step = make_distill_step(student, teacher, opt, temperature=2.0,
                             alpha=1.0)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(16, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, 16))
    t_before = jax.device_get(t_params)
    first = None
    for i in range(40):
        state, m = step(state, (x, y))
        if first is None:
            first = float(m["teacher_agreement"])
    last = float(m["teacher_agreement"])
    assert last >= first, (first, last)
    assert last >= 0.8, last  # memorizes the teacher on one batch
    for scope in t_before:
        for name in t_before[scope]:
            np.testing.assert_array_equal(
                np.asarray(state.teacher_params[scope][name]),
                t_before[scope][name])
    assert int(state.student.step) == 40


# ------------------------------------------------- recipe/CLI surface

def _tiny_distill_cfg(tmp_path, **over):
    cfg = dict(
        task="distill", model="smallnet",
        model_kwargs=dict(width=8, dropout_rate=0.0),
        distill=dict(teacher="smallnet",
                     teacher_kwargs=dict(width=16, dropout_rate=0.0),
                     allow_random=True, temperature=2.0, alpha=0.9),
        dataset="cifar10", data_dir=None, num_classes=10,
        input_hw=(32, 32), batch_size=8, total_steps=4,
        synthetic_n=32,
        optimizer=dict(name="momentum", momentum_coef=0.9,
                       lr=dict(kind="constant", lr=0.05)),
        augment=dict(out_hw=(32, 32), area_range=None, pad=0,
                     flip=False, brightness=0.0, contrast=0.0,
                     saturation=0.0),
        precision="f32", seed=0)
    cfg.update(over)
    return cfg


def test_build_distill_smoke(tmp_path):
    """The recipe surface: random-teacher smoke run steps and evals."""
    from myconvnet_tpu import recipes
    cfg = _tiny_distill_cfg(tmp_path)
    state, step, data_iter_fn, val_set, eval_fn = recipes.build_distill(
        cfg, synthetic=True)
    it = data_iter_fn()
    for i, batch in enumerate(it):
        if i >= 3:
            break
        state, metrics = step(state, batch)
    it.close()
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["teacher_agreement"]) <= 1.0
    acc = eval_fn(state, val_set.eval_iter(8))
    assert 0.0 <= acc <= 1.0
    assert int(state.student.step) == 3


def test_build_distill_requires_teacher_weights():
    from myconvnet_tpu import recipes
    cfg = _tiny_distill_cfg(None)
    cfg["distill"] = dict(teacher="smallnet",
                          teacher_kwargs=dict(width=16, dropout_rate=0.0))
    import pytest
    with pytest.raises(ValueError, match="random teacher"):
        recipes.build_distill(cfg, synthetic=True)


def test_distill_from_trained_teacher_ckpt(tmp_path):
    """The real workflow: train a teacher classifier, checkpoint it,
    then distill a student FROM THE CHECKPOINT — the student must track
    the teacher far better than chance (agreement metric) and the
    loaded-teacher logits must differ from a random teacher's."""
    from myconvnet_tpu import recipes
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib

    # 1) a teacher that has actually learned the synthetic corpus
    tcfg = dict(task="classification", model="smallnet",
                model_kwargs=dict(width=16, dropout_rate=0.0),
                dataset="cifar10", data_dir=None, num_classes=10,
                input_hw=(32, 32), batch_size=16, total_steps=60,
                synthetic_n=32,
                optimizer=dict(name="momentum", momentum_coef=0.9,
                               lr=dict(kind="constant", lr=0.05)),
                augment=dict(out_hw=(32, 32), area_range=None, pad=0,
                             flip=False, brightness=0.0, contrast=0.0,
                             saturation=0.0),
                precision="f32", seed=0)
    net, tr, va = recipes.build_classifier(tcfg, synthetic=True,
                                           ckpt_dir=str(tmp_path))
    opt = recipes.make_optimizer(tcfg["optimizer"])
    net.train(tr, batch_size=16, total_steps=60, optimizer=opt)
    net.save(str(tmp_path))

    # 2) distill from that checkpoint
    cfg = _tiny_distill_cfg(tmp_path)
    cfg["distill"] = dict(teacher="smallnet",
                          teacher_kwargs=dict(width=16, dropout_rate=0.0),
                          ckpt=str(tmp_path), temperature=2.0, alpha=1.0)
    cfg["total_steps"] = 120
    cfg["batch_size"] = 16
    state, step, data_iter_fn, val_set, eval_fn = recipes.build_distill(
        cfg, synthetic=True)
    it = data_iter_fn()
    agreement = []
    for i, batch in enumerate(it):
        if i >= 120:
            break
        state, metrics = step(state, batch)
        agreement.append(float(metrics["teacher_agreement"]))
    it.close()
    # pure-soft-target training (alpha=1: no labels consumed) pulls the
    # student toward the teacher's decisions
    assert np.mean(agreement[-10:]) > np.mean(agreement[:10]), agreement
    assert np.mean(agreement[-10:]) > 0.55, agreement
