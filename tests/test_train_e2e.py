"""End-to-end slice (SURVEY.md §7 build-order step 1): smallnet on
synthetic CIFAR trains, loss decreases, checkpoint roundtrips, predict
works through the ConvNet API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.data.pipeline import ArraySource, DataSet
from myconvnet_tpu.eval.evaluators import AccuracyEvaluator
from myconvnet_tpu.models.base import ConvNet
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.train import optim


def _small_model(x, num_classes, train=False):
    return models.smallnet(x, num_classes, train=train, width=8,
                           dropout_rate=0.0)


@pytest.fixture(scope="module")
def tiny_sets():
    train = DataSet(ArraySource(*cifar10.synthetic_subset(128, 0)),
                    augment=AugmentConfig(
                        out_hw=(32, 32), area_range=None, pad=2, flip=True,
                        mean=cifar10.MEAN, std=cifar10.STD))
    val = DataSet(ArraySource(*cifar10.synthetic_subset(64, 1)))
    return train, val


def test_convnet_train_loss_decreases(tiny_sets, tmp_path):
    train_set, val_set = tiny_sets
    net = ConvNet(_small_model, input_shape=(32, 32, 3), num_classes=10,
                  augment=train_set.augment, ckpt_dir=str(tmp_path),
                  seed=0)
    opt = optim.momentum(0.05, 0.9)
    losses = []
    net.logger.stdout = False
    orig_log = net.logger.log
    net.logger.log = lambda step, m: losses.append(m.get("loss")) \
        if "loss" in m else orig_log(step, m)

    state = net.train(train_set, val_set, batch_size=32, total_steps=60,
                      optimizer=opt, val_every=30)
    assert int(state.step) == 60
    # synthetic classes are learnable: loss must drop markedly
    first = [l for l in losses if l is not None][0]
    last = [l for l in losses if l is not None][-1]
    assert last < first * 0.8, (first, last)

    # accuracy above chance on val
    acc = net.evaluate(val_set, AccuracyEvaluator(), batch_size=32)
    assert acc > 0.2, acc

    # checkpoint roundtrip through the API
    net.save()
    logits_before = net.predict(val_set.source.images[:8], batch_size=8)
    # same augment config: predict normalizes via the eval chain
    net2 = ConvNet(_small_model, input_shape=(32, 32, 3), num_classes=10,
                   augment=train_set.augment, ckpt_dir=str(tmp_path),
                   seed=7)
    net2.build(opt)
    net2.restore()
    logits_after = net2.predict(val_set.source.images[:8], batch_size=8)
    np.testing.assert_allclose(logits_before, logits_after, atol=1e-5)


def test_trainer_early_stop(tiny_sets, tmp_path):
    train_set, val_set = tiny_sets
    net = ConvNet(_small_model, input_shape=(32, 32, 3), num_classes=10)
    net.logger.stdout = False
    # lr=0 -> no improvement -> early stop after patience validations
    state = net.train(train_set, val_set, batch_size=32, total_steps=500,
                      optimizer=optim.sgd(0.0), val_every=10,
                      early_stop_patience=2)
    assert int(state.step) < 500


def test_predict_pads_tail_batch(tiny_sets):
    train_set, _ = tiny_sets
    net = ConvNet(_small_model, input_shape=(32, 32, 3), num_classes=10)
    net.build()
    out = net.predict(train_set.source.images[:10].astype(np.float32),
                      batch_size=8)
    assert out.shape == (10, 10)


def test_reference_api_surface():
    """The reference ConvNet public contract (BASELINE north star):
    build / train / predict / save / restore (+evaluate, close)."""
    for method in ("build", "train", "predict", "evaluate", "save",
                   "restore", "close"):
        assert callable(getattr(ConvNet, method)), method


def test_convnet_summary_and_count():
    from myconvnet_tpu import models
    from myconvnet_tpu.models.base import ConvNet

    net = ConvNet(models.smallnet, input_shape=(32, 32, 3),
                  num_classes=10, width=8, dropout_rate=0.0)
    n = net.count_params()
    assert n > 1000
    text = net.summary(print_fn=None)
    assert f"{n:,}" in text and "logits" in text
    flops = net.forward_flops()
    if flops is not None:  # cost analysis present on this backend
        assert flops > 1e6
        assert "GFLOPs" in text
    # deeper grouping produces at least as many rows
    assert len(net.summary(depth=3, print_fn=None).splitlines()) >= \
        len(text.splitlines())


def test_train_epochs_arithmetic():
    from myconvnet_tpu import models
    from myconvnet_tpu.data.pipeline import ArraySource, DataSet
    from myconvnet_tpu.models.base import ConvNet
    from myconvnet_tpu.subsets import cifar10

    train_set = DataSet(ArraySource(*cifar10.synthetic_subset(64, 0)))
    net = ConvNet(models.smallnet, input_shape=(32, 32, 3),
                  num_classes=10, width=4, dropout_rate=0.0)
    net.logger.stdout = False
    state = net.train(train_set, batch_size=16, epochs=2)
    assert int(state.step) == 2 * (64 // 16)
