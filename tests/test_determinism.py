"""Fixed-seed determinism (BASELINE: reproducible outputs on fixed seeds;
SURVEY.md §7 hard-part #7 interpretation — our own PRNG streams are fully
deterministic even with augmentation + dropout on)."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.data.augment import AugmentConfig
from myconvnet_tpu.data.pipeline import ArraySource, DataSet
from myconvnet_tpu.subsets import cifar10
from myconvnet_tpu.train import optim
from myconvnet_tpu.train.losses import softmax_cross_entropy
from myconvnet_tpu.train.trainer import Trainer, init_train_state


def _run(seed):
    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8))  # dropout active: rng matters
    opt = optim.momentum(0.05, 0.9)
    cfg = AugmentConfig(out_hw=(32, 32), area_range=None, pad=2, flip=True,
                        brightness=0.2, mean=(0.5,) * 3, std=(0.25,) * 3)
    trainer = Trainer(
        model=model, optimizer=opt, loss_fn=softmax_cross_entropy,
        augment_fn=lambda k, x, y: (
            __import__("myconvnet_tpu.data.augment",
                       fromlist=["augment_train"]).augment_train(k, x, cfg),
            y))
    trainer.logger.stdout = False
    ds = DataSet(ArraySource(*cifar10.synthetic_subset(64, 0)), seed=7)
    state = init_train_state(model, opt, jax.random.key(seed),
                             jnp.zeros((16, 32, 32, 3)))
    state = trainer.fit(state, ds.train_iter(16, prefetch=0),
                        total_steps=8)
    return jax.tree.map(np.asarray, state.params)


def test_same_seed_identical_trajectory():
    a = _run(3)
    b = _run(3)
    for scope in a:
        for name in a[scope]:
            np.testing.assert_array_equal(a[scope][name], b[scope][name])


def test_different_seed_differs():
    a = _run(3)
    c = _run(4)
    diff = sum(float(np.abs(a[s][n] - c[s][n]).sum())
               for s in a for n in a[s])
    assert diff > 0
