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


def test_resume_reproduces_uninterrupted_trajectory(tmp_path):
    """Train 8 straight == train 4, checkpoint, restore, train 4 more —
    bit-identical params (the crash-recovery correctness invariant:
    the in-jit RNG folds from the restored step counter, and the data
    order is a pure function of the dataset seed/epoch)."""
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.data.augment import augment_train

    cfg = AugmentConfig(out_hw=(32, 32), area_range=None, pad=2, flip=True,
                        mean=(0.5,) * 3, std=(0.25,) * 3)

    def make():
        model = transform(lambda x, train=False: models.smallnet(
            x, 10, train=train, width=8))
        opt = optim.momentum(0.05, 0.9)
        t = Trainer(model=model, optimizer=opt,
                    loss_fn=softmax_cross_entropy,
                    augment_fn=lambda k, x, y: (augment_train(k, x, cfg),
                                                y))
        t.logger.stdout = False
        return model, opt, t

    def data():
        return DataSet(ArraySource(*cifar10.synthetic_subset(64, 0)),
                       seed=7)

    # straight 8 steps
    model, opt, t = make()
    s = init_train_state(model, opt, jax.random.key(1),
                         jnp.zeros((16, 32, 32, 3)))
    s = t.fit(s, data().train_iter(16, prefetch=0), total_steps=8)
    straight = jax.tree.map(np.asarray, s.params)

    # 4 steps -> checkpoint -> fresh objects -> restore -> 4 more.
    # NOTE the data iterator must resume at batch index 4: replaying the
    # epoch stream and skipping consumed batches is exactly what
    # trainer.fit's step-counter guard does on resume.
    model, opt, t = make()
    s = init_train_state(model, opt, jax.random.key(1),
                         jnp.zeros((16, 32, 32, 3)))
    s = t.fit(s, data().train_iter(16, prefetch=0), total_steps=4)
    ckpt_lib.save_checkpoint(str(tmp_path), 4, s._asdict())

    model, opt, t2 = make()
    template = init_train_state(model, opt, jax.random.key(99),
                                jnp.zeros((16, 32, 32, 3)))
    restored = ckpt_lib.restore_checkpoint(str(tmp_path),
                                           template._asdict())
    s2 = type(template)(**restored)
    it = data().train_iter(16, prefetch=0)
    for _ in range(4):  # skip the batches the first run consumed
        next(it)
    s2 = t2.fit(s2, it, total_steps=8)
    resumed = jax.tree.map(np.asarray, s2.params)

    for scope in straight:
        for name in straight[scope]:
            np.testing.assert_array_equal(resumed[scope][name],
                                          straight[scope][name],
                                          err_msg=f"{scope}/{name}")


def test_gan_resume_reproduces_uninterrupted_trajectory(tmp_path):
    """Checkpoint a fused GAN run mid-way, restore into a fresh state,
    continue: metrics must be bit-identical to the uninterrupted run
    (the step-keyed PRNG makes the z-draws resume-invariant)."""
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu import models
    from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.train import gan, optim

    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=16))
    disc = transform(lambda x, train: models.dcgan_discriminator(
        x, train=train, base_features=8))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=16)

    def fresh():
        return gan.init_gan_state(gen, disc, g_opt, d_opt,
                                  jax.random.key(0), jnp.zeros((4, 16)),
                                  (jnp.zeros((4, 16, 16, 3)),))

    rs = np.random.RandomState(0)
    real = jnp.asarray(rs.uniform(-1, 1, (4, 16, 16, 3))
                       .astype(np.float32))

    # uninterrupted: 4 steps
    state = fresh()
    losses = []
    for _ in range(4):
        state, m = step(state, real)
        losses.append((float(m["d_loss"]), float(m["g_loss"])))

    # interrupted: 2 steps, checkpoint, restore into a fresh template
    state = fresh()
    for _ in range(2):
        state, m = step(state, real)
    ckpt_lib.save_checkpoint(str(tmp_path), 2, state._asdict())
    restored = ckpt_lib.restore_checkpoint(str(tmp_path),
                                           fresh()._asdict())
    state = type(state)(**restored)
    resumed = []
    for _ in range(2):
        state, m = step(state, real)
        resumed.append((float(m["d_loss"]), float(m["g_loss"])))
    np.testing.assert_array_equal(np.asarray(resumed),
                                  np.asarray(losses[2:]))
