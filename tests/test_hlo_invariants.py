"""HLO-inspection invariants (SURVEY.md §4: jit-lowering asserts).

Numerics tests prove *what* is computed; these prove *how*: the sharded
step really communicates over collectives, the GAN step really is one
program, and the train step carries no host round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.parallel.mesh import (make_mesh, shard_batch,
                                         spatial_input_sharding)
from myconvnet_tpu.train import optim
from myconvnet_tpu.train.losses import softmax_cross_entropy
from myconvnet_tpu.train.trainer import Trainer, init_train_state


def _hlo(trainer, state, batch) -> str:
    return trainer._train_step.lower(state, batch).compile().as_text()


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = transform(lambda x, train=False: models.smallnet(
        x, 4, train=train, width=8, dropout_rate=0.0))
    opt = optim.momentum(0.05, 0.9)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(8, 16, 16, 3).astype(np.float32))
    y = jnp.asarray((np.arange(8) % 4).astype(np.int32))
    return model, opt, x, y


@pytest.mark.slow
def test_dp_step_lowering_contains_gradient_allreduce(setup):
    model, opt, x, y = setup
    mesh = make_mesh(8, 1)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, mesh=mesh)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros_like(x))
    hlo = _hlo(t, state, shard_batch(mesh, (x, y)))
    assert "all-reduce" in hlo, "sharded-batch grads need an all-reduce"


def test_spatial_step_lowering_contains_halo_collectives(setup):
    model, opt, x, y = setup
    mesh = make_mesh(4, 2)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, mesh=mesh, spatial=True)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros_like(x))
    batch = t.shard_batch((x, y))
    hlo = _hlo(t, state, batch)
    # H-sharded convs need halo exchange: GSPMD emits collective-permute
    # (or fused variants) for the boundary rows
    assert ("collective-permute" in hlo or "all-gather" in hlo), \
        "spatially-sharded convs must exchange halos"


def test_single_device_step_has_no_collectives_or_host_calls(setup):
    model, opt, x, y = setup
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jnp.zeros_like(x))
    hlo = _hlo(t, state, (x, y))
    assert "all-reduce" not in hlo
    assert "custom-call" not in hlo.replace(
        "custom-call target=\"Sharding\"", ""), \
        "no host callbacks inside the hot step"


def test_gan_step_is_one_program_with_both_optimizers():
    from myconvnet_tpu.train import gan
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=16))
    disc = transform(lambda i, train: models.dcgan_discriminator(
        i, train=train, base_features=8))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    state = gan.init_gan_state(gen, disc, g_opt, d_opt, jax.random.key(0),
                               jnp.zeros((2, 16)),
                               (jnp.zeros((2, 16, 16, 3)),))
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=16)
    real = jnp.zeros((2, 16, 16, 3))
    lowered = step.lower(state, real)
    hlo = lowered.compile().as_text()
    assert hlo.count("ENTRY") == 1, "fused dual-opt step must be ONE program"
    # the single program returns the full new state: both optimizer
    # trees' leaves are outputs of the same executable
    out_state, _metrics = jax.eval_shape(step, state, real)
    assert len(jax.tree.leaves(out_state.g_opt)) == \
        len(jax.tree.leaves(state.g_opt))
    assert len(jax.tree.leaves(out_state.d_opt)) == \
        len(jax.tree.leaves(state.d_opt))
