"""Fused dual-optimizer GAN step: one jitted program updates G and D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.train import gan, optim


def _tree_diff(a, b):
    return jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda p, q: p - q, a, b), 0.0)


@pytest.fixture(scope="module")
def dcgan_factory():
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=32))
    disc = transform(lambda x, train: models.dcgan_discriminator(
        x, train=train, base_features=16))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=32)

    def make_state():
        return gan.init_gan_state(gen, disc, g_opt, d_opt,
                                  jax.random.key(0), jnp.zeros((4, 32)),
                                  (jnp.zeros((4, 16, 16, 3)),))
    return make_state, step


@pytest.fixture
def dcgan_setup(dcgan_factory):
    # the jitted step donates its input state, so each test needs a fresh
    # one (the compiled step itself is shared module-wide)
    make_state, step = dcgan_factory
    return make_state(), step


@pytest.mark.slow
def test_dcgan_step_updates_both_nets(dcgan_setup):
    state, step = dcgan_setup
    real = jax.random.uniform(jax.random.key(1), (4, 16, 16, 3)) * 2 - 1
    # snapshot to host before the step: the jitted step donates `state`
    g0 = jax.tree.map(np.asarray, state.g_params)
    d0 = jax.tree.map(np.asarray, state.d_params)
    step0 = int(state.step)
    new_state, metrics = step(state, real)
    assert int(new_state.step) == step0 + 1
    assert _tree_diff(new_state.g_params, g0) > 0
    assert _tree_diff(new_state.d_params, d0) > 0
    for k in ("d_loss", "g_loss", "d_real_acc", "d_fake_acc"):
        assert np.isfinite(float(metrics[k])), k


def test_dcgan_losses_sane_over_steps(dcgan_setup):
    state, step = dcgan_setup
    key = jax.random.key(2)
    for i in range(5):
        real = jax.random.uniform(jax.random.fold_in(key, i),
                                  (4, 16, 16, 3)) * 2 - 1
        state, metrics = step(state, real)
    # D loss = BCE(real->1)+BCE(fake->0); sane early-training range
    assert 0.05 < float(metrics["d_loss"]) < 4.0
    assert 0.05 < float(metrics["g_loss"]) < 10.0


@pytest.mark.slow
def test_pix2pix_step():
    gen = transform(lambda x, train: models.unet_generator(
        x, train=train, base_features=8, n_levels=3))
    disc = transform(lambda a, b, train: models.patchgan_discriminator(
        a, b, train=train, base_features=8, n_layers=2))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    x = jnp.zeros((2, 16, 16, 3))
    state = gan.init_gan_state(gen, disc, g_opt, d_opt, jax.random.key(0),
                               x, (x, x))
    step = gan.make_pix2pix_step(gen, disc, g_opt, d_opt, l1_weight=100.0)
    inp = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3)) * 2 - 1
    tgt = -inp  # learn to invert
    l1_first = None
    for i in range(8):
        state, metrics = step(state, (inp, tgt))
        if l1_first is None:
            l1_first = float(metrics["g_l1"])
    assert float(metrics["g_l1"]) < l1_first  # L1 term must shrink
    assert np.isfinite(float(metrics["d_loss"]))


def test_gan_step_is_single_program(dcgan_setup):
    """The fused step must be ONE compiled executable (not 2 dispatches)."""
    state, step = dcgan_setup
    real = jnp.zeros((4, 16, 16, 3))
    lowered = step.lower(state, real)
    compiled = lowered.compile()
    # both optimizers' updates present in one program: output tree holds
    # updated G and D params
    out_state, _ = compiled(state, real)
    assert out_state.g_params.keys() == state.g_params.keys()
    assert out_state.d_params.keys() == state.d_params.keys()


def test_gan_generator_ema_via_combinator():
    """with_ema-wrapped G optimizer: the fused dual-opt step maintains a
    Polyak copy of the generator inside g_opt state (sample with
    optim.extract_ema for the standard EMA-G inference trick)."""
    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.train import gan, optim

    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=16))
    disc = transform(lambda i, train: models.dcgan_discriminator(
        i, train=train, base_features=8))
    g_opt = optim.with_ema(optim.adam(2e-4, b1=0.5), decay=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    state = gan.init_gan_state(gen, disc, g_opt, d_opt, jax.random.key(0),
                               jnp.zeros((4, 16)),
                               (jnp.zeros((4, 16, 16, 3)),))
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=16)
    real = jnp.asarray(np.random.RandomState(0)
                       .rand(4, 16, 16, 3).astype(np.float32) * 2 - 1)
    for _ in range(2):
        state, m = step(state, real)
    ema = optim.extract_ema(state.g_opt)
    # EMA tree mirrors generator params and has moved off the init value
    moved = 0.0
    for scope in state.g_params:
        for name in state.g_params[scope]:
            e = np.asarray(ema[scope][name])
            p = np.asarray(state.g_params[scope][name])
            assert e.shape == p.shape
            moved += float(np.abs(e - p).sum())
    assert np.isfinite(moved)
    # EMA lags the live params after updates (decay < 1, params moved)
    assert moved > 0


def test_gan_loss_formulas():
    from myconvnet_tpu.train import losses
    r = jnp.asarray([2.0, -1.0])
    f = jnp.asarray([0.5, -3.0])
    # LSGAN: 0.5*(mean((r-1)^2) + mean(f^2)) ; G: 0.5*mean((f-1)^2)
    np.testing.assert_allclose(
        losses.lsgan_discriminator_loss(r, f),
        0.5 * (np.mean((np.array([2., -1.]) - 1) ** 2)
               + np.mean(np.array([0.5, -3.]) ** 2)), rtol=1e-6)
    np.testing.assert_allclose(
        losses.lsgan_generator_loss(f),
        0.5 * np.mean((np.array([0.5, -3.]) - 1) ** 2), rtol=1e-6)
    # hinge: mean(relu(1-r)) + mean(relu(1+f)) ; G: -mean(f)
    np.testing.assert_allclose(
        losses.hinge_discriminator_loss(r, f),
        np.mean([0.0, 2.0]) + np.mean([1.5, 0.0]), rtol=1e-6)
    np.testing.assert_allclose(losses.hinge_generator_loss(f),
                               -np.mean([0.5, -3.0]), rtol=1e-6)
    with pytest.raises(ValueError, match="unknown GAN loss"):
        losses.get_gan_losses("wasserstein_gp")


@pytest.mark.parametrize("gan_loss", ["lsgan", "hinge"])
def test_dcgan_step_loss_variants(gan_loss):
    """Each objective variant must train in the same fused single-program
    step: finite losses, both nets' params move."""
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=32))
    disc = transform(lambda x, train: models.dcgan_discriminator(
        x, train=train, base_features=16))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=32,
                               gan_loss=gan_loss)
    state = gan.init_gan_state(gen, disc, g_opt, d_opt, jax.random.key(0),
                               jnp.zeros((4, 32)),
                               (jnp.zeros((4, 16, 16, 3)),))
    g0 = jax.tree.map(jnp.copy, state.g_params)
    d0 = jax.tree.map(jnp.copy, state.d_params)
    real = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (4, 16, 16, 3)).astype(np.float32))
    for _ in range(3):
        state, metrics = step(state, real)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert _tree_diff(state.g_params, g0) > 0
    assert _tree_diff(state.d_params, d0) > 0


@pytest.mark.slow
def test_cyclegan_fused_step():
    """Quad-network fused step: both Gs and both Ds update in one
    program; cycle/identity losses are exact L1 at init symmetry."""
    gen = transform(lambda x, train: models.resnet_generator(
        x, train=train, base_features=8, n_blocks=2))
    disc = transform(lambda x, train: models.patchgan_discriminator(
        x, train=train, base_features=8, n_layers=2, norm="instance"))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    state = gan.init_cyclegan_state(gen, disc, g_opt, d_opt,
                                    jax.random.key(0),
                                    jnp.zeros((2, 16, 16, 3)))
    # two directions start from different inits
    assert _tree_diff(state.g_params["ab"], state.g_params["ba"]) > 0
    step = gan.make_cyclegan_step(gen, disc, g_opt, d_opt,
                                  cycle_weight=10.0)
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rs.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    g0 = jax.tree.map(jnp.copy, state.g_params)
    d0 = jax.tree.map(jnp.copy, state.d_params)
    for _ in range(2):
        state, metrics = step(state, (a, b))
    for key in ("d_loss", "g_loss", "g_adv", "g_cycle", "g_identity"):
        assert np.isfinite(float(metrics[key])), key
    # all four networks moved
    assert _tree_diff(state.g_params["ab"], g0["ab"]) > 0
    assert _tree_diff(state.g_params["ba"], g0["ba"]) > 0
    assert _tree_diff(state.d_params["a"], d0["a"]) > 0
    assert _tree_diff(state.d_params["b"], d0["b"]) > 0


def test_cyclegan_recipe_and_sampler():
    from myconvnet_tpu import recipes
    cfg = dict(task="gan", gan_kind="cyclegan", dataset="pairs",
               data_dir=None, image_size=16, batch_size=2, total_steps=2,
               generator_kwargs=dict(base_features=8, n_blocks=1),
               discriminator_kwargs=dict(base_features=8, n_layers=2),
               g_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
               d_optimizer=dict(name="adam", b1=0.5, lr=2e-4),
               precision="f32", seed=0)
    state, step, data_iter_fn, kind = recipes.build_gan(cfg,
                                                        synthetic=True)
    assert kind == "cyclegan"
    it = data_iter_fn()
    batch = next(it)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_cycle"]))
    sampler = recipes.make_gan_sampler(cfg)
    out_ab = sampler(state, batch[0], direction="ab")
    out_ba = sampler(state, batch[1], direction="ba")
    assert out_ab.shape == (2, 16, 16, 3) and out_ab.dtype == np.uint8
    assert out_ba.shape == (2, 16, 16, 3)


def test_spectral_norm_bounds_singular_value():
    """After the power iteration converges, the effective conv weight's
    leading singular value must be ~1."""
    from myconvnet_tpu import nn as nn_lib

    net = transform(lambda x: nn_lib.conv(x, 8, 3, use_bias=False,
                                          spectral_norm=True,
                                          name="snconv"))
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(2, 8, 8, 4).astype(np.float32))
    params, state = net.init(jax.random.key(0), x)
    for _ in range(30):  # converge u
        _, state = net.apply(params, state, None, x)
    w = np.asarray(params["snconv"]["w"], np.float64).reshape(-1, 8)
    u = np.asarray(state["snconv"]["sn_u"], np.float64)
    v = w @ u
    v /= np.linalg.norm(v)
    u2 = w.T @ v
    u2 /= np.linalg.norm(u2)
    sigma_est = float(v @ w @ u2)
    sigma_true = float(np.linalg.svd(w, compute_uv=False)[0])
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)
    # and the layer actually divides by it: ||W_eff||_2 ~= 1
    np.testing.assert_allclose(
        np.linalg.svd(w / sigma_est, compute_uv=False)[0], 1.0,
        rtol=1e-3)


@pytest.mark.slow
def test_sn_hinge_dcgan_trains():
    gen = transform(lambda z, train: models.dcgan_generator(
        z, train=train, image_size=16, base_features=32))
    disc = transform(lambda x, train: models.dcgan_discriminator(
        x, train=train, base_features=16, spectral_norm=True))
    g_opt = optim.adam(2e-4, b1=0.5)
    d_opt = optim.adam(2e-4, b1=0.5)
    step = gan.make_dcgan_step(gen, disc, g_opt, d_opt, latent_dim=16,
                               gan_loss="hinge")
    state = gan.init_gan_state(gen, disc, g_opt, d_opt, jax.random.key(0),
                               jnp.zeros((4, 16)),
                               (jnp.zeros((4, 16, 16, 3)),))
    # SN state (power-iteration vectors) exists in D's state tree
    assert any("sn_u" in d for d in state.d_state.values())
    real = jnp.asarray(np.random.RandomState(0)
                       .uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    for _ in range(3):
        state, m = step(state, real)
    assert np.isfinite(float(m["d_loss"]))
