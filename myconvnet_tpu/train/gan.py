"""GAN training: single jitted dual-optimizer step (BASELINE config #5).

The reference alternates two ``Session.run`` calls per step — one for the
D train op, one for G (SURVEY.md §3.5).  The TPU rebuild fuses both:
ONE XLA program computes D's gradients (G frozen via stop_gradient on the
fake images), G's gradients (through the discriminator apply, whose
*parameters* receive no update from G's optimizer), and applies both
optimizers.  XLA shares the generator forward between the two losses and
overlaps everything; per-step Python returns to 1 dispatch instead of 2.

Update semantics match the reference's alternating scheme: D updates
against the *current* G; G then updates against the *updated* D — the
same sequence as two Session.run calls, with the D-update's BN state
threading into G's discriminator pass.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.train import losses
from myconvnet_tpu.train.optim import Optimizer


class GANState(NamedTuple):
    g_params: Any
    g_state: Any
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array
    rng: jax.Array  # key data


def init_gan_state(generator: Transformed, discriminator: Transformed,
                   g_opt: Optimizer, d_opt: Optimizer, rng: jax.Array,
                   sample_g_input: jax.Array,
                   sample_d_args: tuple) -> GANState:
    kg, kd = jax.random.split(rng)
    g_params, g_state = generator.init(kg, sample_g_input, True)
    d_params, d_state = discriminator.init(kd, *sample_d_args, True)
    return GANState(g_params, g_state, d_params, d_state,
                    g_opt.init(g_params), d_opt.init(d_params),
                    jnp.zeros((), jnp.int32), jax.random.key_data(rng))


def make_dcgan_step(generator: Transformed, discriminator: Transformed,
                    g_opt: Optimizer, d_opt: Optimizer,
                    latent_dim: int,
                    gan_loss: str = "nonsaturating") -> Callable:
    """One fused DCGAN step: (state, real_images) -> (state, metrics).

    real_images: [N,H,W,C] float in [-1, 1].  ``gan_loss`` selects the
    adversarial objective (losses.GAN_LOSSES: nonsaturating/lsgan/hinge);
    all variants are elementwise, so the step stays one XLA program.
    """
    d_loss_of, g_loss_of = losses.get_gan_losses(gan_loss)
    # D's decision boundary: 0 for logit-based losses, 0.5 for LSGAN's
    # regression-to-{0,1} (metrics only)
    thr = 0.5 if gan_loss == "lsgan" else 0.0

    def step(state: GANState, real: jax.Array):
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        kz, kg, kd1, kd2, kd3 = jax.random.split(key, 5)
        z = jax.random.normal(kz, (real.shape[0], latent_dim), real.dtype)

        # ---- D update (G frozen: grads flow only into d_params; this
        # pass's G state is discarded — the G-loss pass below produces
        # the state that threads forward)
        fake, _ = generator.apply(
            state.g_params, state.g_state, kg, z, True)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_logits, d_state1 = discriminator.apply(
                d_params, state.d_state, kd1, real, True)
            fake_logits, d_state2 = discriminator.apply(
                d_params, d_state1, kd2, fake_sg, True)
            loss = d_loss_of(real_logits, fake_logits)
            return loss, (d_state2, real_logits, fake_logits)

        (d_loss, (d_state_new, real_logits, fake_logits)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_params_new, d_opt_new = d_opt.update(
            d_grads, state.d_opt, state.d_params, state.step)

        # ---- G update against the UPDATED D (alternating semantics)
        def g_loss_fn(g_params):
            fake2, g_state2 = generator.apply(
                g_params, state.g_state, kg, z, True)
            fake2_logits, _ = discriminator.apply(
                d_params_new, d_state_new, kd3, fake2, True)
            return g_loss_of(fake2_logits), g_state2

        (g_loss, g_state_new), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_params_new, g_opt_new = g_opt.update(
            g_grads, state.g_opt, state.g_params, state.step)

        metrics = {
            "d_loss": d_loss, "g_loss": g_loss,
            "d_real_acc": jnp.mean((real_logits > thr)
                                   .astype(jnp.float32)),
            "d_fake_acc": jnp.mean((fake_logits < thr)
                                   .astype(jnp.float32)),
        }
        new_state = GANState(g_params_new, g_state_new, d_params_new,
                             d_state_new, g_opt_new, d_opt_new,
                             state.step + 1, state.rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_pix2pix_step(generator: Transformed, discriminator: Transformed,
                      g_opt: Optimizer, d_opt: Optimizer,
                      l1_weight: float = 100.0,
                      gan_loss: str = "nonsaturating") -> Callable:
    """One fused pix2pix step: (state, (input_img, target_img)) ->
    (state, metrics).  Conditional GAN: D sees (input, output) pairs;
    G loss = adversarial + l1_weight * L1(target).  ``gan_loss`` selects
    the adversarial objective (losses.GAN_LOSSES)."""
    d_loss_of, g_loss_of = losses.get_gan_losses(gan_loss)

    def step(state: GANState, batch):
        x, target = batch
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        kg, kd1, kd2, kd3, kg2 = jax.random.split(key, 5)

        fake, _ = generator.apply(state.g_params, state.g_state, kg, x, True)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_logits, d_state1 = discriminator.apply(
                d_params, state.d_state, kd1, x, target, True)
            fake_logits, d_state2 = discriminator.apply(
                d_params, d_state1, kd2, x, fake_sg, True)
            loss = d_loss_of(real_logits, fake_logits)
            return loss, d_state2

        (d_loss, d_state_new), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_params_new, d_opt_new = d_opt.update(
            d_grads, state.d_opt, state.d_params, state.step)

        def g_loss_fn(g_params):
            fake2, g_state2 = generator.apply(
                g_params, state.g_state, kg2, x, True)
            fake2_logits, _ = discriminator.apply(
                d_params_new, d_state_new, kd3, x, fake2, True)
            adv = g_loss_of(fake2_logits)
            l1 = losses.l1_loss(fake2, target)
            return adv + l1_weight * l1, (g_state2, adv, l1)

        (g_total, (g_state_new, g_adv, g_l1)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_params_new, g_opt_new = g_opt.update(
            g_grads, state.g_opt, state.g_params, state.step)

        metrics = {"d_loss": d_loss, "g_loss": g_total,
                   "g_adv": g_adv, "g_l1": g_l1}
        new_state = GANState(g_params_new, g_state_new, d_params_new,
                             d_state_new, g_opt_new, d_opt_new,
                             state.step + 1, state.rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------- cyclegan

def init_cyclegan_state(generator: Transformed, discriminator: Transformed,
                        g_opt: Optimizer, d_opt: Optimizer,
                        rng: jax.Array,
                        sample_image: jax.Array) -> GANState:
    """Four networks in two optimizer trees: g_params = {ab, ba},
    d_params = {a, b} — one g_opt/d_opt update step covers both
    directions (the per-leaf math is identical to separate optimizers
    with the same hyperparameters)."""
    kab, kba, kda, kdb = jax.random.split(rng, 4)
    gp_ab, gs_ab = generator.init(kab, sample_image, True)
    gp_ba, gs_ba = generator.init(kba, sample_image, True)
    dp_a, ds_a = discriminator.init(kda, sample_image, True)
    dp_b, ds_b = discriminator.init(kdb, sample_image, True)
    g_params = {"ab": gp_ab, "ba": gp_ba}
    g_state = {"ab": gs_ab, "ba": gs_ba}
    d_params = {"a": dp_a, "b": dp_b}
    d_state = {"a": ds_a, "b": ds_b}
    return GANState(g_params, g_state, d_params, d_state,
                    g_opt.init(g_params), d_opt.init(d_params),
                    jnp.zeros((), jnp.int32), jax.random.key_data(rng))


def make_cyclegan_step(generator: Transformed,
                       discriminator: Transformed,
                       g_opt: Optimizer, d_opt: Optimizer, *,
                       cycle_weight: float = 10.0,
                       identity_weight: float = 0.5,
                       gan_loss: str = "lsgan") -> Callable:
    """One fused CycleGAN step over unpaired (a, b) batches: both
    discriminators and both generators (adversarial + cycle + identity
    losses) update in a single XLA program — the quad-network extension
    of the fused dual-optimizer requirement (SURVEY.md §3.5).

    LSGAN objective by default (the paper's). ``identity_weight`` is
    relative to ``cycle_weight`` (paper: 0.5).  The paper's image-history
    buffer for D is a host-side replay heuristic, intentionally omitted
    from the jitted step; training remains stable via LSGAN.
    """
    d_loss_of, g_loss_of = losses.get_gan_losses(gan_loss)

    def step(state: GANState, batch):
        a, b = batch
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        ks = jax.random.split(key, 12)

        fake_b, _ = generator.apply(state.g_params["ab"],
                                    state.g_state["ab"], ks[0], a, True)
        fake_a, _ = generator.apply(state.g_params["ba"],
                                    state.g_state["ba"], ks[1], b, True)
        fb_sg = jax.lax.stop_gradient(fake_b)
        fa_sg = jax.lax.stop_gradient(fake_a)

        def d_loss_fn(d_params):
            ra, dsa = discriminator.apply(d_params["a"], state.d_state["a"],
                                          ks[2], a, True)
            fa, dsa = discriminator.apply(d_params["a"], dsa, ks[3],
                                          fa_sg, True)
            rb, dsb = discriminator.apply(d_params["b"], state.d_state["b"],
                                          ks[4], b, True)
            fb, dsb = discriminator.apply(d_params["b"], dsb, ks[5],
                                          fb_sg, True)
            loss = 0.5 * (d_loss_of(ra, fa) + d_loss_of(rb, fb))
            return loss, {"a": dsa, "b": dsb}

        (d_loss, d_state_new), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_params_new, d_opt_new = d_opt.update(
            d_grads, state.d_opt, state.d_params, state.step)

        def g_loss_fn(g_params):
            fb2, gs_ab = generator.apply(g_params["ab"],
                                         state.g_state["ab"], ks[0], a,
                                         True)
            fa2, gs_ba = generator.apply(g_params["ba"],
                                         state.g_state["ba"], ks[1], b,
                                         True)
            adv_b = g_loss_of(discriminator.apply(
                d_params_new["b"], d_state_new["b"], ks[6], fb2, True)[0])
            adv_a = g_loss_of(discriminator.apply(
                d_params_new["a"], d_state_new["a"], ks[7], fa2, True)[0])
            rec_a, _ = generator.apply(g_params["ba"], gs_ba, ks[8], fb2,
                                       True)
            rec_b, _ = generator.apply(g_params["ab"], gs_ab, ks[9], fa2,
                                       True)
            cyc = losses.l1_loss(rec_a, a) + losses.l1_loss(rec_b, b)
            idt_b, _ = generator.apply(g_params["ab"], gs_ab, ks[10], b,
                                       True)
            idt_a, _ = generator.apply(g_params["ba"], gs_ba, ks[11], a,
                                       True)
            idt = losses.l1_loss(idt_b, b) + losses.l1_loss(idt_a, a)
            total = (adv_a + adv_b + cycle_weight * cyc
                     + identity_weight * cycle_weight * idt)
            return total, ({"ab": gs_ab, "ba": gs_ba},
                           (adv_a + adv_b, cyc, idt))

        (g_total, (g_state_new, (adv, cyc, idt))), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_params_new, g_opt_new = g_opt.update(
            g_grads, state.g_opt, state.g_params, state.step)

        metrics = {"d_loss": d_loss, "g_loss": g_total, "g_adv": adv,
                   "g_cycle": cyc, "g_identity": idt}
        new_state = GANState(g_params_new, g_state_new, d_params_new,
                             d_state_new, g_opt_new, d_opt_new,
                             state.step + 1, state.rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
