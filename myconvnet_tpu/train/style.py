"""Fast style transfer training (Johnson et al. 2016) — the twelfth
task family's fused step.

ONE jitted program per step: generator forward, VGG features of the
stylized AND content batch, Gram/content/TV losses, backward, Adam —
the same single-program discipline as every other family (the
reference's closest analogue is the GAN path's fused dual-optimizer
step, SURVEY.md §3.5; here there is one optimizer and a frozen
extractor).

The style target enters as PRECOMPUTED Gram matrices (constants baked
at build time from the style image) — the style image itself never
rides the train step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.train import perceptual
from myconvnet_tpu.train.optim import Optimizer


class StyleState(NamedTuple):
    params: Any        # generator (trained)
    model_state: Any   # generator non-param state (empty for IN nets)
    vgg_params: Any    # frozen extractor
    vgg_state: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def init_style_state(gen, vgg, optimizer: Optimizer, rng: jax.Array,
                     sample: jax.Array) -> StyleState:
    """``gen``/``vgg`` are core.transform'd; ``sample`` [N,H,W,3]."""
    kg, kv = jax.random.split(rng)
    params, mstate = gen.init(kg, sample, True)
    vparams, vstate = vgg.init(kv, sample, False)
    return StyleState(params, mstate, vparams, vstate,
                      optimizer.init(params), jnp.zeros((), jnp.int32),
                      jax.random.key_data(rng))


def style_grams(features_fn: Callable, vgg_params, vgg_state,
                style_image: jax.Array) -> dict:
    """Precompute the target Gram matrices from ONE style image
    [1,H,W,3] in [0,1] (host-side, once)."""
    feats = features_fn(vgg_params, vgg_state, style_image)
    return {k: perceptual.gram_matrix(v) for k, v in feats.items()}


def make_style_step(gen, features_fn: Callable, optimizer: Optimizer,
                    target_grams: dict, *,
                    content_weight: float = 1.0,
                    style_weight: float = 5.0,
                    tv_weight: float = 1e-4,
                    content_layer: str = perceptual.CONTENT_LAYER):
    """-> jitted step(state, x [N,H,W,3] in [0,1]) -> (state, metrics).

    Gradients flow generator -> stylized image -> VGG features; the
    frozen extractor's params are differentiated-through, never
    updated (they are state fields outside the grad argument).
    """
    grams = {k: jnp.asarray(v) for k, v in target_grams.items()}

    def loss_fn(params, mstate, vgg_params, vgg_state, x):
        y, new_mstate = gen.apply(params, mstate, None, x, True)
        feats = features_fn(vgg_params, vgg_state, y)
        target = features_fn(vgg_params, vgg_state, x)
        c = perceptual.content_loss(feats, target, content_layer)
        s = perceptual.style_loss(feats, grams)
        tv = perceptual.tv_loss(y)
        loss = (content_weight * c + style_weight * s
                + tv_weight * tv)
        return loss, (new_mstate, c, s, tv)

    def step(state: StyleState, x) -> tuple[StyleState, dict]:
        (loss, (mstate, c, s, tv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.model_state,
                                   state.vgg_params, state.vgg_state, x)
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, state.step)
        metrics = {"loss": loss, "content": c, "style": s, "tv": tv}
        return state._replace(params=new_params, model_state=mstate,
                              opt_state=new_opt,
                              step=state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))
