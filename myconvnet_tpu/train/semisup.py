"""Semi-supervised training: FixMatch (Sohn et al., 2020) — the
eighth task family, beyond the reference's supervised-only scope
(mount empty, SURVEY.md §0).

One jitted program per step: the labeled batch, the weakly-augmented
unlabeled batch and the strongly-augmented unlabeled batch run as ONE
concatenated forward (so BN statistics see the full mixture, as in the
paper's implementation), pseudo-labels come from the weak branch under
``stop_gradient`` with a confidence threshold, and the supervised +
masked-unsupervised CE losses backprop together.  All augmentation is
on-device (data/augment.py + data/randaugment.py) inside the same
program — the host only ships uint8 batches.

An EMA of the parameters (the paper evaluates with it) is tracked in
the same program, like train/diffusion.py's.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.train.losses import softmax_cross_entropy
from myconvnet_tpu.train.optim import Optimizer


class SemiState(NamedTuple):
    params: Any
    model_state: Any
    ema_params: Any
    ema_model_state: Any   # EMA of BN statistics — the paper averages
    opt: Any               # the FULL model, not just the weights
    step: jax.Array
    rng: jax.Array  # key data


def init_semi_state(model: Transformed, opt: Optimizer, rng: jax.Array,
                    sample_x: jax.Array) -> SemiState:
    params, mstate = model.init(rng, sample_x, True)
    ema = jax.tree.map(lambda p: p.copy(), params)
    ema_ms = jax.tree.map(lambda p: p.copy(), mstate)
    return SemiState(params, mstate, ema, ema_ms, opt.init(params),
                     jnp.zeros((), jnp.int32), jax.random.key_data(rng))


def _ema_tree(old, new, decay):
    """EMA over float leaves; non-float leaves (counters) pass through."""
    def one(e, p):
        if jnp.issubdtype(p.dtype, jnp.floating):
            return e * decay + p * (1.0 - decay)
        return p
    return jax.tree.map(one, old, new)


def make_fixmatch_step(model: Transformed, opt: Optimizer,
                       weak_fn: Callable, strong_fn: Callable, *,
                       threshold: float = 0.95,
                       lambda_u: float = 1.0,
                       ema_decay: float = 0.999) -> Callable:
    """(state, (x_lab_u8, y_lab, x_unlab_u8)) -> (state, metrics).

    ``weak_fn(key, x_u8) -> x_float`` is the flip+shift augmentation;
    ``strong_fn(key, x_u8) -> x_float`` adds RandAugment.  The
    unsupervised CE is averaged over the FULL unlabeled batch (the
    paper's 1/(mu*B) normalization), so low-confidence steps shrink the
    unsupervised gradient instead of renormalizing it away.
    """

    def step(state: SemiState, batch):
        x_l, y_l, x_u = batch
        nl, nu = x_l.shape[0], x_u.shape[0]
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        kl, kw, ks, km = jax.random.split(key, 4)
        xl = weak_fn(kl, x_l)
        xw = weak_fn(kw, x_u)
        xs = strong_fn(ks, x_u)
        xb = jnp.concatenate([xl, xw, xs], axis=0)

        def loss_fn(params):
            logits, mstate = model.apply(params, state.model_state, km,
                                         xb, True)
            logits = logits.astype(jnp.float32)
            lg_l = logits[:nl]
            lg_w = logits[nl:nl + nu]
            lg_s = logits[nl + nu:]
            sup = softmax_cross_entropy(lg_l, y_l)
            # pseudo-labels: weak branch, no gradient
            probs = jax.lax.stop_gradient(jax.nn.softmax(lg_w, axis=-1))
            conf = jnp.max(probs, axis=-1)
            pseudo = jnp.argmax(probs, axis=-1)
            mask = (conf >= threshold).astype(jnp.float32)
            per = -jnp.take_along_axis(
                jax.nn.log_softmax(lg_s, axis=-1),
                pseudo[:, None], axis=-1)[:, 0]
            unsup = jnp.sum(per * mask) / nu
            loss = sup + lambda_u * unsup
            aux = (mstate, sup, unsup, jnp.mean(mask), pseudo)
            return loss, aux

        (loss, (mstate, sup, unsup, mask_rate, pseudo)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        params, opt_state = opt.update(grads, state.opt, state.params,
                                       state.step)
        d = jnp.minimum(ema_decay,
                        (1.0 + state.step) / (10.0 + state.step))
        ema = _ema_tree(state.ema_params, params, d)
        ema_ms = _ema_tree(state.ema_model_state, mstate, d)
        new = SemiState(params, mstate, ema, ema_ms, opt_state,
                        state.step + 1, state.rng)
        metrics = {"loss": loss, "sup_loss": sup, "unsup_loss": unsup,
                   "mask_rate": mask_rate}
        return new, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_fn(model: Transformed, eval_augment: Callable,
                 use_ema: bool = True) -> Callable:
    """Returns ``evaluate(state, eval_iter) -> top-1 accuracy`` over an
    eval_iter of (x_u8, y) batches, using the EMA parameters (the
    paper's evaluation protocol)."""

    @jax.jit
    def _logits(params, mstate, x_u8):
        x = eval_augment(x_u8)
        logits, _ = model.apply(params, mstate, None, x, False)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    def evaluate(state: SemiState, batches) -> float:
        import numpy as np
        correct = total = 0
        # EMA weights pair with EMA BN statistics — mixing the lagging
        # weights with instantaneous stats scores a mismatched network
        params = state.ema_params if use_ema else state.params
        mstate = state.ema_model_state if use_ema else state.model_state
        for x, y in batches:
            pred = np.asarray(_logits(params, mstate, jnp.asarray(x)))
            y = np.asarray(y)
            correct += int((pred[:len(y)] == y).sum())
            total += len(y)
        return correct / max(total, 1)

    return evaluate


def labeled_subset(images, labels, per_class: int, num_classes: int,
                   seed: int = 0):
    """The FixMatch protocol's labeled split: ``per_class`` examples
    per class drawn deterministically; everything stays in the
    unlabeled pool (the paper keeps labeled examples there too)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    picks = []
    labels = np.asarray(labels)
    for c in range(num_classes):
        idx = np.flatnonzero(labels == c)
        if len(idx) == 0:
            continue
        rng.shuffle(idx)
        picks.append(idx[:per_class])
    picks = np.concatenate(picks) if picks else np.arange(0)
    return images[picks], labels[picks]
