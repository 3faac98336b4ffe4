"""Optimizers + LR schedules (pure-JAX, optax-style init/update pairs).

Rebuild of the reference's ``optimizers.py`` optimizer-selection and
LR-schedule machinery (SURVEY.md §2#6; mount empty — recalled surface:
SGD-momentum / Adam and step/cosine decay).  Each optimizer is a pair of
pure functions over parameter pytrees, so the whole update lives inside
one jitted XLA program together with forward+backward (no per-step Python
in the hot loop).  Schedules are pure functions of the step counter and
are evaluated *inside* the jitted step.

Weight decay follows the reference's L2-regularization semantics
(decay added to the gradient, i.e. coupled L2) for ``sgd``/``momentum``;
``adamw`` provides decoupled decay for modern recipes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Schedule = Callable[[jax.Array], jax.Array]
PyTree = Any


class Optimizer(NamedTuple):
    init: Callable[[PyTree], PyTree]
    update: Callable[[PyTree, PyTree, PyTree, jax.Array], tuple[PyTree, PyTree]]
    # update(grads, opt_state, params, step) -> (new_params, new_opt_state)


# ---------------------------------------------------------------- schedules

def constant(lr: float) -> Schedule:
    return lambda step: jnp.asarray(lr, jnp.float32)


def step_decay(lr: float, boundaries: list[int], rates: list[float]
               ) -> Schedule:
    """Piecewise-constant decay: lr * rates[i] after boundaries[i] steps."""
    bs = jnp.asarray(boundaries)
    rs = jnp.asarray([1.0] + list(rates), jnp.float32)

    def fn(step):
        idx = jnp.sum(step >= bs)
        return lr * rs[idx]
    return fn


def exponential_decay(lr: float, decay_steps: int, decay_rate: float,
                      staircase: bool = False) -> Schedule:
    def fn(step):
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        return jnp.asarray(lr * decay_rate ** p, jnp.float32)
    return fn


def cosine_decay(lr: float, total_steps: int, alpha: float = 0.0) -> Schedule:
    def fn(step):
        t = jnp.clip(step / total_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.asarray(lr * ((1 - alpha) * cos + alpha), jnp.float32)
    return fn


def polynomial_decay(lr: float, total_steps: int, end_lr: float = 0.0,
                     power: float = 0.9) -> Schedule:
    """DeepLab-style poly schedule."""
    def fn(step):
        t = jnp.clip(step / total_steps, 0.0, 1.0)
        return jnp.asarray((lr - end_lr) * (1 - t) ** power + end_lr,
                           jnp.float32)
    return fn


def cosine_restarts(lr: float, first_decay_steps: int, t_mul: float = 2.0,
                    m_mul: float = 1.0, alpha: float = 0.0) -> Schedule:
    """SGDR (warm restarts): cosine cycles of geometrically growing
    length (t_mul) and decaying peak (m_mul).  Branch-free closed form —
    the cycle index comes from a log, not a loop, so it stays one jitted
    expression of the step counter."""

    def fn(step):
        t = step.astype(jnp.float32) / first_decay_steps
        if t_mul == 1.0:
            i = jnp.floor(t)
            frac = t - i
        else:
            # cycles completed: largest i with (t_mul^i - 1)/(t_mul-1) <= t
            i = jnp.floor(jnp.log1p(t * (t_mul - 1.0)) / jnp.log(t_mul))
            start = (t_mul ** i - 1.0) / (t_mul - 1.0)
            frac = (t - start) / (t_mul ** i)
        peak = m_mul ** i
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(frac, 0.0, 1.0)))
        return jnp.asarray(lr * peak * ((1 - alpha) * cos + alpha),
                           jnp.float32)
    return fn


def warmup(schedule: Schedule, warmup_steps: int) -> Schedule:
    """Linear warmup from 0 wrapped around any schedule."""
    if warmup_steps <= 0:
        return schedule

    def fn(step):
        scale = jnp.minimum(1.0, (step + 1) / warmup_steps)
        return scale * schedule(step)
    return fn


def as_schedule(lr) -> Schedule:
    return lr if callable(lr) else constant(float(lr))


# --------------------------------------------------------------- optimizers

def _tree_zeros(params):
    return jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)


def _decayed(g, p, weight_decay, decay_on=True):
    if weight_decay <= 0.0 or not decay_on:
        return g.astype(jnp.float32)
    return g.astype(jnp.float32) + weight_decay * p.astype(jnp.float32)


def norm_and_bias_exclusion(path: str, p) -> bool:
    """Standard recipe: exclude biases and norm scales/offsets from
    weight decay (any rank-<=1 parameter, plus b/beta/gamma by name),
    and the ViT embedding tokens (cls_token/pos_embed — rank 3 but
    excluded by every standard transformer recipe, timm/DeiT)."""
    name = path.rsplit("/", 1)[-1]
    return (name in ("b", "beta", "gamma", "cls_token", "pos_embed")
            or getattr(p, "ndim", 2) <= 1)


def _keypath_str(keypath) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in keypath)


def _path_mask(params, predicate) -> Any:
    """Pytree of bools: predicate(scope_path_string, leaf) per leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, p: predicate(_keypath_str(kp), p), params)


def _decay_mask(params, exclude) -> Any:
    """Pytree of bools: True where weight decay applies."""
    if exclude is None:
        return jax.tree.map(lambda p: True, params)
    return _path_mask(params, lambda path, p: not exclude(path, p))


def sgd(lr, *, momentum: float = 0.0, nesterov: bool = False,
        weight_decay: float = 0.0, weight_decay_exclude=None) -> Optimizer:
    sched = as_schedule(lr)

    def init(params):
        if momentum == 0.0:
            return ()
        return _tree_zeros(params)

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        mask = _decay_mask(params, weight_decay_exclude)

        if momentum == 0.0:
            def upd(p, g, dm):
                gd = _decayed(g, p, weight_decay, dm)
                return (p.astype(jnp.float32) - lr_t * gd).astype(p.dtype)
            return jax.tree.map(upd, params, grads, mask), ()

        def upd(p, g, m, dm):
            gd = _decayed(g, p, weight_decay, dm)
            m_new = momentum * m + gd
            d = gd + momentum * m_new if nesterov else m_new
            return ((p.astype(jnp.float32) - lr_t * d).astype(p.dtype),
                    m_new)
        out = jax.tree.map(upd, params, grads, opt_state, mask)
        new_params = jax.tree.map(lambda o: o[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        return new_params, new_m

    return Optimizer(init, update)


def momentum(lr, momentum_coef: float = 0.9, *, nesterov: bool = False,
             weight_decay: float = 0.0,
             weight_decay_exclude=None) -> Optimizer:
    return sgd(lr, momentum=momentum_coef, nesterov=nesterov,
               weight_decay=weight_decay,
               weight_decay_exclude=weight_decay_exclude)


class AdamState(NamedTuple):
    mu: PyTree
    nu: PyTree


def adam(lr, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, *,
         weight_decay: float = 0.0, decoupled: bool = False,
         weight_decay_exclude=None) -> Optimizer:
    sched = as_schedule(lr)

    def init(params):
        return AdamState(_tree_zeros(params), _tree_zeros(params))

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        count = step.astype(jnp.float32) + 1.0
        bc1 = 1.0 - b1 ** count
        bc2 = 1.0 - b2 ** count
        mask = _decay_mask(params, weight_decay_exclude)

        def upd(p, g, mu, nu, dm):
            gf = g.astype(jnp.float32)
            if weight_decay > 0.0 and not decoupled and dm:
                gf = gf + weight_decay * p.astype(jnp.float32)
            mu_new = b1 * mu + (1 - b1) * gf
            nu_new = b2 * nu + (1 - b2) * jnp.square(gf)
            d = (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
            if weight_decay > 0.0 and decoupled and dm:
                d = d + weight_decay * p.astype(jnp.float32)
            return ((p.astype(jnp.float32) - lr_t * d).astype(p.dtype),
                    mu_new, nu_new)

        out = jax.tree.map(upd, params, grads, opt_state.mu, opt_state.nu,
                           mask)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        new_params = jax.tree.map(lambda o: o[0], out, is_leaf=is_triple)
        new_mu = jax.tree.map(lambda o: o[1], out, is_leaf=is_triple)
        new_nu = jax.tree.map(lambda o: o[2], out, is_leaf=is_triple)
        return new_params, AdamState(new_mu, new_nu)

    return Optimizer(init, update)


def adamw(lr, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 1e-4,
          weight_decay_exclude=None) -> Optimizer:
    return adam(lr, b1, b2, eps, weight_decay=weight_decay, decoupled=True,
                weight_decay_exclude=weight_decay_exclude)


def lars(lr, momentum_coef: float = 0.9, *, eta: float = 0.001,
         weight_decay: float = 0.0, eps: float = 1e-9,
         weight_decay_exclude=None) -> Optimizer:
    """LARS (You et al.): layer-wise trust-ratio scaling of the LR —
    THE optimizer for large-batch ResNet on pods (32k-batch training).

    Per layer: ratio = eta * ||w|| / (||g|| + wd * ||w|| + eps) when both
    norms are positive, else 1; momentum accumulates the ratio-scaled
    decayed gradient.  Parameters matched by ``weight_decay_exclude``
    (biases / norm scales by default semantics of the caller) skip BOTH
    decay and adaptation — plain momentum SGD, per the paper's practice.
    """
    sched = as_schedule(lr)

    def init(params):
        return _tree_zeros(params)

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        mask = _decay_mask(params, weight_decay_exclude)

        def upd(p, g, m, dm):
            pf = p.astype(jnp.float32)
            gf = g.astype(jnp.float32)
            if dm:  # adaptive layer: decay + trust ratio
                gd = gf + weight_decay * pf
                w_norm = jnp.sqrt(jnp.sum(jnp.square(pf)))
                g_norm = jnp.sqrt(jnp.sum(jnp.square(gd)))
                ratio = jnp.where(
                    (w_norm > 0.0) & (g_norm > 0.0),
                    eta * w_norm / (g_norm + eps), 1.0)
            else:   # excluded (bias/BN): plain momentum, no decay
                gd = gf
                ratio = 1.0
            m_new = momentum_coef * m + lr_t * ratio * gd
            return (pf - m_new).astype(p.dtype), m_new

        out = jax.tree.map(upd, params, grads, opt_state, mask)
        new_params = jax.tree.map(lambda o: o[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        return new_params, new_m

    return Optimizer(init, update)


class RMSPropState(NamedTuple):
    nu: PyTree
    mom: PyTree


def rmsprop(lr, decay: float = 0.9, eps: float = 1e-8,
            momentum_coef: float = 0.0, *,
            weight_decay: float = 0.0,
            weight_decay_exclude=None) -> Optimizer:
    sched = as_schedule(lr)

    def init(params):
        return RMSPropState(_tree_zeros(params), _tree_zeros(params))

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        mask = _decay_mask(params, weight_decay_exclude)

        def upd(p, g, nu, m, dm):
            gf = _decayed(g, p, weight_decay, dm)
            nu_new = decay * nu + (1 - decay) * jnp.square(gf)
            d = gf / (jnp.sqrt(nu_new) + eps)
            m_new = momentum_coef * m + d
            d = m_new if momentum_coef > 0.0 else d
            return ((p.astype(jnp.float32) - lr_t * d).astype(p.dtype),
                    nu_new, m_new)

        out = jax.tree.map(upd, params, grads, opt_state.nu, opt_state.mom,
                           mask)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        new_params = jax.tree.map(lambda o: o[0], out, is_leaf=is_triple)
        new_nu = jax.tree.map(lambda o: o[1], out, is_leaf=is_triple)
        new_m = jax.tree.map(lambda o: o[2], out, is_leaf=is_triple)
        return new_params, RMSPropState(new_nu, new_m)

    return Optimizer(init, update)


def adagrad(lr, eps: float = 1e-10, *,
            initial_accumulator: float = 0.1,
            weight_decay: float = 0.0,
            weight_decay_exclude=None) -> Optimizer:
    """Adagrad (Duchi et al.) — the remaining member of the TF1-era
    optimizer family (reference driver's optimizer choice, SURVEY.md
    §2#6).  ``initial_accumulator`` matches tf.compat.v1.AdagradOptimizer
    semantics (accumulators start at 0.1, not 0)."""
    sched = as_schedule(lr)

    def init(params):
        return jax.tree.map(
            lambda p: jnp.full(p.shape, initial_accumulator, jnp.float32),
            params)

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        mask = _decay_mask(params, weight_decay_exclude)

        def upd(p, g, acc, dm):
            gf = _decayed(g, p, weight_decay, dm)
            acc_new = acc + jnp.square(gf)
            d = gf / (jnp.sqrt(acc_new) + eps)
            return ((p.astype(jnp.float32) - lr_t * d).astype(p.dtype),
                    acc_new)

        out = jax.tree.map(upd, params, grads, opt_state, mask)
        is_pair = lambda x: isinstance(x, tuple) and len(x) == 2  # noqa: E731
        new_params = jax.tree.map(lambda o: o[0], out, is_leaf=is_pair)
        new_acc = jax.tree.map(lambda o: o[1], out, is_leaf=is_pair)
        return new_params, new_acc

    return Optimizer(init, update)


# ---------------------------------------------------------------- registry

def make_optimizer(name: str, lr, **kwargs) -> Optimizer:
    """Config-string optimizer factory (reference: optimizer choice in
    parameters.py)."""
    table = {"sgd": sgd, "momentum": momentum, "adam": adam,
             "adamw": adamw, "rmsprop": rmsprop, "lars": lars,
             "adagrad": adagrad}
    if name.lower() == "shampoo":
        from myconvnet_tpu.train.shampoo import shampoo
        return shampoo(lr, **kwargs)
    if name.lower() == "blocked_shampoo":
        from myconvnet_tpu.train.shampoo import blocked_shampoo
        return blocked_shampoo(lr, **kwargs)
    try:
        return table[name.lower()](lr, **kwargs)
    except KeyError as e:
        raise ValueError(
            f"unknown optimizer {name!r}; valid: {sorted(table)}") from e


def make_schedule(cfg: dict) -> Schedule:
    """Config-dict schedule factory.

    cfg example: {"kind": "cosine", "lr": 0.1, "total_steps": 10000,
                  "warmup_steps": 500}
    """
    cfg = dict(cfg)
    kind = cfg.pop("kind", "constant")
    warmup_steps = cfg.pop("warmup_steps", 0)
    table = {"constant": constant, "step": step_decay,
             "exponential": exponential_decay, "cosine": cosine_decay,
             "cosine_restarts": cosine_restarts,
             "poly": polynomial_decay, "polynomial": polynomial_decay}
    try:
        sched = table[kind](**cfg)
    except KeyError as e:
        raise ValueError(
            f"unknown schedule {kind!r}; valid: {sorted(table)}") from e
    return warmup(sched, warmup_steps)


# ------------------------------------------------------------- gradient ops

def global_norm(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def clip_by_global_norm(grads, max_norm: float):
    """Scale the whole gradient tree so its global L2 norm <= max_norm."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale
                                   ).astype(g.dtype), grads), norm


def with_gradient_clipping(opt: Optimizer, max_norm: float) -> Optimizer:
    """Wrap an optimizer so updates see globally-clipped gradients."""

    def update(grads, opt_state, params, step):
        clipped, _ = clip_by_global_norm(grads, max_norm)
        return opt.update(clipped, opt_state, params, step)

    return Optimizer(opt.init, update)


def as_frozen_predicate(frozen):
    """Normalize with_frozen's ``frozen`` argument — a ``(path, param)
    -> bool`` predicate or an iterable of scope-path prefixes — into a
    predicate.  Shared by :func:`with_frozen` and
    ``recipes.make_optimizer`` (which composes the same predicate into
    the inner weight-decay exclusion)."""
    if callable(frozen):
        return frozen
    if isinstance(frozen, str):
        # a bare string would iterate into single-CHARACTER prefixes
        # and silently freeze arbitrary subtrees
        frozen = (frozen,)
    prefixes = tuple(str(p) for p in frozen)
    return lambda path, p, _pre=prefixes: path.startswith(_pre)


def with_frozen(opt: Optimizer, frozen) -> Optimizer:
    """Freeze a subset of parameters (transfer-learning/fine-tuning:
    imported backbone frozen, new head trains).

    ``frozen``: predicate ``(path, param) -> bool`` or an iterable of
    scope-path prefixes (e.g. ``["backbone"]``).  Frozen leaves keep
    their exact values; their gradients are zeroed before the inner
    update.  For momentum/Adam moments to truly stay at rest the inner
    optimizer's *weight decay* must also skip frozen leaves (otherwise
    wd*p still feeds the moments) — pass a matching
    ``weight_decay_exclude`` to the base optimizer;
    ``recipes.make_optimizer`` composes this automatically when the
    config sets ``freeze``.  Wrap OUTSIDE with_gradient_clipping
    (the zeroing must happen before the global norm so the clip
    threshold applies to the trainable subset) and INSIDE with_ema
    (EMA tracks the actually-applied parameters) — recipes.make_optimizer
    composes in this order.
    """
    frozen = as_frozen_predicate(frozen)

    def update(grads, opt_state, params, step):
        mask = _path_mask(params, frozen)
        zeroed = jax.tree.map(
            lambda g, m: jnp.zeros_like(g) if m else g, grads, mask)
        new_p, new_inner = opt.update(zeroed, opt_state, params, step)
        kept = jax.tree.map(lambda p, np_, m: p if m else np_,
                            params, new_p, mask)
        return kept, new_inner

    return Optimizer(opt.init, update)


class LookaheadState(NamedTuple):
    inner: PyTree
    slow: PyTree      # slow weights (f32)
    count: jax.Array  # steps since last sync


def with_lookahead(opt: Optimizer, sync_period: int = 5,
                   slow_step: float = 0.5) -> Optimizer:
    """Lookahead (Zhang et al.): every ``sync_period`` inner steps the
    slow weights move ``slow_step`` of the way toward the fast weights
    and the fast weights reset onto them.  A pure elementwise
    combinator — in-jit, branch-free (the sync is a where-fold on the
    step counter), composes outside any inner optimizer."""

    def init(params):
        slow = jax.tree.map(
            lambda p: jnp.array(p, jnp.float32, copy=True), params)
        return LookaheadState(opt.init(params), slow,
                              jnp.zeros((), jnp.int32))

    def update(grads, opt_state, params, step):
        fast, new_inner = opt.update(grads, opt_state.inner, params, step)
        count = opt_state.count + 1
        sync = count >= sync_period

        def blend(s, f):
            s32 = s.astype(jnp.float32)
            new_slow = s32 + slow_step * (f.astype(jnp.float32) - s32)
            return jnp.where(sync, new_slow, s32)

        new_slow = jax.tree.map(blend, opt_state.slow, fast)
        new_fast = jax.tree.map(
            lambda f, s: jnp.where(sync, s, f.astype(jnp.float32))
            .astype(f.dtype), fast, new_slow)
        new_count = jnp.where(sync, 0, count)
        return new_fast, LookaheadState(new_inner, new_slow, new_count)

    return Optimizer(init, update)


# ------------------------------------------- reduce-on-plateau LR scaling

class PlateauOptState(NamedTuple):
    inner: PyTree
    lr_scale: jax.Array  # f32 scalar, host-adjusted on validation plateau


def with_plateau(opt: Optimizer) -> Optimizer:
    """Wrap an optimizer with a host-controllable LR multiplier.

    The reference's driver decays the learning rate when the validation
    score stops improving (SURVEY.md §2#6: LR schedule updates live in
    the train loop, keyed off the Evaluator).  In-jit schedules are
    functions of the step counter only, so a *data-dependent* decay needs
    a runtime input: this combinator carries an ``lr_scale`` scalar in
    the optimizer state.  Because all core optimizers produce parameter
    deltas proportional to the current LR (momentum/Adam/RMSProp moments
    accumulate raw gradients, never lr-scaled terms), scaling the delta
    ``p + s*(p' - p)`` is exactly equivalent to running the step at
    ``s * lr``.  The host rewrites the scalar leaf between steps
    (:func:`set_plateau_scale`) — same pytree structure, no recompile.

    Composition order: wrap the base optimizer FIRST (innermost), then
    clipping, then :func:`with_ema` — so the EMA tracks the actually
    applied parameters.  ``recipes.make_optimizer`` does this when the
    config asks for ``plateau``.
    """

    def init(params):
        return PlateauOptState(opt.init(params), jnp.ones((), jnp.float32))

    def update(grads, opt_state, params, step):
        new_p, new_inner = opt.update(grads, opt_state.inner, params, step)
        s = opt_state.lr_scale

        def scaled(p, np_):
            pf = p.astype(jnp.float32)
            return (pf + s * (np_.astype(jnp.float32) - pf)).astype(p.dtype)

        return (jax.tree.map(scaled, params, new_p),
                PlateauOptState(new_inner, s))

    return Optimizer(init, update)


def plateau_scale(opt_state) -> float:
    """Current LR multiplier from a with_plateau state (searches through
    known wrappers)."""
    if isinstance(opt_state, PlateauOptState):
        return float(opt_state.lr_scale)
    if isinstance(opt_state, EmaOptState):
        return plateau_scale(opt_state.inner)
    raise ValueError("optimizer state has no plateau scale (wrap the "
                     "optimizer with optim.with_plateau, inside with_ema)")


def set_plateau_scale(opt_state, scale: float):
    """Return the optimizer state with its LR multiplier replaced.  Pure
    host-side leaf rewrite: identical structure/shape/dtype, so the next
    jitted step reuses its compilation."""
    if isinstance(opt_state, PlateauOptState):
        return opt_state._replace(
            lr_scale=jnp.asarray(scale, jnp.float32))
    if isinstance(opt_state, EmaOptState):
        return opt_state._replace(
            inner=set_plateau_scale(opt_state.inner, scale))
    raise ValueError("optimizer state has no plateau scale (wrap the "
                     "optimizer with optim.with_plateau, inside with_ema)")


# ------------------------------------------------- parameter EMA (eval-time)

class EmaOptState(NamedTuple):
    inner: PyTree
    ema: PyTree


def with_ema(opt: Optimizer, decay: float = 0.999) -> Optimizer:
    """Wrap an optimizer so a Polyak average of the parameters rides in
    the optimizer state (and therefore in every checkpoint).  Evaluate /
    serve with :func:`extract_ema`."""

    def init(params):
        return EmaOptState(opt.init(params), ema_init(params))

    def update(grads, opt_state, params, step):
        new_p, new_inner = opt.update(grads, opt_state.inner, params, step)
        new_ema = ema_update(opt_state.ema, new_p, decay)
        return new_p, EmaOptState(new_inner, new_ema)

    return Optimizer(init, update)


def extract_ema(opt_state) -> PyTree:
    """The EMA parameter tree from a with_ema optimizer state (cast back
    to the live params' structure/dtype is the caller's concern — they
    are stored f32)."""
    if not isinstance(opt_state, EmaOptState):
        raise ValueError("optimizer state has no EMA (wrap the optimizer "
                         "with optim.with_ema)")
    return opt_state.ema


def ema_init(params):
    # copy=True: astype on an f32 param would RETURN THE SAME BUFFER,
    # and a donated train step would then see one buffer twice
    # (params + ema) -> runtime donation error
    return jax.tree.map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def ema_update(ema_params, params, decay: float = 0.999):
    """Polyak averaging of parameters (evaluate/serve with the EMA copy —
    the tf.train.ExponentialMovingAverage pattern of the reference era)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32),
        ema_params, params)
