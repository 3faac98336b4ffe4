"""DDPM/DDIM training and sampling (seventh task family; the reference
has no diffusion path — mount empty, SURVEY.md §0 — this extends the
generative family beyond train/gan.py).

Training is ONE jitted program per step: sample timesteps, form the
noised x_t with the closed-form forward marginal, predict epsilon,
MSE in f32, optimizer update, EMA update — no host round-trips beyond
the metric fetch the Trainer already amortizes.

Sampling is a single ``lax.scan`` over the (possibly strided) timestep
sequence — the whole reverse process is ONE XLA program, not T Python
dispatches.  The update implements generalized DDIM (Song et al.,
2021): ``eta=0`` is deterministic DDIM; ``eta=1`` over the full
sequence reproduces ancestral DDPM sampling (Ho et al., 2020).

Schedules: ``linear`` (Ho et al.) and ``cosine`` (Nichol & Dhariwal,
2021), precomputed on host as f64 numpy then frozen into the program
as f32 constants — no per-step schedule math on device beyond a gather.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.train.optim import Optimizer


class Schedule(NamedTuple):
    """Forward-process constants, all [T] f32."""
    betas: np.ndarray
    alphas_bar: np.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(kind: str = "linear", num_steps: int = 1000,
                  beta_start: float = 1e-4,
                  beta_end: float = 0.02) -> Schedule:
    t = np.arange(num_steps, dtype=np.float64)
    if kind == "linear":
        betas = beta_start + (beta_end - beta_start) * t / (num_steps - 1)
    elif kind == "cosine":
        # alpha_bar follows cos^2; betas derived and clipped (N&D 2021)
        s = 0.008
        f = np.cos((t / num_steps + s) / (1 + s) * np.pi / 2) ** 2
        f_next = np.cos(((t + 1) / num_steps + s) / (1 + s)
                        * np.pi / 2) ** 2
        betas = np.clip(1.0 - f_next / f, 0.0, 0.999)
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    alphas_bar = np.cumprod(1.0 - betas)
    return Schedule(betas.astype(np.float32),
                    alphas_bar.astype(np.float32))


def q_sample(sched: Schedule, x0: jax.Array, t: jax.Array,
             eps: jax.Array) -> jax.Array:
    """Forward marginal: x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps."""
    ab = jnp.asarray(sched.alphas_bar)[t]
    ab = ab.reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps


class DiffusionState(NamedTuple):
    params: Any
    model_state: Any
    ema_params: Any
    opt: Any
    step: jax.Array
    rng: jax.Array  # key data


def init_diffusion_state(model: Transformed, opt: Optimizer,
                         rng: jax.Array, sample_x: jax.Array,
                         num_classes: int = 0) -> DiffusionState:
    t0 = jnp.zeros((sample_x.shape[0],), jnp.int32)
    y0 = (jnp.zeros((sample_x.shape[0],), jnp.int32)
          if num_classes > 0 else None)
    params, state = model.init(rng, sample_x, t0, y0, True)
    # EMA starts at the init weights but must be a DISTINCT buffer:
    # the donated step would otherwise see the same buffer twice
    ema = jax.tree.map(lambda p: p.copy(), params)
    return DiffusionState(params, state, ema, opt.init(params),
                          jnp.zeros((), jnp.int32),
                          jax.random.key_data(rng))


def make_ddpm_step(model: Transformed, opt: Optimizer, sched: Schedule,
                   ema_decay: float = 0.9999, num_classes: int = 0,
                   uncond_prob: float = 0.1) -> Callable:
    """(state, batch) -> (state, metrics): one fused noise-prediction
    MSE step + EMA track.  Unconditional: batch = x0 [-1,1].
    Conditional (num_classes>0): batch = (x0, y); labels drop to the
    null token with ``uncond_prob`` — classifier-free guidance training
    (Ho & Salimans, 2022) — so ONE model serves both branches."""
    T = sched.num_steps

    def step(state: DiffusionState, batch):
        if num_classes > 0:
            x0, y = batch
        else:
            x0, y = batch, None
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        kt, ke, km, ku = jax.random.split(key, 4)
        n = x0.shape[0]
        t = jax.random.randint(kt, (n,), 0, T)
        eps = jax.random.normal(ke, x0.shape, x0.dtype)
        xt = q_sample(sched, x0, t, eps)
        if num_classes > 0:
            drop = jax.random.bernoulli(ku, uncond_prob, (n,))
            y = jnp.where(drop, num_classes, y.astype(jnp.int32))

        def loss_fn(params):
            pred, mstate = model.apply(params, state.model_state, km,
                                       xt, t, y, True)
            # f32 reduction: a bf16 sum over N*H*W*C terms loses the
            # mantissa bits the gradient signal lives in (same hazard
            # as the detection losses, train/fcos.py)
            loss = jnp.mean(jnp.square(pred.astype(jnp.float32)
                                       - eps.astype(jnp.float32)))
            return loss, mstate

        (loss, mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state = opt.update(grads, state.opt, state.params,
                                       state.step)
        # EMA warmup: effective decay min(decay, (1+step)/(10+step))
        # so early steps track fast instead of anchoring to init
        d = jnp.minimum(ema_decay,
                        (1.0 + state.step) / (10.0 + state.step))
        ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                           state.ema_params, params)
        new = DiffusionState(params, mstate, ema, opt_state,
                             state.step + 1, state.rng)
        return new, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_sampler(model: Transformed, sched: Schedule, *,
                 shape: tuple, sample_steps: int | None = None,
                 eta: float = 0.0, use_ema: bool = True,
                 num_classes: int = 0,
                 guidance_scale: float = 0.0) -> Callable:
    """Returns ``sample(state, n, seed, y=None) -> uint8 [n,H,W,C]``.

    The reverse process runs as one ``lax.scan`` over a strided
    timestep subsequence (``sample_steps`` of the trained T; None =
    all T).  eta=0 -> DDIM; eta=1 + full sequence -> ancestral DDPM.

    Conditional models (num_classes>0) take ``y`` int labels (default:
    ``arange(n) % num_classes``, a class-spread grid).  With
    ``guidance_scale`` w > 0, each step evaluates the conditional and
    null branches in ONE doubled-batch apply and extrapolates
    ``(1+w)*eps_cond - w*eps_null`` (classifier-free guidance).
    """
    T = sched.num_steps
    steps = sample_steps or T
    # strided subsequence t_K > ... > t_1 >= 0, and the predecessor of
    # each (the "t-1" the update targets; -1 means "clean")
    seq = np.linspace(0, T - 1, steps).round().astype(np.int32)
    prev = np.concatenate([[-1], seq[:-1]]).astype(np.int32)
    ab = jnp.asarray(sched.alphas_bar)
    ab_prev_of = jnp.where(jnp.asarray(prev) < 0, 1.0,
                           ab[jnp.maximum(jnp.asarray(prev), 0)])
    ts = jnp.asarray(seq)[::-1]
    ab_prevs = ab_prev_of[::-1]

    def sample(state, n: int, seed: int = 0, y=None):
        params = state.ema_params if use_ema else state.params
        mstate = state.model_state
        key = jax.random.key(seed)
        kx, kn = jax.random.split(key)
        x = jax.random.normal(kx, (n,) + tuple(shape), jnp.float32)
        if num_classes > 0:
            yb = (jnp.arange(n, dtype=jnp.int32) % num_classes
                  if y is None else jnp.asarray(y, jnp.int32))
        else:
            yb = None

        def eps_of(x, tb):
            if num_classes > 0 and guidance_scale > 0.0:
                null = jnp.full((n,), num_classes, jnp.int32)
                e, _ = model.apply(params, mstate, None,
                                   jnp.concatenate([x, x]),
                                   jnp.concatenate([tb, tb]),
                                   jnp.concatenate([yb, null]), False)
                e_c, e_u = jnp.split(e.astype(jnp.float32), 2)
                return ((1.0 + guidance_scale) * e_c
                        - guidance_scale * e_u)
            e, _ = model.apply(params, mstate, None, x, tb, yb, False)
            return e.astype(jnp.float32)

        def body(x, inp):
            t, ab_prev = inp
            tb = jnp.full((n,), t, jnp.int32)
            eps = eps_of(x, tb)
            ab_t = ab[t]
            x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) * jax.lax.rsqrt(ab_t)
            x0 = jnp.clip(x0, -1.0, 1.0)
            sigma = (eta * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
                     * jnp.sqrt(1.0 - ab_t / ab_prev))
            # direction coefficient in f32; clamp for the last step
            # where ab_prev=1 makes the sqrt argument exactly 0
            dir_coef = jnp.sqrt(jnp.maximum(
                1.0 - ab_prev - jnp.square(sigma), 0.0))
            noise = jax.random.normal(
                jax.random.fold_in(kn, t), x.shape, jnp.float32)
            x_next = (jnp.sqrt(ab_prev) * x0 + dir_coef * eps
                      + sigma * noise)
            return x_next, ()

        x, _ = jax.lax.scan(body, x, (ts, ab_prevs))
        # uint8 conversion matches utils.images.to_uint8 (round, not
        # truncate) so diffusion and GAN samples quantize identically
        x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        return (x01 * 255.0 + 0.5).astype(jnp.uint8)

    # only n is genuinely static (shapes); seed traces into the key so
    # a seed-per-batch FID loop reuses ONE compiled reverse process
    return jax.jit(sample, static_argnums=(1,), static_argnames=("n",))


def make_ddim_export_chain(model: Transformed, sched: Schedule, *,
                           sample_steps: int | None = None,
                           num_classes: int = 0,
                           guidance_scale: float = 0.0) -> Callable:
    """The eta=0 DDIM reverse process as a PURE function
    ``chain(params, mstate, z, y) -> [0,1] f32 images`` — the
    exportable (StableHLO) form of :func:`make_sampler`'s scan.

    Deterministic by construction (DDIM's sigma is 0, so the ancestral
    noise term vanishes); stochastic eta>0 sampling would need a seed
    input and stays an in-process consumer.  ``y`` is ignored for
    unconditional models; conditional ones take int labels (guidance
    per ``guidance_scale``, same doubled-batch trick as the sampler).
    """
    T = sched.num_steps
    steps = sample_steps or T
    seq = np.linspace(0, T - 1, steps).round().astype(np.int32)
    prev = np.concatenate([[-1], seq[:-1]]).astype(np.int32)
    ab = jnp.asarray(sched.alphas_bar)
    ab_prev_of = jnp.where(jnp.asarray(prev) < 0, 1.0,
                           ab[jnp.maximum(jnp.asarray(prev), 0)])
    ts = jnp.asarray(seq)[::-1]
    ab_prevs = ab_prev_of[::-1]

    def chain(params, mstate, z, y=None):
        n = z.shape[0]
        yb = None
        if num_classes > 0:
            yb = (jnp.arange(n, dtype=jnp.int32) % num_classes
                  if y is None else jnp.asarray(y, jnp.int32))

        def eps_of(x, tb):
            if num_classes > 0 and guidance_scale > 0.0:
                null = jnp.full((n,), num_classes, jnp.int32)
                e, _ = model.apply(params, mstate, None,
                                   jnp.concatenate([x, x]),
                                   jnp.concatenate([tb, tb]),
                                   jnp.concatenate([yb, null]), False)
                e_c, e_u = jnp.split(e.astype(jnp.float32), 2)
                return ((1.0 + guidance_scale) * e_c
                        - guidance_scale * e_u)
            e, _ = model.apply(params, mstate, None, x, tb, yb, False)
            return e.astype(jnp.float32)

        def body(x, inp):
            t, ab_prev = inp
            tb = jnp.full((n,), t, jnp.int32)
            eps = eps_of(x, tb)
            ab_t = ab[t]
            x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) * jax.lax.rsqrt(ab_t)
            x0 = jnp.clip(x0, -1.0, 1.0)
            x_next = (jnp.sqrt(ab_prev) * x0
                      + jnp.sqrt(jnp.maximum(1.0 - ab_prev, 0.0)) * eps)
            return x_next, ()

        x, _ = jax.lax.scan(body, z.astype(jnp.float32),
                            (ts, ab_prevs))
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)

    return chain
