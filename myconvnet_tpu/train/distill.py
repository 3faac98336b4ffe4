"""Knowledge distillation: one jitted teacher+student step.

Classic Hinton-style KD for the classification zoo: a frozen teacher's
temperature-softened distribution supervises the student alongside the
hard labels.  TPU shape follows the package's GAN precedent — teacher
forward (no grad), student forward+backward and the optimizer update all
live in ONE XLA program, so the teacher costs a forward pass fused into
the same step (no second dispatch, activations shared with nothing).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.core.module import Transformed
from myconvnet_tpu.train.optim import Optimizer
from myconvnet_tpu.train.trainer import TrainState


def distillation_loss(student_logits: jax.Array,
                      teacher_logits: jax.Array,
                      labels: jax.Array, *, temperature: float = 4.0,
                      alpha: float = 0.9,
                      label_smoothing: float = 0.0) -> jax.Array:
    """alpha * T^2 * KL(teacher_T || student_T) + (1-alpha) * CE(labels).

    The T^2 factor keeps the soft-target gradient magnitude independent
    of temperature (Hinton et al. §2).
    """
    from myconvnet_tpu.train.losses import softmax_cross_entropy

    sl = student_logits.astype(jnp.float32)
    tl = teacher_logits.astype(jnp.float32)
    log_p_s = jax.nn.log_softmax(sl / temperature, axis=-1)
    p_t = jax.nn.softmax(tl / temperature, axis=-1)
    kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - log_p_s),
                 axis=-1)
    soft = jnp.mean(kl) * (temperature ** 2)
    hard = softmax_cross_entropy(sl, labels,
                                 label_smoothing=label_smoothing)
    return alpha * soft + (1.0 - alpha) * hard


class DistillState(NamedTuple):
    student: TrainState
    teacher_params: Any
    teacher_state: Any


def make_distill_step(student: Transformed, teacher: Transformed,
                      optimizer: Optimizer, *, temperature: float = 4.0,
                      alpha: float = 0.9,
                      augment_fn: Callable | None = None) -> Callable:
    """Jitted ``step(state: DistillState, (x, y)) -> (state, metrics)``.

    ``augment_fn(key, x, y) -> (x, y)`` runs once; teacher and student
    see the SAME augmented view (the standard KD setup).  The teacher is
    evaluated in inference mode and never updated.
    """

    def step(state: DistillState, batch):
        x, y = batch
        st = state.student
        key = jax.random.fold_in(jax.random.wrap_key_data(st.rng),
                                 st.step)
        k_aug, k_model = jax.random.split(key)
        if augment_fn is not None:
            x, y = augment_fn(k_aug, x, y)
        t_logits, _ = teacher.apply(state.teacher_params,
                                    state.teacher_state, None, x, False)
        t_logits = jax.lax.stop_gradient(t_logits)

        def loss_fn(params, mstate):
            s_logits, new_mstate = student.apply(params, mstate, k_model,
                                                 x, True)
            loss = distillation_loss(s_logits, t_logits, y,
                                     temperature=temperature, alpha=alpha)
            return loss, (new_mstate, s_logits)

        (loss, (new_mstate, s_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params, st.model_state)
        new_params, new_opt = optimizer.update(grads, st.opt_state,
                                               st.params, st.step)
        metrics = {
            "loss": loss,
            "accuracy": jnp.mean((jnp.argmax(s_logits, -1) == y)
                                 .astype(jnp.float32)),
            "teacher_agreement": jnp.mean(
                (jnp.argmax(s_logits, -1) == jnp.argmax(t_logits, -1))
                .astype(jnp.float32)),
        }
        new_student = st._replace(params=new_params,
                                  model_state=new_mstate,
                                  opt_state=new_opt, step=st.step + 1)
        return DistillState(new_student, state.teacher_params,
                            state.teacher_state), metrics

    return jax.jit(step, donate_argnums=(0,))
