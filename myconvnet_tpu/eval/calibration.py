"""Post-hoc confidence calibration: temperature scaling + ECE.

Production classifiers ship calibrated probabilities, not raw softmax
(Guo et al.): a single temperature T fitted on validation NLL fixes
most miscalibration without touching accuracy (argmax is T-invariant).
Pure-JAX: the T fit is a tiny 1-D Newton solve, jittable end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nll(logits: jax.Array, labels: jax.Array,
        temperature: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32)
                              / temperature, axis=-1)
    return -jnp.mean(jnp.take_along_axis(
        logp, labels[:, None].astype(jnp.int32), axis=-1))


def fit_temperature(logits, labels, *, steps: int = 50,
                    init: float = 1.0, max_t: float = 100.0) -> float:
    """Fit T in [1/max_t, max_t] minimizing val NLL (guarded Newton on
    log T — scale-free, converges in a handful of steps).  The cap
    matters for un-trained/garbage models whose true optimum is T→inf
    (uniform probabilities); a bounded T keeps downstream softmax
    finite and meaningful."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)

    def loss_of(log_t):
        return nll(logits, labels, jnp.exp(log_t))

    grad = jax.grad(loss_of)
    hess = jax.grad(lambda t: grad(t))

    @jax.jit
    def solve(log_t0):
        def body(_, log_t):
            g = grad(log_t)
            h = hess(log_t)
            # guarded Newton: fall back to a gradient step on flat spots
            step = jnp.where(jnp.abs(h) > 1e-8, g / h, g)
            log_t = log_t - jnp.clip(step, -1.0, 1.0)
            bound = jnp.log(max_t)
            return jnp.clip(log_t, -bound, bound)
        return jax.lax.fori_loop(0, steps, body, log_t0)

    return float(jnp.exp(solve(jnp.log(jnp.asarray(init, jnp.float32)))))


def expected_calibration_error(logits, labels, *, n_bins: int = 15,
                               temperature: float = 1.0) -> float:
    """Standard ECE: confidence-binned |accuracy - confidence| weighted
    by bin mass."""
    logits = np.asarray(logits, np.float32) / temperature
    labels = np.asarray(labels)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    conf = probs.max(-1)
    correct = probs.argmax(-1) == labels
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    n = len(conf)
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf <= hi)
        if not in_bin.any():
            continue
        ece += (in_bin.sum() / n) * abs(correct[in_bin].mean()
                                        - conf[in_bin].mean())
    return float(ece)
