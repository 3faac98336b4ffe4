"""Recurrent layers for sequence heads (CRNN's BiLSTM — the OCR
family; the reference framework has no recurrent ops, SURVEY.md §2;
mount empty, §0).

TPU mapping: the input projection ``x @ Wx`` for ALL timesteps is ONE
``[N*T, D] x [D, 4H]`` matmul hoisted out of the recurrence (the MXU
eats it in one tiling), so the ``lax.scan`` body carries only the
``[N, H] x [H, 4H]`` recurrent matmul + elementwise gates.  State is
static-shape; the scan unrolls nothing and jits into the surrounding
program.

Precision: gates and state compute in f32 regardless of the active
policy — a bf16 cell state accumulates visible drift over long
sequences for no bandwidth win (the state is tiny next to the conv
activations), matching the repo's loss-in-f32 discipline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import auto_name, param, scope
from myconvnet_tpu.core.precision import current_policy


def _orthogonal(key, shape, dtype):
    """Orthogonal init for the recurrent kernel (standard LSTM
    practice: keeps the recurrent Jacobian near-isometric at step 0)."""
    rows, cols = shape
    n = max(rows, cols)
    a = jax.random.normal(key, (n, n), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))[None, :]
    return q[:rows, :cols].astype(dtype)


def lstm(x: jax.Array, hidden: int, *, reverse: bool = False,
         name: str = "lstm") -> jax.Array:
    """Unidirectional LSTM: ``[N, T, D] -> [N, T, H]``.

    Gate order i, f, g, o (torch convention); the forget gate carries
    a +1 pre-activation bias (unit_forget_bias — Jozefowicz et al.,
    2015).  ``reverse=True`` runs right-to-left (the sequence is
    flipped around the scan, outputs flipped back).
    """
    pol = current_policy()
    d = x.shape[-1]
    with scope(auto_name(name)):
        wx = param("wx", (d, 4 * hidden), pol.param_dtype,
                   init.glorot_uniform())
        wh = param("wh", (hidden, 4 * hidden), pol.param_dtype,
                   _orthogonal)
        b = param("b", (4 * hidden,), pol.param_dtype, init.zeros)
    # whole-sequence input projection: one MXU matmul outside the scan
    xw = jnp.dot(pol.cast_to_compute(x), pol.cast_to_compute(wx),
                 precision=pol.lax_precision).astype(jnp.float32)
    xw = xw + b.astype(jnp.float32)
    wh32 = wh.astype(jnp.float32)

    xw_t = jnp.swapaxes(xw, 0, 1)                       # [T, N, 4H]
    if reverse:
        xw_t = xw_t[::-1]
    n = x.shape[0]
    h0 = jnp.zeros((n, hidden), jnp.float32)
    c0 = jnp.zeros((n, hidden), jnp.float32)

    def step(carry, xw_step):
        h, c = carry
        gates = xw_step + jnp.dot(h, wh32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = (jax.nn.sigmoid(f + 1.0) * c
             + jax.nn.sigmoid(i) * jnp.tanh(g))
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), xw_t)          # [T, N, H]
    if reverse:
        ys = ys[::-1]
    return jnp.swapaxes(ys, 0, 1).astype(pol.compute_dtype)


def bilstm(x: jax.Array, hidden: int, *, name: str = "bilstm"
           ) -> jax.Array:
    """Bidirectional LSTM: ``[N, T, D] -> [N, T, 2H]`` (forward and
    backward passes concatenated per frame — the CRNN sequence head)."""
    with scope(auto_name(name)):
        fwd = lstm(x, hidden, name="fwd")
        bwd = lstm(x, hidden, reverse=True, name="bwd")
    return jnp.concatenate([fwd, bwd], axis=-1)
