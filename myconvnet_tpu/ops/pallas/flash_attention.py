"""Pallas TPU kernel: fused multi-head attention (flash-attention form).

Exact (not approximate) attention computed without ever writing the
[L, L] score matrix to HBM.  The reference einsum attention materializes
``softmax(q k^T) : [B, H, L, L]`` — at ViT-L/16 on 512^2 inputs
(L = 1025) that tensor alone is B*16*1025^2*4 bytes per pass; this
kernel keeps every score tile in VMEM and streams only the O(L*D)
inputs/outputs through HBM, which is the speed-of-light traffic for
the op.

Design (vision-transformer regime: L up to a few thousand, head_dim
64-128):

* grid = (B*H, ceil(L / block_q)); each program owns one query block.
* K and V for the (batch, head) are VMEM-resident in full — at
  L = 4096, D = 128, bf16 that is 2 MB, comfortably inside the ~16 MB
  budget, so no online-softmax streaming pass is needed: the score
  tile [block_q, L] is computed in one MXU shot, softmaxed in f32, and
  contracted against V.  (For the million-token regime you would tile
  K as well; vision workloads never get there.)
* The backward pass is two more kernels of the same shape — one
  gridded over query blocks (dQ), one over key blocks (dK, dV) — using
  the saved logsumexp, the standard flash-attention recurrence:

      D_i  = rowsum(dO_i * O_i)
      P    = exp(S - lse)
      dV   = P^T dO
      dS   = P * (dO V^T - D)
      dQ   = dS K * scale,   dK = dS^T Q * scale

Softmax statistics and all matmul accumulations are f32 regardless of
input dtype (bf16 exp/sum over thousands of terms loses mantissa — the
same hazard measured in the detection losses, PERF_NOTES.md).

No reference counterpart (attention is beyond the reference's conv-era
scope; mount empty, SURVEY.md §0) — this is the TPU-native substrate
for the ViT family in ``models/vit.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    # q: [1, bq, D]; k, v: [1, L, D]; o: [1, bq, D]; lse: [1, bq]
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v_ref[0].astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, *,
               scale: float):
    # one query block against full K/V: recompute P, then dQ = dS K.
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0, 0][:, None])
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                dk_ref, dv_ref, *, scale: float):
    # one key block against full Q/dO: dV = P^T dO, dK = dS^T Q.
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0, 0][:, None])       # [L, bk]
    do = do_ref[0].astype(jnp.float32)
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0, 0][:, None])         # [L, bk]
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _block(l: int, cap: int) -> int:
    return min(cap, max(8, l))


def _fwd(q, k, v, scale, block_q, interpret):
    bh, l, d = q.shape
    bq = _block(l, block_q)
    grid = (bh, pl.cdiv(l, bq))
    kernel = functools.partial(_fwd_kernel, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, l), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _bwd(q, k, v, do, o, lse, scale, block_q, interpret):
    bh, l, d = q.shape
    bq = _block(l, block_q)
    # D_i = rowsum(dO * O): cheap elementwise, XLA fuses it — no kernel.
    dl = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)[:, None, :]                       # [BH, 1, L]
    qspec = pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    fullspec = pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    fullrow = pl.BlockSpec((1, 1, l), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(bh, pl.cdiv(l, bq)),
        in_specs=[qspec, fullspec, fullspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, dl)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(bh, pl.cdiv(l, bq)),
        in_specs=[fullspec, qspec, qspec, fullspec, fullrow, fullrow],
        out_specs=[qspec, qspec],
        out_shape=[jax.ShapeDtypeStruct((bh, l, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, l, d), v.dtype)],
        interpret=interpret,
    )(q, k, v, do, lse, dl)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, block_q, interpret):
    out, _ = _fwd(q, k, v, scale, block_q, interpret)
    return out


def _flash_fwd(q, k, v, scale, block_q, interpret):
    out, lse = _fwd(q, k, v, scale, block_q, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, interpret, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd(q, k, v, g, out, lse, scale, block_q, interpret)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float | None = None, block_q: int = 256,
                    interpret: bool | None = None) -> jax.Array:
    """Exact fused attention.  q, k, v: [B, H, L, D] -> [B, H, L, D].

    ``scale`` defaults to 1/sqrt(D).  Differentiable (custom VJP with
    flash backward kernels).  ``interpret`` defaults to True off-TPU so
    CPU tests run the same code path.
    """
    if q.ndim != 4:
        raise ValueError(f"expected [B, H, L, D], got {q.shape}")
    b, h, l, d = q.shape
    if k.shape != (b, h, l, d) or v.shape != (b, h, l, d):
        raise ValueError(f"q/k/v shape mismatch: {q.shape} {k.shape} "
                         f"{v.shape} (cross-length attention unsupported)")
    if scale is None:
        scale = float(d) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _flash(q.reshape(b * h, l, d), k.reshape(b * h, l, d),
                 v.reshape(b * h, l, d), float(scale), int(block_q),
                 bool(interpret))
    return out.reshape(b, h, l, d)
