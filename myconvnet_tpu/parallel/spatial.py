"""Spatial partitioning: shard the image H axis across devices.

The reference has no spatial parallelism (SURVEY.md §2: only DP towers
exist) — but its DeepLabv3+ workload (513x513, output-stride 16) is the
one place a single chip's HBM becomes the scaling wall.  The TPU-native
answer is to shard the *spatial* axis of activations over the mesh and
exchange convolution halos over ICI — the image-domain analogue of
sequence/context parallelism.  This module provides that axis as a
first-class capability:

* ``halo_exchange``    — ppermute neighbor rows (the only communication
  a stride-aligned conv needs; rides nearest-neighbor ICI links).
* ``halo_conv2d``      — 2-D conv on H-sharded NHWC blocks, numerically
  identical to the unsharded op (tests prove bit-equality on an 8-way
  virtual mesh).
* ``spatial_batch_norm_stats`` — cross-shard (N, H, W) moments via psum,
  so BN under spatial sharding matches global semantics.

All functions are written to run inside ``jax.shard_map`` over a named
mesh axis; they are pure and jit-safe.  Shard-count requirements: H must
divide evenly and each shard must hold at least the halo width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

SPATIAL_AXIS = "data"  # default: reuse the data axis of the 2-D mesh


def _axis_index(axis_name: str) -> jax.Array:
    return lax.axis_index(axis_name)


def halo_exchange(x: jax.Array, halo_lo: int, halo_hi: int,
                  axis_name: str) -> jax.Array:
    """Concatenate neighbor halo rows onto an H-sharded block.

    x: [N, H_local, W, C] (this device's rows).  Returns
    [N, halo_lo + H_local + halo_hi, W, C]: the last ``halo_lo`` rows of
    the previous shard above, the first ``halo_hi`` rows of the next
    shard below; frame boundaries are zero-padded (SAME-conv semantics).

    Communication: two ``ppermute`` shifts — nearest-neighbor traffic
    that XLA maps onto adjacent ICI links.
    """
    n_shards = lax.psum(1, axis_name)
    idx = _axis_index(axis_name)
    parts = []
    if halo_lo > 0:
        # receive the bottom halo_lo rows of the shard ABOVE (idx-1)
        send = x[:, -halo_lo:, :, :]
        perm = [(i, i + 1) for i in range(n_shards - 1)]
        recv = lax.ppermute(send, axis_name, perm)  # zeros into shard 0
        recv = jnp.where(idx > 0, recv, jnp.zeros_like(recv))
        parts.append(recv)
    parts.append(x)
    if halo_hi > 0:
        send = x[:, :halo_hi, :, :]
        perm = [(i + 1, i) for i in range(n_shards - 1)]
        recv = lax.ppermute(send, axis_name, perm)
        recv = jnp.where(idx < n_shards - 1, recv, jnp.zeros_like(recv))
        parts.append(recv)
    return jnp.concatenate(parts, axis=1)


def halo_conv2d(x: jax.Array, w: jax.Array, *, stride: int = 1,
                dilation: int = 1, axis_name: str = SPATIAL_AXIS
                ) -> jax.Array:
    """SAME-padded 2-D conv on an H-sharded NHWC block.

    x: [N, H_local, W, C_in] shard, w: [kh, kw, C_in, C_out] (HWIO,
    replicated).  Equivalent to ``lax.conv_general_dilated`` with SAME
    padding on the gathered image, re-sharded — but only the halo rows
    move.  Requires H_local % stride == 0 (every shard starts on a
    stride phase boundary — true when H divides evenly, the same
    constraint XLA's own SPMD partitioner imposes).
    """
    kh, kw = w.shape[0], w.shape[1]
    eff_kh = (kh - 1) * dilation + 1
    eff_kw = (kw - 1) * dilation + 1
    # SAME padding of the GLOBAL axes (sizes divisible by stride):
    # total = eff_k - stride, split TF-style lo = total//2
    pad_h = max(eff_kh - stride, 0)
    pad_lo, pad_hi = pad_h // 2, pad_h - pad_h // 2
    pad_w = max(eff_kw - stride, 0)
    xp = halo_exchange(x, pad_lo, pad_hi, axis_name)
    # each shard's first output row is global row idx*H_local — stride-
    # aligned because H_local % stride == 0 — so VALID conv on the
    # halo-extended block reproduces the global SAME conv exactly
    return lax.conv_general_dilated(
        xp, w, window_strides=(stride, stride),
        padding=((0, 0), (pad_w // 2, pad_w - pad_w // 2)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spatial_batch_norm_stats(x: jax.Array, axis_name: str = SPATIAL_AXIS
                             ) -> tuple[jax.Array, jax.Array]:
    """Global (N, H, W) mean/var of an H-sharded activation via psum —
    BN statistics identical to the unsharded computation."""
    n_local = x.shape[0] * x.shape[1] * x.shape[2]
    s = lax.psum(jnp.sum(x, axis=(0, 1, 2)), axis_name)
    ss = lax.psum(jnp.sum(jnp.square(x), axis=(0, 1, 2)), axis_name)
    count = lax.psum(jnp.asarray(n_local, x.dtype), axis_name)
    mean = s / count
    var = ss / count - jnp.square(mean)
    return mean, var


def shard_spatial(mesh, x: jax.Array):
    """Device-put [N, H, W, C] with H sharded over the spatial axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(x, NamedSharding(mesh, P(None, SPATIAL_AXIS)))
