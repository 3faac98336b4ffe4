"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference is single-node data-parallel only (SURVEY.md §2#12) — this
module goes beyond it with the third classic scaling axis, for models
whose layers do not fit one chip.  TPU-native shape:

* S stages laid out on S devices along a mesh axis; each device holds
  ONLY its stage's parameters (the stacked stage pytree is sharded on
  its leading axis).
* One ``lax.scan`` over M + S - 1 ticks; per tick every device applies
  its stage and the activation moves one hop with ``lax.ppermute`` —
  nearest-neighbor ICI traffic, the textbook TPU pipeline.
* Microbatches hide the bubble: utilization = M / (M + S - 1).

Restrictions (deliberate, they keep the program a single fused scan):
the inter-stage activation shape must be uniform (equal-width stages),
and all M microbatches share one static shape.  Backward works through
the scan/ppermute transpose — the whole fwd+bwd pipeline is ONE XLA
program, no per-stage dispatch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

PIPELINE_AXIS = "model"


def pipeline_apply(stage_fn: Callable[[Any, jax.Array], jax.Array],
                   stage_params: Any, x: jax.Array, *,
                   axis_name: str = PIPELINE_AXIS) -> jax.Array:
    """Run microbatches through a device pipeline. Call inside shard_map.

    stage_fn: (params_for_one_stage, activation [mb, ...]) -> same-shape
    activation.  stage_params: pytree whose leaves have a leading stage
    axis of LOCAL size 1 (sharded over ``axis_name``).  x: microbatched
    input [M, mb, ...] (replicated; only stage 0 reads it).

    Returns [M, mb, ...] outputs, replicated over the axis (masked psum
    from the last stage).
    """
    n_stages = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    params_local = jax.tree.map(lambda p: p[0], stage_params)
    m = x.shape[0]
    ticks = m + n_stages - 1

    # pad the input stream with zeros for the drain phase
    pad = jnp.zeros((n_stages - 1, *x.shape[1:]), x.dtype)
    stream = jnp.concatenate([x, pad], axis=0)           # [ticks, mb, ...]

    shift_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, x_t):
        # carry: activation arriving from the previous stage this tick
        inp = jnp.where(idx == 0, x_t, carry)
        out = stage_fn(params_local, inp)
        # last stage emits; everyone else forwards one hop
        nxt = lax.ppermute(out, axis_name, shift_perm)
        emit = jnp.where(idx == n_stages - 1, out, jnp.zeros_like(out))
        return nxt, emit

    _, emitted = lax.scan(tick, jnp.zeros_like(x[0]), stream)
    # microbatch j leaves the last stage at tick j + S - 1
    outs = emitted[n_stages - 1:]                        # [M, mb, ...]
    # replicate the result (only the last stage holds nonzeros)
    return lax.psum(outs, axis_name)


def run_pipeline(mesh, stage_fn: Callable, stage_params: Any,
                 x: jax.Array, *, microbatches: int,
                 axis_name: str = PIPELINE_AXIS) -> jax.Array:
    """Convenience wrapper: shard the stage axis, split x into
    microbatches, run the pipeline, merge back.

    stage_params: pytree with leading axis == number of pipeline stages
    (mesh axis size).  x: [B, ...] with B % microbatches == 0.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape[axis_name]
    b = x.shape[0]
    assert b % microbatches == 0, (b, microbatches)
    xm = x.reshape(microbatches, b // microbatches, *x.shape[1:])

    def body(params, xm):
        return pipeline_apply(stage_fn, params, xm, axis_name=axis_name)

    assert stage_params and jax.tree.leaves(stage_params)[0].shape[0] \
        == n_stages, "leading param axis must equal the stage count"
    spec_params = jax.tree.map(lambda _: P(axis_name), stage_params)
    f = shard_map(body, mesh=mesh,
                  in_specs=(spec_params, P()), out_specs=P(),
                  check_vma=False)
    out = f(stage_params, xm)
    return out.reshape(b, *out.shape[2:])
