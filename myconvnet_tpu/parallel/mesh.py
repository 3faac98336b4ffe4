"""Device mesh + sharding: the TPU-native replacement for multi-GPU towers.

The reference's only parallelism is in-graph data-parallel towers — the
batch is split across ``tf.device('/gpu:i')`` scopes and tower gradients
are averaged (SURVEY.md §2#12/#13; mount empty).  The TPU-native
equivalent is GSPMD: one program, sharded arrays, and XLA inserts the
gradient all-reduce over ICI.

Mesh axes:
* ``data``  — batch axis (the reference's tower axis).  Gradients
  all-reduce over this axis; laid out innermost so the collective rides
  the fastest ICI ring.
* ``model`` — channel/feature axis for layers big enough to shard
  (classifier heads, wide convs).  A ConvNet is almost always
  data-parallel-dominant; the model axis exists so wide layers *can*
  shard and to exercise real 2-D sharding in tests/dryrun.

Replicated-by-default param sharding with explicit batch-sharded data is
exactly the reference's semantics (every tower holds all variables).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis — the reference's pure-DP
    layout.  ``n_model > 1`` carves an inner model axis (innermost =
    fastest ICI neighbors for the more latency-sensitive model
    collectives).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by n_model="
                             f"{n_model}")
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params: Any,
                   min_shard_size: int = 2 ** 18) -> Any:
    """Sharding tree for a param pytree.

    Rule: replicate everything (reference semantics) except leaves whose
    last axis is wide enough to split over a non-trivial model axis —
    those shard their output-feature axis.  ``min_shard_size`` keeps tiny
    tensors replicated (sharding them would cost more in collective
    latency than it saves).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(p):
        if (n_model > 1 and p.ndim >= 1 and p.size >= min_shard_size
                and p.shape[-1] % n_model == 0):
            spec = [None] * (p.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with its leading axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def spatial_input_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [N, H, W, C] batch over data AND image rows over the model
    axis — GSPMD spatial partitioning.  XLA's SPMD partitioner inserts
    the conv halo exchanges itself (the production counterpart of the
    explicit shard_map halos in ``parallel/spatial.py``); activations
    follow the constraint, so per-chip HBM for 513x513-class tensors
    drops by the model-axis degree."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def process_local_put(mesh: Mesh, batch: Any) -> Any:
    """Assemble a GLOBAL batch-sharded array from this process's local
    slice (multi-host: each host contributes its data-shard; XLA sees one
    global array).  Single-process it equals :func:`shard_batch`.

    Pass as ``device_put_fn`` to the DataSet iterators together with
    ``DataSet.shard()`` for the full multi-host input path.
    """
    sh = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, batch)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel degree {n_data}")
    return global_batch // n_data


def zero_state_sharding(mesh: Mesh, min_size: int = 2 ** 16):
    """Leaf -> NamedSharding rule for ZeRO-style optimizer-state
    sharding: moments/accumulators shard their largest data-axis-
    divisible dimension over ``data``, so per-chip optimizer memory
    drops by the data-parallel degree (params stay replicated — the
    GSPMD partitioner inserts the gathers where updates are consumed;
    this is the ZeRO-2 memory shape expressed as sharding annotations,
    not new collectives code).

    Returns a callable usable both for initial placement
    (``jax.device_put(leaf, rule(leaf))``) and as an in-jit
    ``with_sharding_constraint`` rule.  Leaves smaller than
    ``min_size`` or with no divisible dim stay replicated (sharding
    them buys nothing and costs collective latency).
    """
    n_data = mesh.shape[DATA_AXIS]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if n_data <= 1 or size < min_size:
            return NamedSharding(mesh, P())
        divisible = [d for d in range(len(shape))
                     if shape[d] % n_data == 0 and shape[d] >= n_data]
        if not divisible:
            return NamedSharding(mesh, P())
        axis = max(divisible, key=lambda d: shape[d])
        spec = [None] * len(shape)
        spec[axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return rule
