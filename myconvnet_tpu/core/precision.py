"""Mixed-precision policy for TPU: bf16 compute, f32 params/statistics.

The reference framework computes in f32 throughout (TF1 defaults).  On TPU
the MXU natively consumes bfloat16, so the rebuild's default *training*
policy is: parameters and optimizer/BN statistics in float32, matmul/conv
inputs cast to bfloat16, accumulation in float32 (XLA accumulates bf16
matmuls in f32 on the MXU).  A pure-f32 policy is kept for parity tests.
"""

from __future__ import annotations

import contextlib
import threading
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32
    # lax precision for conv/dot: HIGHEST under f32 (true-f32 numerics on
    # every backend — some default to bf16-pass lowerings even for f32
    # inputs); DEFAULT under bf16 (inputs are already MXU-native bf16).
    lax_precision: Any = lax.Precision.HIGHEST

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        # tree-aware: models may return tuples/lists (e.g. per-level
        # flow pyramids in train mode)
        import jax
        return jax.tree.map(lambda a: jnp.asarray(a, self.output_dtype), x)


FULL = Policy()
# bf16 compute with f32 params: the standard TPU training policy.
BF16 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
              output_dtype=jnp.float32, lax_precision=lax.Precision.DEFAULT)

_local = threading.local()


def current_policy() -> Policy:
    return getattr(_local, "policy", FULL)


def set_policy(policy: Policy) -> None:
    _local.policy = policy


@contextlib.contextmanager
def policy_scope(policy: Policy):
    prev = current_policy()
    set_policy(policy)
    try:
        yield policy
    finally:
        set_policy(prev)


def get_policy(name: str) -> Policy:
    table = {"f32": FULL, "float32": FULL, "bf16": BF16, "bfloat16": BF16}
    try:
        return table[name]
    except KeyError as e:
        raise ValueError(f"unknown precision policy {name!r}") from e
