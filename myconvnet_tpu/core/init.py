"""Weight initializers (He / Glorot / truncated normal / constants).

Mirrors the initializer surface the reference uses for its conv/fc layers
(TF1 ``variance_scaling`` family; mount empty — SURVEY.md §0) as pure
functions of an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, tuple[int, ...], Any], jax.Array]


def _fans(shape: tuple[int, ...]) -> tuple[float, float]:
    if len(shape) < 1:
        return 1.0, 1.0
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = float(shape[-2] * receptive)
    fan_out = float(shape[-1] * receptive)
    return fan_in, fan_out


def variance_scaling(scale: float = 2.0, mode: str = "fan_in",
                     distribution: str = "truncated_normal") -> Initializer:
    def init(key, shape, dtype):
        fan_in, fan_out = _fans(tuple(shape))
        denom = {"fan_in": fan_in, "fan_out": fan_out,
                 "fan_avg": (fan_in + fan_out) / 2.0}[mode]
        variance = scale / max(denom, 1.0)
        if distribution == "truncated_normal":
            # stddev correction for truncation at 2 sigma
            stddev = (variance ** 0.5) / 0.87962566103423978
            return stddev * jax.random.truncated_normal(
                key, -2.0, 2.0, shape, jnp.float32).astype(dtype)
        if distribution == "normal":
            return ((variance ** 0.5) *
                    jax.random.normal(key, shape, jnp.float32)).astype(dtype)
        if distribution == "uniform":
            limit = (3.0 * variance) ** 0.5
            return jax.random.uniform(
                key, shape, jnp.float32, -limit, limit).astype(dtype)
        raise ValueError(f"unknown distribution {distribution!r}")
    return init


def he_normal() -> Initializer:
    return variance_scaling(2.0, "fan_in", "truncated_normal")


def glorot_uniform() -> Initializer:
    return variance_scaling(1.0, "fan_avg", "uniform")


def normal(stddev: float = 0.02) -> Initializer:
    def init(key, shape, dtype):
        return (stddev * jax.random.normal(key, shape, jnp.float32)
                ).astype(dtype)
    return init


def zeros(key, shape, dtype):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype):
    return jnp.ones(shape, dtype)


def constant(value: float) -> Initializer:
    def init(key, shape, dtype):
        return jnp.full(shape, value, dtype)
    return init
