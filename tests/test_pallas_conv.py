"""Fused im2col conv3x3+BN+ReLU Pallas kernel vs lax reference.

Interpret-mode (CPU) correctness; the on-chip A/B lives in
tools/ab_pallas_conv.py and its verdict in PERF_NOTES.md round 3.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from myconvnet_tpu.ops.pallas.conv_fused import (  # noqa: E402
    conv3x3_bn_relu, conv3x3_bn_relu_reference)


@pytest.mark.parametrize("g", [1, 2])
def test_conv3x3_bn_relu_matches_lax(g):
    rng = np.random.RandomState(0)
    n, h, w, c, co = 2, 5, 4, 8, 8
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.bfloat16)
    sc = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    ref = conv3x3_bn_relu_reference(x, w3, sc, b)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_bn_relu(x, w3, sc, b, images_per_block=g)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)
