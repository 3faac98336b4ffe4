"""Two-conv VMEM-resident Pallas pair vs the two-lax.conv reference.

Interpret-mode (CPU) correctness; the on-chip A/B lives in
tools/ab_pallas_conv_pair.py and its verdict in PERF_NOTES.md round 5.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from myconvnet_tpu.ops.pallas.conv_pair import (  # noqa: E402
    conv1x1_conv3x3_bn_relu, conv_pair_reference)


@pytest.mark.parametrize("g", [1, 2])
def test_conv_pair_matches_lax(g):
    rng = np.random.RandomState(0)
    n, h, w, cin, cm, co = 2, 5, 4, 16, 8, 8
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(1, 1, cin, cm) * 0.2, jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, cm, co) * 0.1, jnp.bfloat16)
    s1 = jnp.asarray(rng.rand(cm) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(cm) * 0.1, jnp.float32)
    s3 = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
    b3 = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    ref = conv_pair_reference(x, w1, s1, b1, w3, s3, b3)
    with pltpu.force_tpu_interpret_mode():
        out = conv1x1_conv3x3_bn_relu(x, w1, s1, b1, w3, s3, b3,
                                      images_per_block=g)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08)
