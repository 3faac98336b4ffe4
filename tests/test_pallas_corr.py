"""Forward-only Pallas correlation-volume kernel vs the XLA op.

The kernel is an EXPERIMENT record (measured ~1.1x on chip; module
docstring carries the full verdict) — this test locks its forward
semantics in interpret mode.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from myconvnet_tpu.ops.correlation import correlation_volume  # noqa: E402
from myconvnet_tpu.ops.pallas.correlation import (  # noqa: E402
    pallas_correlation_volume)


@pytest.mark.parametrize("d", [1, 2])
def test_pallas_corr_matches_xla(d):
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 8, 6, 4
    f1 = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    f2 = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    ref = correlation_volume(f1, f2, max_displacement=d)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_correlation_volume(f1, f2, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
