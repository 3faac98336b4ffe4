"""Numerical gradient checks (SURVEY.md §4: jax.test_util.check_grads).

The fused BN backward is the one hand-derived custom_vjp in the ops
layer — its analytic gradients must match finite differences.  The
halo-exchange conv's shard_map gradients get the same treatment (the
collective-permute transpose rule is easy to get subtly wrong).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from myconvnet_tpu.ops.batch_norm import batch_norm_train


@pytest.mark.slow
def test_fused_bn_train_grads_match_finite_differences():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(4, 5, 5, 3).astype(np.float32) * 2 - 1)
    gamma = jnp.asarray(rs.rand(3).astype(np.float32) + 0.5)
    beta = jnp.asarray(rs.rand(3).astype(np.float32))

    def f(x, gamma, beta):
        y, mean, var = batch_norm_train(x, gamma, beta, 1e-5)
        # fold the returned statistics in too: their gradients feed the
        # moving-average update path
        return jnp.sum(y ** 2) + jnp.sum(mean) + jnp.sum(var)

    # f32 finite differences bottom out around 1% on sums of O(100);
    # the tight analytic check against a reference formula is below
    with jax.default_matmul_precision("highest"):
        check_grads(f, (x, gamma, beta), order=1, modes=("rev",),
                    atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_fused_bn_vjp_matches_reference_formula_grads():
    """Tight check: the hand-derived custom_vjp equals JAX autodiff of
    the plain jnp BN formula (analytic vs analytic, f32)."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(4, 5, 5, 3).astype(np.float32) * 2 - 1)
    gamma = jnp.asarray(rs.rand(3).astype(np.float32) + 0.5)
    beta = jnp.asarray(rs.rand(3).astype(np.float32))
    ct = jnp.asarray(rs.rand(4, 5, 5, 3).astype(np.float32))

    def ref_bn(x, gamma, beta):
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta

    def loss_fused(x, gamma, beta):
        y, _, _ = batch_norm_train(x, gamma, beta, 1e-5)
        return jnp.sum(y * ct)

    def loss_ref(x, gamma, beta):
        return jnp.sum(ref_bn(x, gamma, beta) * ct)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_halo_conv_grads_match_finite_differences():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from myconvnet_tpu.parallel.mesh import make_mesh
    from myconvnet_tpu.parallel.spatial import halo_conv2d

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, 8, 4, 2).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 2, 2).astype(np.float32) * 0.5)

    conv = shard_map(
        functools.partial(halo_conv2d, stride=1, axis_name="data"),
        mesh=mesh, in_specs=(P(None, "data"), P()),
        out_specs=P(None, "data"))

    def f(x, w):
        return jnp.sum(conv(x, w) ** 2)

    with jax.default_matmul_precision("highest"):
        check_grads(f, (x, w), order=1, modes=("rev",), atol=2e-2,
                    rtol=2e-2)
