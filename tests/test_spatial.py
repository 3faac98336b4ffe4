"""Spatial partitioning (parallel/spatial.py): halo-exchange convs on an
H-sharded mesh must match the unsharded ops exactly."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from myconvnet_tpu.parallel.mesh import make_mesh
from myconvnet_tpu.parallel.spatial import (halo_conv2d, halo_exchange,
                                            spatial_batch_norm_stats)

N_SHARDS = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_SHARDS:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(N_SHARDS, 1)


def _ref_conv(x, w, stride=1, dilation=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _sharded_conv(mesh, x, w, stride=1, dilation=1):
    f = shard_map(
        functools.partial(halo_conv2d, stride=stride, dilation=dilation,
                          axis_name="data"),
        mesh=mesh, in_specs=(P(None, "data"), P()),
        out_specs=P(None, "data"))
    return jax.jit(f)(x, w)


@pytest.mark.parametrize("kh,kw,stride,dilation", [
    (1, 1, 1, 1),          # pointwise: no halo at all
    (3, 3, 1, 1),          # the workhorse
    (3, 3, 2, 1),          # strided downsample
    (3, 3, 1, 2),          # atrous (DeepLab ASPP)
    (5, 5, 1, 2),          # wide atrous: halo == full shard height
    (7, 7, 2, 1),          # ResNet stem
    (2, 2, 2, 1),          # even kernel, zero SAME pad
])
def test_halo_conv_matches_unsharded(mesh, kh, kw, stride, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(kh, kw, 3, 8).astype(np.float32))
    ref = _ref_conv(x, w, stride, dilation)
    out = _sharded_conv(mesh, x, w, stride, dilation)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_halo_exchange_contents(mesh):
    """Halo rows are exactly the neighbors' boundary rows; frame edges
    are zero."""
    h_local = 4
    x = jnp.arange(N_SHARDS * h_local, dtype=jnp.float32)
    x = jnp.broadcast_to(x[None, :, None, None],
                         (1, N_SHARDS * h_local, 2, 1))

    f = shard_map(lambda b: halo_exchange(b, 2, 1, "data"), mesh=mesh,
                  in_specs=P(None, "data"), out_specs=P(None, "data"))
    out = np.asarray(jax.jit(f)(x))  # [1, 8*(2+4+1), 2, 1]
    out = out.reshape(N_SHARDS, 2 + h_local + 1, 2)[:, :, 0]
    for s in range(N_SHARDS):
        base = s * h_local
        expect_mid = np.arange(base, base + h_local)
        np.testing.assert_array_equal(out[s, 2:6], expect_mid)
        if s == 0:
            np.testing.assert_array_equal(out[s, :2], 0.0)
        else:
            np.testing.assert_array_equal(out[s, :2], [base - 2, base - 1])
        if s == N_SHARDS - 1:
            np.testing.assert_array_equal(out[s, 6:], 0.0)
        else:
            np.testing.assert_array_equal(out[s, 6:], [base + h_local])


def test_halo_conv_gradients_match(mesh):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(_ref_conv(x, w, 1, 1)))

    f = shard_map(functools.partial(halo_conv2d, stride=1, dilation=1,
                                    axis_name="data"),
                  mesh=mesh, in_specs=(P(None, "data"), P()),
                  out_specs=P(None, "data"), check_vma=False)

    def loss_sharded(x, w):
        return jnp.sum(jnp.square(f(x, w)))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_spatial_bn_stats_match_global(mesh):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 16, 8, 5).astype(np.float32))
    mean_ref = jnp.mean(x, axis=(0, 1, 2))
    var_ref = jnp.var(x, axis=(0, 1, 2))

    f = shard_map(lambda b: spatial_batch_norm_stats(b, "data"),
                  mesh=mesh, in_specs=P(None, "data"),
                  out_specs=(P(), P()))
    mean, var = jax.jit(f)(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)


def test_stacked_halo_convs_compose(mesh):
    """Two halo convs back-to-back (stride 2 then dilation 2) — the
    DeepLab backbone pattern — still match the unsharded chain."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 8, 3).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))

    ref = _ref_conv(jax.nn.relu(_ref_conv(x, w1, 2, 1)), w2, 1, 2)

    def block(b, w1, w2):
        y = jax.nn.relu(halo_conv2d(b, w1, stride=2, axis_name="data"))
        return halo_conv2d(y, w2, stride=1, dilation=2, axis_name="data")

    f = shard_map(block, mesh=mesh,
                  in_specs=(P(None, "data"), P(), P()),
                  out_specs=P(None, "data"))
    out = jax.jit(f)(x, w1, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
