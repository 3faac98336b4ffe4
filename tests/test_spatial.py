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


def test_spatial_training_matches_unsharded(mesh):
    """Train a conv->BN->relu->strided-conv->GAP->dense block for several
    SGD steps with H-sharded activations (halo convs + psum BN stats +
    psum GAP): the parameter trajectory must match single-device
    training bit-close.  This is the end-to-end proof that the spatial
    axis is trainable, not just an inference trick."""
    rng = np.random.RandomState(5)
    params = {
        "w1": jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2),
        "gamma": jnp.ones((8,), jnp.float32),
        "beta": jnp.zeros((8,), jnp.float32),
        "w2": jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.2),
        "wd": jnp.asarray(rng.randn(8, 4).astype(np.float32) * 0.2),
    }
    x = jnp.asarray(rng.randn(4, 16, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, 4))

    def block_ref(p, x):
        h = lax.conv_general_dilated(
            x, p["w1"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        mean = jnp.mean(h, axis=(0, 1, 2))
        var = jnp.var(h, axis=(0, 1, 2))
        h = (h - mean) / jnp.sqrt(var + 1e-5) * p["gamma"] + p["beta"]
        h = jax.nn.relu(h)
        h = lax.conv_general_dilated(
            h, p["w2"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.mean(h, axis=(1, 2))          # GAP
        return h @ p["wd"]

    def block_sharded(p, x):
        h = halo_conv2d(x, p["w1"], stride=1, axis_name="data")
        mean, var = spatial_batch_norm_stats(h, "data")
        h = (h - mean) / jnp.sqrt(var + 1e-5) * p["gamma"] + p["beta"]
        h = jax.nn.relu(h)
        h = halo_conv2d(h, p["w2"], stride=2, axis_name="data")
        # GAP over the sharded H axis: local sum + psum, / global count
        total = lax.psum(jnp.sum(h, axis=(1, 2)), "data")
        count = lax.psum(jnp.asarray(h.shape[1] * h.shape[2],
                                     jnp.float32), "data")
        return (total / count) @ p["wd"]

    def loss_of(block):
        def f(p, x, y):
            logits = block(p, x)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(y.shape[0]), y])
        return f

    sharded_loss = shard_map(loss_of(block_sharded), mesh=mesh,
                             in_specs=(P(), P(None, "data"), P()),
                             out_specs=P(), check_vma=False)

    def sgd_run(loss_fn, p):
        losses = []
        step = jax.jit(lambda p, x, y: jax.value_and_grad(loss_fn)(p, x, y))
        for _ in range(5):
            l, g = step(p, x, y)
            losses.append(float(l))
            p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
        return p, losses

    # NOTE: the cotangent of the replicated (P()) loss w.r.t. sharded
    # internals is handled by shard_map's transpose; params stay P().
    def sharded_mean_loss(p, x, y):
        return jnp.mean(sharded_loss(p, x, y))

    p_ref, l_ref = sgd_run(loss_of(block_ref), params)
    p_sh, l_sh = sgd_run(sharded_mean_loss, params)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_sh[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


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
