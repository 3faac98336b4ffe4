"""Per-block rematerialization (core.module.remat): the checkpointed
model must be EXACTLY the plain model — same params, same outputs, same
gradients, same BN-state updates — with only the backward's memory
schedule changed."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import nn
from myconvnet_tpu.core import module, transform
from myconvnet_tpu.models.resnet import resnet


import pytest


def _net(remat_blocks):
    return transform(lambda x, train=False: resnet(
        x, 10, depth=18, train=train, width=8,
        remat_blocks=remat_blocks))


@pytest.mark.parametrize("mode", [True, "conv"])
def test_resnet_remat_blocks_matches_plain(mode):
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray([3, 7], jnp.int32)
    plain, ckpt = _net(False), _net(mode)
    p0, s0 = plain.init(jax.random.key(0), x, train=True)
    p1, s1 = ckpt.init(jax.random.key(0), x, train=True)
    # init is untouched by remat: identical trees, identical leaves
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(net):
        def f(params, state):
            out, new_state = net.apply(params, state, None, x,
                                       train=True)
            z = jax.nn.log_softmax(out)
            return -jnp.take_along_axis(z, y[:, None], 1).mean(), new_state
        return f

    (l0, ns0), g0 = jax.value_and_grad(loss(plain), has_aux=True)(p0, s0)
    (l1, ns1), g1 = jax.value_and_grad(loss(ckpt), has_aux=True)(p1, s1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # BN moving stats update identically through the checkpoint boundary
    assert jax.tree.structure(ns0) == jax.tree.structure(ns1)
    for a, b in zip(jax.tree.leaves(ns0), jax.tree.leaves(ns1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_remat_rng_bookkeeping():
    """Layers drawing PRNG inside a remat block must consume the same
    stream positions as without it (rng_count replay)."""

    def body(x, train=False):
        def block(h):
            h = jnp.tanh(h @ jnp.ones((4, 4)))
            return nn.dropout(h, 0.5, train=train)

        x = module.remat(block, x)
        return nn.dropout(x, 0.5, train=train)

    def plain(x, train=False):
        x = jnp.tanh(x @ jnp.ones((4, 4)))
        x = nn.dropout(x, 0.5, train=train)
        return nn.dropout(x, 0.5, train=train)

    net_r, net_p = transform(body), transform(plain)
    x = jnp.ones((3, 4))
    pr, sr = net_r.init(jax.random.key(0), x, train=True)
    pp, sp = net_p.init(jax.random.key(0), x, train=True)
    out_r, _ = net_r.apply(pr, sr, jax.random.key(5), x, train=True)
    out_p, _ = net_p.apply(pp, sp, jax.random.key(5), x, train=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               rtol=1e-6)
