"""Shampoo optimizer: preconditioning math, cadence, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.train import optim
from myconvnet_tpu.train.shampoo import ShampooState, _inv_fourth_root, \
    shampoo


def test_inv_fourth_root():
    rs = np.random.RandomState(0)
    a = rs.randn(6, 6).astype(np.float32)
    s = jnp.asarray(a @ a.T + 3 * np.eye(6, dtype=np.float32))
    r = _inv_fourth_root(s, 1e-6)
    # r @ r @ r @ r ~= inv(s + eps I)
    prod = r @ r @ r @ r @ (s + 1e-6 * jnp.eye(6))
    np.testing.assert_allclose(np.asarray(prod), np.eye(6), atol=2e-3)


def test_shampoo_converges_on_ill_conditioned_quadratic():
    """0.5 * w^T A w with condition number 1e3: grafted Shampoo must
    reach a much lower loss than plain momentum at the same lr/steps."""
    rs = np.random.RandomState(0)
    d = 16
    evals = np.logspace(0, 3, d).astype(np.float32)
    q, _ = np.linalg.qr(rs.randn(d, d).astype(np.float32))
    a = jnp.asarray(q * evals @ q.T)
    w0 = {"layer": {"w": jnp.asarray(rs.randn(d, d).astype(np.float32))}}

    def loss_fn(w):
        v = w["layer"]["w"]
        return 0.5 * jnp.sum(v * (a @ v))

    def run(opt, steps=250):
        w = w0
        state = opt.init(w)
        for i in range(steps):
            g = jax.grad(loss_fn)(w)
            w, state = opt.update(g, state, w, jnp.asarray(i))
        return float(loss_fn(w))

    lr = 1e-3
    l_mom = run(optim.momentum(lr, 0.9))
    l_sham = run(shampoo(lr, 0.9, precond_every=5, start_step=20,
                         eps=1e-9))
    assert np.isfinite(l_sham)
    assert l_sham < l_mom * 0.5, (l_sham, l_mom)


def test_shampoo_cadence_and_shapes():
    w = {"conv": {"w": jnp.zeros((3, 3, 4, 8))},
         "bn": {"gamma": jnp.ones((8,))}}
    opt = shampoo(0.1, precond_every=3, max_dim=16)
    state = opt.init(w)
    # conv reshapes to [36, 8]: L is capped off (36 > 16), R active
    leaves = jax.tree.leaves(w)
    i_conv = [i for i, p in enumerate(leaves) if p.ndim == 4][0]
    assert isinstance(state.stats_l[i_conv], tuple)      # capped
    assert state.stats_r[i_conv].shape == (8, 8)
    i_vec = 1 - i_conv
    assert isinstance(state.stats_l[i_vec], tuple)       # rank-1: none
    g = jax.tree.map(jnp.ones_like, w)
    # jit-compiles and the refresh cadence runs under cond
    step = jax.jit(lambda g, s, w, i: opt.update(g, s, w, i))
    w1, s1 = step(g, state, w, jnp.asarray(6))   # past start_step
    w2, s2 = step(g, s1, w1, jnp.asarray(7))
    assert w2["conv"]["w"].shape == (3, 3, 4, 8)
    # off-cadence: cached preconditioner unchanged; on-cadence: refreshed
    np.testing.assert_array_equal(np.asarray(s2.precond_r[i_conv]),
                                  np.asarray(s1.precond_r[i_conv]))
    w3, s3 = step(g, s2, w2, jnp.asarray(9))
    assert not np.allclose(np.asarray(s3.precond_r[i_conv]),
                           np.asarray(s2.precond_r[i_conv]))


def test_shampoo_registry():
    opt = optim.make_optimizer("shampoo", 0.01, precond_every=2)
    p = {"a": {"w": jnp.ones((4, 4))}}
    state = opt.init(p)
    g = {"a": {"w": jnp.ones((4, 4))}}
    p2, _ = opt.update(g, state, p, jnp.asarray(0))
    assert float(jnp.max(p2["a"]["w"])) < 1.0
