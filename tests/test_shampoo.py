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


@pytest.mark.slow
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


# ---------------------------------------------------------------- blocked

def test_tile_roundtrip():
    from myconvnet_tpu.train.shampoo import _from_tiles, _to_tiles
    rs = np.random.RandomState(0)
    for m, n, b in ((27, 64, 16), (16, 16, 16), (5, 33, 8)):
        gm = jnp.asarray(rs.randn(m, n).astype(np.float32))
        bm, bn = -(-m // b), -(-n // b)
        t = _to_tiles(gm, m, n, bm, bn, b)
        assert t.shape == (bm * bn, b, b)
        back = _from_tiles(t, m, n, bm, bn, b)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(gm))


@pytest.mark.slow
def test_blocked_beats_capped_on_large_axis_ill_conditioned():
    """The VERDICT r1 #7 criterion: a conv-shaped problem whose LARGE
    axis is ill-conditioned.  Capped shampoo (max_dim below that axis)
    leaves it unpreconditioned; blocked shampoo partitions and
    preconditions it, converging to a much lower loss."""
    from myconvnet_tpu.train.shampoo import blocked_shampoo
    rs = np.random.RandomState(1)
    d = 48                                   # the "large" axis
    evals = np.logspace(0, 3, d).astype(np.float32)
    q, _ = np.linalg.qr(rs.randn(d, d).astype(np.float32))
    a = jnp.asarray(q * evals @ q.T)
    w0 = {"conv": {"w": jnp.asarray(rs.randn(d, 4).astype(np.float32))}}

    def loss_fn(w):
        v = w["conv"]["w"]
        return 0.5 * jnp.sum(v * (a @ v))

    def run(opt, steps=250):
        w = w0
        state = opt.init(w)
        step = jax.jit(lambda g, s, w, i: opt.update(g, s, w, i))
        for i in range(steps):
            g = jax.grad(loss_fn)(w)
            w, state = step(g, state, w, jnp.asarray(i))
        return float(loss_fn(w))

    lr = 1e-3
    # cap below 48: the ill-conditioned axis falls back to identity
    l_capped = run(shampoo(lr, 0.9, precond_every=5, start_step=20,
                           max_dim=16, eps=1e-9))
    # blocks of 16 partition the 48-axis into 3 preconditioned blocks
    l_blocked = run(blocked_shampoo(lr, 0.9, block_size=16,
                                    precond_every=5, start_step=20,
                                    eps=1e-9))
    assert np.isfinite(l_blocked)
    assert l_blocked < l_capped * 0.5, (l_blocked, l_capped)


@pytest.mark.slow
def test_blocked_matches_unblocked_when_axes_fit_one_block():
    """With block_size >= both axes, blocked runs the same per-axis
    algorithm.  Trajectories agree closely but not bitwise: the padded
    tile's eps-degenerate eigenspace can rotate into the real block's
    eps-scale eigenvalues while the statistics are still tiny (eigh is
    free to mix degenerate subspaces), so early preconditioners differ
    at the percent level before the spectra separate."""
    from myconvnet_tpu.train.shampoo import blocked_shampoo
    rs = np.random.RandomState(2)
    w0 = {"fc": {"w": jnp.asarray(rs.randn(12, 8).astype(np.float32))},
          "bn": {"g": jnp.asarray(rs.randn(8).astype(np.float32))}}
    tgt = jnp.asarray(rs.randn(12, 8).astype(np.float32))

    def loss_fn(w):
        return 0.5 * jnp.sum((w["fc"]["w"] - tgt) ** 2) \
            + 0.5 * jnp.sum(w["bn"]["g"] ** 2)

    def run(opt, steps=30):
        w = w0
        state = opt.init(w)
        out = []
        for i in range(steps):
            g = jax.grad(loss_fn)(w)
            w, state = opt.update(g, state, w, jnp.asarray(i))
            out.append(float(loss_fn(w)))
        return np.asarray(out)

    la = run(shampoo(0.01, 0.9, precond_every=3, start_step=6,
                     max_dim=64, eps=1e-8))
    lb = run(blocked_shampoo(0.01, 0.9, block_size=16, precond_every=3,
                             start_step=6, eps=1e-8))
    np.testing.assert_allclose(la, lb, rtol=5e-2, atol=1e-6)


def test_blocked_shampoo_registry_and_mesh():
    from myconvnet_tpu.parallel.mesh import make_mesh
    opt = optim.make_optimizer("blocked_shampoo", 0.01, block_size=8,
                               precond_every=2, mesh=make_mesh(8, 1))
    p = {"a": {"w": jnp.ones((10, 12))}}
    state = opt.init(p)
    g = {"a": {"w": jnp.ones((10, 12))}}
    step = jax.jit(lambda g, s, p, i: opt.update(g, s, p, i))
    p2, s2 = step(g, state, p, jnp.asarray(4))  # past start -> refresh
    assert p2["a"]["w"].shape == (10, 12)
    assert np.isfinite(np.asarray(p2["a"]["w"])).all()
    # tile axis: 2x2 grid of 8-blocks = 4 tiles
    assert s2.stats_l.shape == (4, 8, 8)
