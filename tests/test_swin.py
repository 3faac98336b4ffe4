"""Swin Transformer: window machinery (exact), mask correctness vs
brute force, forward/training behavior, canonical param count."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

swin_lib = importlib.import_module("myconvnet_tpu.models.swin")

from myconvnet_tpu.core import transform  # noqa: E402
from myconvnet_tpu.models import tinyswin  # noqa: E402


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    for ws in (2, 4):
        w = swin_lib._window_partition(x, ws)
        assert w.shape == (2 * (8 // ws) * (12 // ws), ws * ws, 5)
        back = swin_lib._window_reverse(w, ws, (8, 12), 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_content():
    # the first window of a row-major index grid is the top-left block
    h, w, ws = 4, 4, 2
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    win = np.asarray(swin_lib._window_partition(x, ws))[..., 0]
    np.testing.assert_array_equal(win[0], [0, 1, 4, 5])
    np.testing.assert_array_equal(win[1], [2, 3, 6, 7])


def test_relative_position_index_brute_force():
    ws = 4
    idx = swin_lib._relative_position_index(ws)
    n = ws * ws
    assert idx.shape == (n, n)
    coords = [(i, j) for i in range(ws) for j in range(ws)]
    for a in range(n):
        for b in range(n):
            dy = coords[a][0] - coords[b][0] + ws - 1
            dx = coords[a][1] - coords[b][1] + ws - 1
            assert idx[a, b] == dy * (2 * ws - 1) + dx
    # every entry in table range
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2


def test_shift_mask_blocks_exactly_cross_region_pairs():
    """The cyclic-shift mask must forbid attention exactly between
    tokens that came from different image regions (brute force over the
    rolled region-id grid)."""
    h = w = 8
    ws, shift = 4, 2
    mask = swin_lib._shift_attn_mask((h, w), ws, shift)  # [nW, n, n]

    # brute force: assign region ids on the UNROLLED grid, roll them,
    # partition, compare pairwise
    region = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            region[hs, wsl] = cnt
            cnt += 1
    # NOTE: the model rolls the FEATURES by -shift; the mask is built on
    # unrolled coordinates whose region labels align with the rolled
    # windows (the paper's construction). Reproduce the partition:
    win = region.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    for k in range(win.shape[0]):
        want_blocked = win[k][None, :] != win[k][:, None]
        got_blocked = mask[k] < -1e8
        np.testing.assert_array_equal(got_blocked, want_blocked)
    # unblocked entries are exactly 0
    assert np.all(mask[mask > -1e8] == 0.0)


def test_tinyswin_forward_and_determinism():
    fwd = transform(lambda x, train: tinyswin(x, 10, train=train,
                                              dropout=0.1))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params, state = fwd.init(rng, x, True)
    out, _ = fwd.apply(params, state, rng, x, True)
    assert out.shape == (2, 10)
    e1, _ = fwd.apply(params, state, None, x, False)
    e2, _ = fwd.apply(params, state, None, x, False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_tinyswin_memorizes_batch():
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train import optim

    fwd = transform(lambda x, train=False: tinyswin(x, 4, train=train))
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    y = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3])
    params, state = fwd.init(rng, x, True)
    opt = optim.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state, i):
        def loss_fn(p):
            logits, new_s = fwd.apply(p, state, None, x, True)
            return softmax_cross_entropy(logits, y), new_s
        (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        p2, o2 = opt.update(g, opt_state, params, i)
        return p2, new_s, o2, loss

    first = None
    for i in range(60):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              jnp.asarray(i))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))


def test_swin_rejects_bad_geometry():
    with pytest.raises(ValueError):
        transform(lambda x: swin_lib.swin(x, 10, variant="nope")).init(
            jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    with pytest.raises(ValueError):
        transform(lambda x: tinyswin(x, 10)).init(
            jax.random.PRNGKey(0), jnp.ones((1, 33, 33, 3)))


@pytest.mark.slow
def test_swin_t_canonical_param_count():
    fwd = transform(lambda x: swin_lib.swin_t(x, 1000))
    params, _ = fwd.init(jax.random.PRNGKey(0),
                         jnp.ones((1, 224, 224, 3)))
    n = sum(int(np.prod(p.shape)) for b in params.values()
            for p in b.values())
    assert n == 28_288_354  # torchvision swin_t / paper Swin-T