"""RandAugment: op formulas, branch-free dispatch, chain integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.data import randaugment as ra


def _img(seed=0, n=4, hw=16):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, hw, hw, 3).astype(np.float32))


def test_zero_magnitude_identity_for_signed_ops():
    x = _img()
    zero = jnp.zeros((x.shape[0], 1, 1, 1))
    for name in ("color", "contrast", "brightness", "sharpness",
                 "translate_x", "translate_y"):
        y = ra.POOL[name](x, zero)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5,
                                   err_msg=name)


def test_unsigned_op_formulas():
    x = _img()
    full = jnp.ones((x.shape[0], 1, 1, 1))
    np.testing.assert_allclose(ra.op_invert(x, full), 1.0 - x, atol=1e-6)
    # solarize at |m|=1: threshold 0 -> everything inverts
    np.testing.assert_allclose(ra.op_solarize(x, full), 1.0 - x, atol=1e-6)
    # posterize at |m|=1 keeps 4 bits -> at most 16 distinct levels/channel
    q = np.asarray(ra.op_posterize(x, full))
    assert len(np.unique(np.round(q * 255).astype(int))) <= 16
    # autocontrast stretches each image's range to [0, 1]
    ac = np.asarray(ra.op_autocontrast(x, full))
    np.testing.assert_allclose(ac.min(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(ac.max(axis=(1, 2)), 1.0, atol=1e-5)


def test_translate_shifts_and_fills():
    # single white column at x=3; shift right by 1/3 of width (mag 1)
    x = jnp.zeros((1, 6, 6, 1)).at[:, :, 3].set(1.0)
    full = jnp.ones((1, 1, 1, 1))
    y = np.asarray(ra.op_translate_x(x, -full))  # negative shift: out[i]=in[i-2]
    assert y[0, 0, 5, 0] == 1.0  # column moved 3 -> 5
    assert np.all(y[0, :, :2, 0] == 0.5)  # vacated edge gets gray fill
    y2 = np.asarray(ra.op_translate_x(x, full))  # out[i] = in[i+2]
    assert y2[0, 0, 1, 0] == 1.0


def test_rand_augment_dispatch_matches_direct_op():
    """With a single-op pool the fold must equal calling the op."""
    x = _img()
    key = jax.random.key(3)
    y = ra.rand_augment(key, x, num_layers=1, magnitude=12.0,
                        ops=("invert",))
    np.testing.assert_allclose(np.asarray(y), 1.0 - np.asarray(x),
                               atol=1e-6)


def test_rand_augment_jits_and_is_deterministic():
    x = _img()
    f = jax.jit(lambda k, x: ra.rand_augment(k, x, num_layers=2,
                                             magnitude=9.0))
    y1 = f(jax.random.key(0), x)
    y2 = f(jax.random.key(0), x)
    y3 = f(jax.random.key(1), x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    assert float(jnp.min(y1)) >= 0.0 and float(jnp.max(y1)) <= 1.0


def test_chain_integration():
    from myconvnet_tpu.data.augment import AugmentConfig, augment_train
    cfg = AugmentConfig(out_hw=(16, 16), area_range=None, pad=2,
                        randaugment=(2, 9), mean=(0.5, 0.5, 0.5),
                        std=(0.25, 0.25, 0.25))
    imgs = np.random.RandomState(0).randint(
        0, 256, (4, 16, 16, 3), np.uint8)
    out = jax.jit(lambda k, x: augment_train(k, x, cfg))(
        jax.random.key(0), jnp.asarray(imgs))
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_op_raises():
    with pytest.raises(KeyError):
        ra.rand_augment(jax.random.key(0), _img(), ops=("histogram_magic",))


def test_pallas_backend_matches_xla_on_shared_pool():
    """Same key + same op subset: the pallas kernel layer must reproduce
    the XLA where-fold bit-for-bit (modulo fp rounding)."""
    from myconvnet_tpu.ops.pallas.randaugment_ew import PALLAS_POOL

    x = _img(n=4, hw=16)
    key = jax.random.key(7)
    y_xla = ra.rand_augment(key, x, num_layers=2, magnitude=11.0,
                            ops=PALLAS_POOL, backend="xla")
    y_pl = ra.rand_augment(key, x, num_layers=2, magnitude=11.0,
                           backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               atol=1e-5)


def test_pallas_backend_rejects_lane_crossing_ops():
    with pytest.raises(ValueError, match="lane-crossing"):
        ra.rand_augment(jax.random.key(0), _img(), backend="pallas",
                        ops=("color",), interpret=True)


def test_pallas_kernel_each_op_matches_reference():
    from myconvnet_tpu.ops.pallas.randaugment_ew import (PALLAS_POOL,
                                                         apply_layer)
    x = _img(n=4, hw=16)
    mag = jnp.asarray([0.3, -0.3, 0.9, 0.0], jnp.float32)
    for k, name in enumerate(PALLAS_POOL):
        idx = jnp.full((4,), k, jnp.int32)
        y = apply_layer(x, idx, mag, interpret=True)
        m = mag[:, None, None, None]
        ref = ra.POOL[name](x, m if name in ra.SIGNED else jnp.abs(m))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-5, err_msg=name)


def test_equalize_matches_pil_exactly():
    """op_equalize reproduces PIL ImageOps.equalize bit-for-bit on
    8-bit content (incl. the step==0 / single-level no-op cases)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    from PIL import ImageOps

    rs = np.random.RandomState(0)
    imgs = [
        (rs.rand(24, 20, 3) ** 2 * 255).astype(np.uint8),   # skewed
        (rs.rand(24, 20, 3) * 255).astype(np.uint8),        # uniform
        np.full((24, 20, 3), 77, np.uint8),                 # single level
        np.clip(rs.randn(24, 20, 3) * 20 + 128, 0,
                255).astype(np.uint8),                      # narrow
    ]
    x = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
    out = np.asarray(ra.op_equalize(x, jnp.zeros((4, 1, 1, 1))))
    got = np.round(out * 255.0).astype(np.int32)
    for i, img in enumerate(imgs):
        want = np.asarray(ImageOps.equalize(
            PIL_Image.fromarray(img)), np.int32)
        np.testing.assert_array_equal(got[i], want, err_msg=f"img {i}")


def test_equalize_in_pool_and_jit():
    assert "equalize" in ra.CANONICAL_OPS and "equalize" in ra.POOL
    x = _img()
    y = jax.jit(lambda x: ra.op_equalize(x, None))(x)
    assert np.isfinite(np.asarray(y)).all()


def test_canonical_pool_runs():
    """The paper's full 14-op pool (geometry + equalize included) runs
    jitted end to end; the default pool stays the cheap subset."""
    assert set(ra.CANONICAL_OPS) <= set(ra.POOL)
    assert len(ra.CANONICAL_OPS) == 14
    x = _img(n=2, hw=16)
    y = jax.jit(lambda k, x: ra.rand_augment(
        k, x, num_layers=1, magnitude=9.0,
        ops=ra.CANONICAL_OPS))(jax.random.key(0), x)
    assert np.isfinite(np.asarray(y)).all()


def test_chain_canonical_ops_knob():
    """AugmentConfig(randaugment_ops='canonical') routes the chain
    through the paper's 14-op pool."""
    from myconvnet_tpu.data.augment import AugmentConfig, augment_train
    cfg = AugmentConfig(out_hw=(16, 16), area_range=None, pad=2,
                        randaugment=(1, 9), randaugment_ops="canonical",
                        mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 16, 16, 3), np.uint8)
    out = jax.jit(lambda k, x: augment_train(k, x, cfg))(
        jax.random.key(0), jnp.asarray(imgs))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_autoaugment_runs_and_is_deterministic():
    x = _img(n=4, hw=16)
    f = jax.jit(lambda k, x: ra.auto_augment(k, x))
    y1 = f(jax.random.key(0), x)
    y2 = f(jax.random.key(0), x)
    y3 = f(jax.random.key(1), x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    assert float(jnp.min(y1)) >= 0.0 and float(jnp.max(y1)) <= 1.0


def test_autoaugment_single_subpolicy_semantics():
    """A one-row custom policy with p=1 must equal applying its two ops
    in sequence (up to the random magnitude sign)."""
    x = _img(n=3, hw=12)
    table = ((("invert", 1.0, None), ("equalize", 1.0, None)),)
    y = ra.auto_augment(jax.random.key(5), x, policy=table)
    want = ra.op_equalize(ra.op_invert(x, None), None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-6)
    # p=0 on both steps -> identity
    table0 = ((("invert", 0.0, None), ("equalize", 0.0, None)),)
    y0 = ra.auto_augment(jax.random.key(5), x, policy=table0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_autoaugment_policy_table_well_formed():
    for row in ra.AUTOAUGMENT_IMAGENET:
        assert len(row) == 2
        for name, p, lv in row:
            assert name in ra.POOL, name
            assert 0.0 <= p <= 1.0
            assert lv is None or 0 <= lv <= 9


def test_chain_autoaugment_knob():
    from myconvnet_tpu.data.augment import AugmentConfig, augment_train
    cfg = AugmentConfig(out_hw=(16, 16), area_range=None, pad=2,
                        autoaugment="imagenet",
                        mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 16, 16, 3), np.uint8)
    out = jax.jit(lambda k, x: augment_train(k, x, cfg))(
        jax.random.key(0), jnp.asarray(imgs))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="not both"):
        bad = AugmentConfig(out_hw=(16, 16), area_range=None,
                            randaugment=(2, 9), autoaugment="imagenet")
        augment_train(jax.random.key(0), jnp.asarray(imgs), bad)


def test_validation_errors_are_helpful():
    from myconvnet_tpu.data.augment import AugmentConfig, augment_train
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (2, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="named pools"):
        augment_train(jax.random.key(0), imgs,
                      AugmentConfig(out_hw=(16, 16), area_range=None,
                                    randaugment=(1, 9),
                                    randaugment_ops="Canonical"))
    with pytest.raises(ValueError, match="registered"):
        ra.auto_augment(jax.random.key(0),
                        jnp.zeros((1, 8, 8, 3)), policy="cifar10")
    # "fast" named pool works
    out = augment_train(jax.random.key(0), imgs,
                        AugmentConfig(out_hw=(16, 16), area_range=None,
                                      randaugment=(1, 9),
                                      randaugment_ops="fast"))
    assert np.isfinite(np.asarray(out)).all()
