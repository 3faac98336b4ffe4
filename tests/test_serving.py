"""Frozen-inference export: fold -> export -> reload -> same outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu import models, serving
from myconvnet_tpu.core import transform


def test_export_roundtrip(tmp_path):
    net = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params, state = net.init(jax.random.key(1), x, True)
    # perturb BN stats so folding is non-trivial
    for i in range(2):
        _, state = net.apply(params, state, jax.random.key(i), x, True)

    y_ref, _ = net.apply(params, state, None, x, False)
    path = str(tmp_path / "model.bin")
    size = serving.export_inference(net, params, state, x, path,
                                    bn_eps=1e-3)
    assert size > 1000
    fn = serving.load_inference(path)
    y = fn(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                               atol=1e-4)


def test_make_inference_fn_no_fold_matches():
    net = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    x = jnp.ones((1, 32, 32, 3))
    params, state = net.init(jax.random.key(0), x, False)
    fn = serving.make_inference_fn(net, params, state, fold_bn=False)
    y_ref, _ = net.apply(params, state, None, x, False)
    np.testing.assert_allclose(np.asarray(jax.jit(fn)(x)),
                               np.asarray(y_ref), rtol=1e-6)


def test_load_inference_bad_file(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"not a stablehlo artifact")
    import pytest
    from myconvnet_tpu import serving as sv
    with pytest.raises(Exception):
        sv.load_inference(p)("x")
