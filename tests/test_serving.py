"""Frozen-inference export: fold -> export -> reload -> same outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_batched_server_buckets_and_chunks():
    from myconvnet_tpu.serving import make_batched_server

    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2.0

    serve = make_batched_server(fn, batch_sizes=(2, 4))
    for n in (1, 2, 3, 4, 5, 9):
        x = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
        out = serve(x)
        assert out.shape == (n, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    # only bucket shapes ever reach the compiled fn (trace-time shapes)
    assert set(calls) <= {2, 4}
    import pytest
    with pytest.raises(ValueError):
        serve(jnp.zeros((0, 3)))


def test_batched_server_on_real_model():
    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.serving import make_batched_server, \
        make_inference_fn

    net = transform(lambda x, train=False: models.smallnet(
        x, 4, train=train, width=4, dropout_rate=0.0))
    x0 = jnp.zeros((2, 16, 16, 3))
    params, state = net.init(jax.random.key(0), x0, False)
    fn = make_inference_fn(net, params, state, fold_bn=True, bn_eps=1e-3)
    serve = make_batched_server(fn, batch_sizes=(4,))
    x = jnp.asarray(np.random.RandomState(0).rand(6, 16, 16, 3)
                    .astype(np.float32))
    out = serve(x)
    ref = fn(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=5e-5)


@pytest.mark.slow
def test_int8_export_reload(tmp_path):
    """The quantized inference program exports/reloads as StableHLO and
    agrees with the live int8 path."""
    from myconvnet_tpu import models, serving
    from myconvnet_tpu.core import transform

    net = transform(lambda x, train=False: models.smallnet(
        x, 4, train=train, width=4, dropout_rate=0.0))
    x0 = jnp.zeros((2, 16, 16, 3))
    params, state = net.init(jax.random.key(1), x0, False)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 3)
                    .astype(np.float32))
    live = serving.make_inference_fn(net, params, state, bn_eps=1e-3,
                                     int8=True)(x)
    path = str(tmp_path / "int8.stablehlo")
    size = serving.export_inference(net, params, state, x0, path,
                                    bn_eps=1e-3, int8=True)
    assert size > 0
    out = serving.load_inference(path)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-4, atol=1e-5)


def test_measure_latency_shape_and_sanity():
    import jax.numpy as jnp

    from myconvnet_tpu.serving import make_batched_server, measure_latency

    def fn(x):
        return jnp.sum(x, axis=(1, 2, 3))

    serve = make_batched_server(fn, batch_sizes=(4, 16))
    stats = measure_latency(serve, (8, 8, 3), request_sizes=(1, 4, 20),
                            iters=5, warmup=1)
    assert set(stats) == {1, 4, 20}
    for n, row in stats.items():
        assert row["p50"] <= row["p95"] <= row["p99"]
        assert row["mean"] > 0 and row["qps"] > 0
        # qps counts requests; images_per_sec scales with the batch
        np.testing.assert_allclose(row["images_per_sec"],
                                   n * row["qps"], rtol=1e-6)


def test_batched_server_chunk_remainders_and_padding():
    """Every request size maps to the right compute: padding pads, big
    requests chunk through the largest bucket, remainders pad again."""
    import jax.numpy as jnp

    from myconvnet_tpu.serving import make_batched_server

    calls = []

    def fn(x):
        calls.append(int(x.shape[0]))
        return jnp.sum(x, axis=(1, 2, 3))

    serve = make_batched_server(fn, batch_sizes=(4, 8))
    xs = np.arange(11 * 2 * 2 * 1, dtype=np.float32).reshape(11, 2, 2, 1)
    out = np.asarray(serve(xs))
    # 11 = 8 + 3(pad->4); outputs exact per example
    np.testing.assert_allclose(out, xs.sum(axis=(1, 2, 3)), rtol=1e-6)
    assert all(c in (4, 8) for c in calls)
    # single example pads to the smallest bucket
    np.testing.assert_allclose(np.asarray(serve(xs[:1])),
                               xs[:1].sum(axis=(1, 2, 3)), rtol=1e-6)
    import pytest
    with pytest.raises(ValueError):
        serve(xs[:0])
