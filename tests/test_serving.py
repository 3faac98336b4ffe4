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


def test_resolve_bn_eps_picks_trained_eps():
    """The export-path eps resolver recovers the eps a model actually
    trained with (the zoo splits between 1e-5 and 1e-3 — ADVICE r3)."""
    from myconvnet_tpu import nn
    from myconvnet_tpu.serving import resolve_bn_eps

    def make(eps):
        def f(x, train=False):
            # conv/bn naming so fold_batch_norms pairs the scopes
            y = nn.conv(x, 8, 3, use_bias=False, name="conv")
            y = nn.batch_norm(y, train=train, eps=eps, name="bn")
            return nn.relu(y)
        return transform(f)

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    for eps in (1e-5, 1e-3):
        net = make(eps)
        params, state = net.init(jax.random.key(1), x, True)
        # tiny moving variance in one channel makes the wrong-eps fold
        # visibly wrong (rstd off by ~10x there)
        touched = 0
        for scope, vals in state.items():
            if "moving_var" in vals:
                vals["moving_var"] = vals["moving_var"].at[0].set(1e-6)
                touched += 1
        assert touched, f"no moving_var in state scopes {list(state)}"
        fold, got = resolve_bn_eps(net, params, state, x)
        assert fold, f"eps={eps}: resolver refused to fold"
        assert got == eps, f"trained eps {eps}, resolver picked {got}"
    # a float bn_eps checks only that value
    net = make(1e-3)
    params, state = net.init(jax.random.key(1), x, True)
    fold, got = resolve_bn_eps(net, params, state, x, bn_eps=1e-3)
    assert fold and got == 1e-3


def test_export_segmentation_roundtrip(tmp_path):
    """Segmentation artifact (BASELINE #4 family): normalize + forward
    + upsample + argmax in one StableHLO program; reload matches the
    in-process eval forward's argmax."""
    net = transform(lambda x, train=False: models.fcn(
        x, 6, train=train, backbone_depth=18, head_features=16,
        dropout_rate=0.0))
    x01 = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    params, state = net.init(jax.random.key(1), x01, True)
    for i in range(2):
        _, state = net.apply(params, state, jax.random.key(i), x01, True)

    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
    path = str(tmp_path / "seg.bin")
    size = serving.export_segmentation(net, params, state, x01, path,
                                       mean=mean, std=std)
    assert size > 1000
    fn = serving.load_inference(path)
    classes, conf = fn(x01)
    classes, conf = np.asarray(classes), np.asarray(conf)
    assert classes.shape == (2, 32, 32) and classes.dtype == np.int32
    assert conf.shape == (2, 32, 32)
    assert np.all((conf >= 1.0 / 6 - 1e-5) & (conf <= 1.0 + 1e-5))

    xn = (jnp.asarray(x01) - jnp.asarray(mean)) / jnp.asarray(std)
    logits_ref, _ = net.apply(params, state, None, xn, False)
    ref = np.argmax(np.asarray(logits_ref), axis=-1)
    # argmax can legitimately flip where two logits are ~equal under
    # fold rounding; demand near-total agreement instead of exactness
    agree = float(np.mean(ref == classes))
    assert agree > 0.99, f"argmax agreement {agree}"


def test_export_segmentation_int8_calibrated(tmp_path):
    """int8 segmentation export with baked static scales reloads and
    produces a plausible class map."""
    net = transform(lambda x, train=False: models.fcn(
        x, 5, train=train, backbone_depth=18, head_features=16,
        dropout_rate=0.0))
    x01 = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    params, state = net.init(jax.random.key(1), x01, True)
    path = str(tmp_path / "seg8.bin")
    serving.export_segmentation(net, params, state, x01, path,
                                mean=(0.5,) * 3, std=(0.5,) * 3,
                                int8=True,
                                calibrate_with=[np.asarray(x01)])
    classes, conf = serving.load_inference(path)(x01)
    classes = np.asarray(classes)
    assert classes.shape == (2, 32, 32)
    assert classes.min() >= 0 and classes.max() < 5
