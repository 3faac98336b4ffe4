"""RepVGG: train-architecture forward, deploy re-parameterization
exactness, paper param counts, and the serving-export roundtrip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myconvnet_tpu import models  # noqa: E402
from myconvnet_tpu.core import transform  # noqa: E402
import importlib  # noqa: E402

rv = importlib.import_module("myconvnet_tpu.models.repvgg")


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_repvgg_a0_deploy_param_count():
    """Paper Table: RepVGG-A0 deploys at ~8.31M params (1000 cls)."""
    net = transform(lambda x, train=False: models.repvgg_a0(
        x, 1000, train=train))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 64, 64, 3)), True)
    dep = rv.deploy_params(params, state)
    n = _count(dep)
    assert abs(n - 8.31e6) / 8.31e6 < 0.01, n


def test_repvgg_deploy_matches_eval_forward():
    """The folded 3x3-only deploy net must reproduce the multi-branch
    architecture's eval forward exactly (BN moving stats exercised by
    a few train steps first)."""
    kw = dict(a=0.125, b=0.25, stages=(1, 1, 2, 2, 1))
    net = transform(lambda x, train=False: rv.repvgg(
        x, 7, train=train, **kw))
    x0 = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params, state = net.init(jax.random.key(1), x0, True)
    for i in range(3):   # move the BN statistics off their init
        _, state = net.apply(params, state, jax.random.key(i),
                             jax.random.normal(jax.random.key(10 + i),
                                               (2, 32, 32, 3)), True)
    ref, _ = net.apply(params, state, None, x0, False)

    dep_net = transform(lambda x, train=False: rv.repvgg_deploy(
        x, 7, train=train, **kw))
    dp, ds = dep_net.init(jax.random.key(2), x0, False)
    folded = rv.deploy_params(params, state)
    assert set(folded) == set(dp), (sorted(folded), sorted(dp))
    out, _ = dep_net.apply(folded, ds, None, x0, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_repvgg_trains_and_serves(tmp_path):
    """ConvNet-API smoke + the deploy artifact through serving."""
    from myconvnet_tpu import recipes, serving

    cfg = dict(task="classification", model="tinyrepvgg",
               model_kwargs={}, dataset="cifar10", data_dir=None,
               num_classes=10, input_hw=(32, 32), batch_size=8,
               total_steps=2, seed=0, precision="f32",
               optimizer=dict(name="momentum", momentum_coef=0.9,
                              lr=0.05),
               augment=dict(out_hw=(32, 32), area_range=None,
                            flip=True))
    net, tr, _va = recipes.build_classifier(cfg, synthetic=True)
    net.train(tr, batch_size=8, total_steps=2,
              optimizer=recipes.make_optimizer(cfg["optimizer"]))
    folded = rv.deploy_params(net.state.params, net.state.model_state)
    dep_net = transform(lambda x, train=False: rv.repvgg_deploy(
        x, 10, train=train, a=0.125, b=0.25, stages=(1, 1, 2, 2, 1)))
    _dp, ds = dep_net.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), False)
    path = str(tmp_path / "repvgg.bin")
    size = serving.export_inference(
        dep_net, folded, ds, np.zeros((4, 32, 32, 3), np.float32),
        path)
    assert size > 1000
    fn = serving.load_inference(path)
    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
    ref, _ = dep_net.apply(folded, ds, None, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
