"""GPipe pipeline (parallel/pipeline.py): sharded stage execution must
match sequentially applying the stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.parallel.mesh import make_mesh
from myconvnet_tpu.parallel.pipeline import run_pipeline

N_STAGES = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2 * N_STAGES:
        pytest.skip("needs >=8 virtual devices (2-way data x 4 stages)")
    # 2-way data x 4-way pipeline over the 8 CPU devices
    return make_mesh(2, N_STAGES)


def _stage(params, x):
    w, b = params
    return jax.nn.relu(x @ w + b)


def _params(seed, d=16):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(N_STAGES, d, d).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(N_STAGES, d).astype(np.float32) * 0.1)
    return (w, b)


def _sequential(params, x):
    w, b = params
    for s in range(N_STAGES):
        x = _stage((w[s:s + 1][0], b[s:s + 1][0]), x)
    return x


@pytest.mark.parametrize("microbatches", [4, 8])
def test_pipeline_matches_sequential(mesh, microbatches):
    params = _params(0)
    x = jnp.asarray(np.random.RandomState(1).randn(16, 16)
                    .astype(np.float32))
    ref = _sequential(params, x)
    out = jax.jit(lambda p, x: run_pipeline(
        mesh, _stage, p, x, microbatches=microbatches))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match(mesh):
    params = _params(2)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 16)
                    .astype(np.float32))

    def loss_ref(p):
        return jnp.mean(jnp.square(_sequential(p, x)))

    def loss_pipe(p):
        return jnp.mean(jnp.square(run_pipeline(
            mesh, _stage, p, x, microbatches=4)))

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_single_stage_degenerates(mesh):
    """S=1 on a 1-wide model axis: the pipeline is just the stage fn."""
    mesh1 = make_mesh(8, 1)
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(1, 16, 16).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(1, 16).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    ref = _stage((w[0], b[0]), x)
    out = run_pipeline(mesh1, _stage, (w, b), x, microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------
# Heterogeneous GPipe on a REAL model (round 2, VERDICT r1 #4)
# ------------------------------------------------------------------

def _vgg_setup(n_stages, num_classes=7, hw=16, batch=8):
    from myconvnet_tpu.models.staged import init_stage_params, vgg_stages
    from myconvnet_tpu.parallel.pipeline import stack_stage_params

    stage_aps, stage_inits = vgg_stages(num_classes, 16, n_stages)
    x = jax.random.normal(jax.random.key(0), (batch, hw, hw, 3))
    mb = x[: batch // 4]
    params = init_stage_params(stage_aps, stage_inits,
                               jax.random.key(1), mb)
    flat, metas = stack_stage_params(params)
    return stage_aps, params, flat, metas, x


@pytest.mark.slow
def test_hetero_pipeline_matches_sequential_forward():
    """Pipelined VGG-16 forward == running the same stages in sequence
    (same params, f32 buffers) — the machinery is exact."""
    from myconvnet_tpu.parallel.pipeline import pipeline_hetero

    n_stages = 4
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("model",))
    stage_aps, params, flat, metas, x = _vgg_setup(n_stages)

    ref = x
    for ap, p in zip(stage_aps, params):
        ref = ap(p, ref)

    out = pipeline_hetero(mesh, stage_aps, flat, metas, x,
                          microbatches=4, axis_name="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_hetero_pipeline_roundtrips_params():
    from myconvnet_tpu.parallel.pipeline import (stack_stage_params,
                                                 unstack_stage_params)
    _, params, flat, metas, _ = _vgg_setup(2)
    back = unstack_stage_params(flat, metas)
    for a, b in zip(params, back):
        ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(ja) == len(jb)
        for la, lb in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(la),
                                          np.asarray(lb))


@pytest.mark.slow
def test_hetero_pipeline_train_step_matches_unpipelined():
    """A real VGG-16 trains pipelined over 4 virtual devices: the
    fused pipelined train step produces the same loss trajectory as
    plain (unpipelined) training of the same stages."""
    from myconvnet_tpu.parallel.pipeline import make_pipelined_train_step
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy

    n_stages = 4
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("model",))
    stage_aps, params, flat, metas, x = _vgg_setup(n_stages)
    y = jax.random.randint(jax.random.key(2), (x.shape[0],), 0, 7)

    opt = optim.momentum(0.05, 0.9)
    step = make_pipelined_train_step(
        mesh, stage_aps, metas, softmax_cross_entropy, opt,
        microbatches=4)

    # reference: same stages, same opt, sequential forward
    def ref_loss(fp):
        h = x
        for i, ap in enumerate(stage_aps):
            from myconvnet_tpu.parallel.pipeline import _unflatten_params
            h = ap(_unflatten_params(fp[i], metas[i]), h)
        return softmax_cross_entropy(h.astype(jnp.float32), y)

    @jax.jit
    def ref_step(fp, opt_state, i):
        loss, g = jax.value_and_grad(ref_loss)(fp)
        new_p, new_o = opt.update(g, opt_state, fp, i)
        return new_p, new_o, loss

    fp_a = flat
    fp_b = flat
    os_a = opt.init(fp_a)
    os_b = opt.init(fp_b)
    for i in range(3):
        fp_a, os_a, loss_a = step(fp_a, os_a, x, y,
                                  jnp.asarray(i, jnp.int32))
        fp_b, os_b, loss_b = ref_step(fp_b, os_b,
                                      jnp.asarray(i, jnp.int32))
        np.testing.assert_allclose(float(loss_a), float(loss_b),
                                   rtol=1e-4, atol=1e-5)
    # parameters agree after 3 pipelined steps
    np.testing.assert_allclose(np.asarray(fp_a), np.asarray(fp_b),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_hetero_pipeline_2d_data_axis_matches_unpipelined():
    """2-D pipeline x data parallelism (round 4): the same staged
    VGG trains on a ('data', 'pipe') mesh — batch sharded over data,
    stages over pipe — with the SAME loss trajectory and final params
    as plain sequential training at equal global batch."""
    from jax.sharding import Mesh

    from myconvnet_tpu.parallel.pipeline import (_unflatten_params,
                                                 make_pipelined_train_step)
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy

    n_pipe, n_data = 2, 2
    mesh2 = Mesh(np.array(jax.devices()[:n_pipe * n_data]).reshape(
        n_data, n_pipe), ("data", "pipe"))
    stage_aps, params, flat, metas, x = _vgg_setup(n_pipe)
    y = jax.random.randint(jax.random.key(2), (x.shape[0],), 0, 7)

    opt = optim.momentum(0.05, 0.9)
    step = make_pipelined_train_step(
        mesh2, stage_aps, metas, softmax_cross_entropy, opt,
        microbatches=2, axis_name="pipe", data_axis="data")

    def ref_loss(fp):
        h = x
        for i, ap in enumerate(stage_aps):
            h = ap(_unflatten_params(fp[i], metas[i]), h)
        return softmax_cross_entropy(h.astype(jnp.float32), y)

    @jax.jit
    def ref_step(fp, opt_state, i):
        loss, g = jax.value_and_grad(ref_loss)(fp)
        new_p, new_o = opt.update(g, opt_state, fp, i)
        return new_p, new_o, loss

    fp_a, fp_b = flat, flat
    os_a, os_b = opt.init(fp_a), opt.init(fp_b)
    for i in range(3):
        fp_a, os_a, loss_a = step(fp_a, os_a, x, y,
                                  jnp.asarray(i, jnp.int32))
        fp_b, os_b, loss_b = ref_step(fp_b, os_b,
                                      jnp.asarray(i, jnp.int32))
        np.testing.assert_allclose(float(loss_a), float(loss_b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fp_a), np.asarray(fp_b),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_hetero_pipeline_2d_forward_matches_1d():
    """pipeline_hetero with a data axis returns exactly the 1-D
    pipeline's outputs (per-example buffers shard without changing
    the math)."""
    from jax.sharding import Mesh

    from myconvnet_tpu.parallel.pipeline import pipeline_hetero

    n_pipe, n_data = 2, 4
    stage_aps, params, flat, metas, x = _vgg_setup(n_pipe)
    mesh1 = Mesh(np.array(jax.devices()[:n_pipe]), ("pipe",))
    mesh2 = Mesh(np.array(jax.devices()[:n_pipe * n_data]).reshape(
        n_data, n_pipe), ("data", "pipe"))
    out1 = pipeline_hetero(mesh1, stage_aps, flat, metas, x,
                           microbatches=2, axis_name="pipe")
    out2 = pipeline_hetero(mesh2, stage_aps, flat, metas, x,
                           microbatches=2, axis_name="pipe",
                           data_axis="data")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-5, atol=1e-6)
