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
    if len(jax.devices()) < N_STAGES:
        pytest.skip("needs >=4 virtual devices")
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
