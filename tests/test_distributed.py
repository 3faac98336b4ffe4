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
