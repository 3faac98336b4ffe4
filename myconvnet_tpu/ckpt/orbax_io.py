"""Optional Orbax checkpoint backend (multi-host / sharded state).

The default ``.npz`` format (ckpt/checkpoint.py) is single-host: it
gathers the full state to one process.  On a pod slice the state is
sharded over many hosts, and gathering it would both move TBs over DCN
and need 1 host's RAM — Orbax writes each host's shards in parallel and
restores them onto the original sharding (the TPU-native checkpoint
path).  This module is import-gated: nothing else in the package
requires orbax.

Interface mirrors ckpt/checkpoint.py: ``save(dir, step, state)`` /
``restore(dir_or_path, target)`` with newest-``keep`` pruning.
"""

from __future__ import annotations

import os
import re
from typing import Any

_PREFIX = "orbax-"


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save(directory: str, step: int, state: dict[str, Any], *,
         keep: int = 3) -> str:
    """Write ``orbax-{step}/`` under ``directory``; prune to ``keep``."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(os.path.abspath(directory), f"{_PREFIX}{step}")
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _prune(directory, keep)
    return path


def all_steps(directory: str) -> list[int]:
    try:
        names = os.listdir(directory)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = re.fullmatch(rf"{_PREFIX}(\d+)", n)
        if m and os.path.isdir(os.path.join(directory, n)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest(directory: str) -> str | None:
    steps = all_steps(directory)
    if not steps:
        return None
    return os.path.join(directory, f"{_PREFIX}{steps[-1]}")


def _prune(directory: str, keep: int) -> None:
    import shutil
    for s in all_steps(directory)[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(directory, f"{_PREFIX}{s}"),
                      ignore_errors=True)


def restore(path: str, target: dict[str, Any]) -> dict[str, Any]:
    """Restore into ``target``'s structure/shardings.  ``path`` may be a
    checkpoint dir (``orbax-N``) or a parent directory (-> latest).

    Sharded leaves in ``target`` restore ONTO their sharding — each host
    reads only its shards.
    """
    if not os.path.basename(path).startswith(_PREFIX):
        found = latest(path)
        if found is None:
            raise FileNotFoundError(f"no orbax checkpoints in {path!r}")
        path = found
    ckptr = _checkpointer()
    return ckptr.restore(os.path.abspath(path), target)


def checkpoint_step(path: str) -> int:
    return int(os.path.basename(path)[len(_PREFIX):])
