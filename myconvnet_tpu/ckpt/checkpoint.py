"""Checkpointing: save/restore of full train state + best-metric retention.

Rebuild of the reference's ``tf.train.Saver`` usage (SURVEY.md §5): the
reference saves weights on best-validation and restores for eval/resume.
Here a checkpoint is the *entire* training state — params, optimizer
state, BN statistics, step counter, PRNG key — so resume is exact
(the reference's Saver covered variables only [MED]).

Format: one ``.npz`` per checkpoint with flattened ``path::name`` keys +
a tiny JSON sidecar of tree structure and metadata.  No framework lock-in,
human-inspectable, atomic (write temp + rename).  Orbax is deliberately
not required: the state is a plain pytree of small-to-medium arrays and
single-host save/restore is the reference's scope.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import jax
import numpy as np

SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[prefix + key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, step: int, state: dict[str, Any], *,
                    keep: int = 3, metric: float | None = None,
                    is_best: bool = False) -> str:
    """Atomically write ``ckpt-{step}.npz`` (+ ``best.npz`` hard copy when
    ``is_best``); prunes to the newest ``keep`` checkpoints."""
    os.makedirs(directory, exist_ok=True)
    treedef = jax.tree_util.tree_structure(state)
    flat = _flatten(state)
    path = os.path.join(directory, f"ckpt-{step}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)

    meta = {"step": int(step), "metric": metric,
            "treedef": str(treedef),
            "keys": sorted(flat)}
    with open(os.path.join(directory, f"ckpt-{step}.json"), "w") as f:
        json.dump(meta, f)

    if is_best:
        import shutil
        shutil.copyfile(path, os.path.join(directory, "best.npz"))
        with open(os.path.join(directory, "best.json"), "w") as f:
            json.dump(meta, f)

    _prune(directory, keep)
    return path


def _prune(directory: str, keep: int) -> None:
    steps = sorted(all_steps(directory))
    for s in steps[:-keep] if keep > 0 else []:
        for ext in (".npz", ".json"):
            try:
                os.remove(os.path.join(directory, f"ckpt-{s}{ext}"))
            except FileNotFoundError:
                pass


def all_steps(directory: str) -> list[int]:
    steps = []
    try:
        names = os.listdir(directory)
    except (FileNotFoundError, NotADirectoryError):
        return []
    for n in names:
        if n.startswith("ckpt-") and n.endswith(".npz"):
            try:
                steps.append(int(n[len("ckpt-"):-len(".npz")]))
            except ValueError:
                pass
    return sorted(steps)


def latest_checkpoint(directory: str) -> str | None:
    steps = all_steps(directory)
    if not steps:
        return None
    return os.path.join(directory, f"ckpt-{steps[-1]}.npz")


def best_checkpoint(directory: str) -> str | None:
    p = os.path.join(directory, "best.npz")
    return p if os.path.exists(p) else None


def restore_checkpoint(path: str, target: dict[str, Any]) -> dict[str, Any]:
    """Restore into the structure of ``target`` (a template pytree with the
    right treedef, e.g. freshly-initialized state).  Shapes are validated;
    a mismatch names the offending entry."""
    if os.path.isdir(path):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no checkpoints in {path!r}")
        path = found
    with np.load(path) as data:
        flat_saved = {k: data[k] for k in data.files}
    flat_target = _flatten(target)
    missing = sorted(set(flat_target) - set(flat_saved))
    if missing:
        raise ValueError(f"checkpoint {path!r} missing keys: {missing[:5]}"
                         f"{'...' if len(missing) > 5 else ''}")
    unused = sorted(set(flat_saved) - set(flat_target))
    if unused:
        # loud, not fatal: a checkpoint carrying weights the current
        # model has no slot for usually means an architecture changed
        # under it (e.g. ResNet-18/34 stage-1 shortcuts went identity in
        # round 2) — restoring silently would compute a different
        # function than was trained
        import warnings
        warnings.warn(
            f"checkpoint {path!r} carries {len(unused)} entries the "
            f"target has no slot for (e.g. {unused[:3]}) — they are "
            "IGNORED; if this checkpoint predates an architecture "
            "change, re-train or convert it", stacklevel=2)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for keypath, leaf in leaves_with_path:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in keypath)
        arr = flat_saved[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"target {np.shape(leaf)}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def average_checkpoints(directory: str, target: dict[str, Any], *,
                        n_last: int = 0,
                        subtree: str = "params") -> dict[str, Any]:
    """Checkpoint averaging (Polyak over saved snapshots): restore the
    newest checkpoint, then replace its ``subtree`` leaves with the f32
    mean over the last ``n_last`` checkpoints (0 = all available,
    1 = plain restore of the newest).
    A cheap eval-time ensemble when no in-training EMA was configured;
    optimizer state/step/PRNG come from the newest snapshot untouched.
    """
    steps = all_steps(directory)
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {directory!r}")
    use = steps[-n_last:] if n_last and n_last >= 1 else steps
    newest = restore_checkpoint(
        os.path.join(directory, f"ckpt-{use[-1]}.npz"), target)
    if len(use) == 1:
        return newest
    prefix = subtree + SEP
    acc: dict[str, np.ndarray] = {}
    for s in use:
        with np.load(os.path.join(directory, f"ckpt-{s}.npz")) as data:
            for k in data.files:
                if k.startswith(prefix):
                    v = data[k].astype(np.float64)
                    acc[k] = acc.get(k, 0.0) + v
    flat_new = _flatten(newest)
    for k, v in acc.items():
        flat_new[k] = (v / len(use)).astype(flat_new[k].dtype)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(
        newest)
    new_leaves = []
    for keypath, leaf in leaves_with_path:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in keypath)
        new_leaves.append(flat_new[key])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_step(path: str) -> int:
    base = os.path.basename(path)
    if base == "best.npz":
        with open(os.path.join(os.path.dirname(path), "best.json")) as f:
            return int(json.load(f)["step"])
    return int(base[len("ckpt-"):-len(".npz")])


class AsyncCheckpointer:
    """Background-thread checkpoint writer: hide serialize+disk time
    from the step loop.

    ``save()`` snapshots the state to HOST memory synchronously (the
    device->host copies must happen before the training loop mutates
    or donates the buffers) and hands the npz serialization + atomic
    rename to one worker thread.  At most one write is in flight; a
    new save waits for the previous (bounded memory, ordered files).
    Call ``wait()`` before restoring or exiting — the Trainer and the
    step-loop driver do.  The on-disk format is exactly
    :func:`save_checkpoint`'s, so restore/prune/best tooling applies
    unchanged.
    """

    def __init__(self):
        self._pending = None
        self._exc = None

    def save(self, directory: str, step: int, state: dict[str, Any], *,
             keep: int = 3, metric: float | None = None,
             is_best: bool = False) -> None:
        import threading

        self.wait()                      # one write in flight
        # synchronous device->host snapshot: after this the caller may
        # freely donate/overwrite the live state.  Copy UNCONDITIONALLY
        # — np.asarray on a jax Array can return a zero-copy read-only
        # view on the CPU backend (ADVICE r3), and the caller's next
        # donated step would then overwrite memory the background
        # writer is still serializing.
        def _snap(x):
            return np.array(x, copy=True)

        host_state = jax.tree_util.tree_map(_snap, state)

        def _write():
            try:
                save_checkpoint(directory, step, host_state, keep=keep,
                                metric=metric, is_best=is_best)
            except BaseException as e:   # surfaced on next wait/save
                self._exc = e

        t = threading.Thread(target=_write, name="ckpt-writer",
                             daemon=True)
        t.start()
        self._pending = t

    def wait(self) -> None:
        """Join the in-flight write; re-raise its failure if any."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
