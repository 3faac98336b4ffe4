"""Debug-mode numerics checking (SURVEY.md §5 'race detection /
sanitizers' row: the TPU-native analogue is jit purity + checkify-style
NaN/inf detection — there are no data races in a pure-functional program,
so the failure class to guard is numerical poisoning).

``nan_guard(fn)`` wraps a jitted step: every float output (loss,
gradients, params) is checked for NaN/inf on-device and a named error is
raised host-side.  Costs one fused reduction per tensor — enable for
debugging, not production.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    pass


def tree_nonfinite_report(tree: Any, prefix: str = "") -> dict[str, int]:
    """Host-side scan of a pytree for non-finite values: {path: count}."""
    bad = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        n = int(jnp.sum(~jnp.isfinite(arr.astype(jnp.float32))))
        if n:
            key = prefix + "/".join(str(getattr(p, "key", p)) for p in path)
            bad[key] = n
    return bad


def nan_guard(step_fn: Callable, check_every: int = 1) -> Callable:
    """Wrap ``step_fn(state, *args) -> (state, metrics)`` with on-device
    finiteness flags checked host-side every ``check_every`` calls."""

    def flag(tree):
        leaves = [x for x in jax.tree.leaves(tree)
                  if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)]
        if not leaves:
            return jnp.asarray(True)
        oks = [jnp.all(jnp.isfinite(x.astype(jnp.float32)))
               for x in leaves]
        return jnp.stack(oks).all()

    counter = {"n": 0}

    def wrapped(state, *args, **kwargs):
        out_state, metrics = step_fn(state, *args, **kwargs)
        counter["n"] += 1
        if counter["n"] % check_every == 0:
            ok = bool(jax.jit(flag)(out_state))
            if not ok:
                report = tree_nonfinite_report(
                    out_state._asdict() if hasattr(out_state, "_asdict")
                    else out_state)
                raise NonFiniteError(
                    f"non-finite values after step {counter['n']}: "
                    f"{dict(list(report.items())[:5])}")
        return out_state, metrics

    return wrapped
