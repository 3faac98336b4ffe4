"""Minimal functional module system (init/apply transform).

TPU-native replacement for the reference's TF-1.x graph construction
(reference: convnet.py — graph build with ``tf.variable_scope`` /
``tf.get_variable``; mount was empty, see SURVEY.md §0).  Instead of a
stateful graph, a model is a *pure function* ``fn(x, train=...)`` that
requests parameters/state through :func:`param` / :func:`get_state`.
:func:`transform` turns it into an ``(init, apply)`` pair:

* ``init(key, *args) -> (params, state)`` — traces ``fn`` once, creating
  every parameter with its initializer (analogue of TF variable creation
  at graph-build time).
* ``apply(params, state, key, *args) -> (out, new_state)`` — pure, jittable,
  differentiable; BN moving statistics travel through ``state`` instead of
  TF's update ops.

Both run the *same* forward code, so architecture is written once.
Parameters live in a two-level dict ``{scope_path: {name: array}}`` — a
plain pytree, friendly to optimizers, checkpointing and `jax.sharding`.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Params = dict[str, dict[str, jax.Array]]
State = dict[str, dict[str, jax.Array]]

_local = threading.local()


class _Frame:
    """Tracing context for one init/apply invocation."""

    def __init__(self, params: Params, state: State, rng: jax.Array | None,
                 creating: bool):
        self.params = params
        self.state = state
        self.new_state: State = {}
        self.rng = rng
        self.rng_count = 0
        self.creating = creating
        self.path: list[str] = []
        # (path, base_name) -> next auto-number, so layers called in a fixed
        # order get stable names across init and apply.
        self.counters: dict[tuple[str, str], int] = {}

    def scope_path(self) -> str:
        return "/".join(self.path) if self.path else "~"


def _frame() -> _Frame:
    frame = getattr(_local, "frame", None)
    if frame is None:
        raise RuntimeError(
            "module.param()/get_state() used outside transform().init/apply")
    return frame


class scope:
    """Context manager pushing a name onto the module path."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        _frame().path.append(self.name)
        return self

    def __exit__(self, *exc):
        _frame().path.pop()
        return False


class shared_scope:
    """A scope whose parameters are SHARED across repeat visits.

    Unlike :class:`scope` via ``auto_name`` (each visit auto-numbers into
    fresh parameters), entering a ``shared_scope`` with the same name
    twice resolves to the same parameter bucket: the name is pushed
    verbatim, and auto-numbering *inside* the scope restarts on every
    visit so layer call sequences line up — the second visit's
    ``param()`` calls find (init) or fetch (apply) the first visit's
    arrays.  This is how weight-tied heads are expressed, e.g. a
    RetinaNet/FPN head applied to every pyramid level
    (models/retinanet.py).

    Shapes must agree across visits (``param`` returns the first-created
    array).  Mutable state (``set_state``) inside a shared scope is
    last-write-wins — keep BN out of weight-tied heads.
    """

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        f = _frame()
        f.path.append(self.name)
        prefix = f.scope_path()
        self._saved = f.counters
        # restart auto-numbering for everything at or under this path so
        # each visit generates the same inner names ("/"-boundary match:
        # "a/head" must not swallow "a/head2")
        f.counters = {k: v for k, v in f.counters.items()
                      if not (k[0] == prefix
                              or k[0].startswith(prefix + "/"))}
        return self

    def __exit__(self, *exc):
        f = _frame()
        f.counters = self._saved
        f.path.pop()
        return False


def auto_name(base: str) -> str:
    """Return ``base`` (first use) or ``base_N`` for repeat uses in a scope.

    Deterministic given a deterministic forward pass, which keeps init and
    apply name-aligned (same trick as haiku's auto-numbered modules).
    """
    f = _frame()
    key = (f.scope_path(), base)
    idx = f.counters.get(key, 0)
    f.counters[key] = idx + 1
    return base if idx == 0 else f"{base}_{idx}"


def param(name: str, shape: tuple[int, ...], dtype: Any,
          init_fn: Callable[[jax.Array, tuple[int, ...], Any], jax.Array]
          ) -> jax.Array:
    """Request (create during init, fetch during apply) a parameter."""
    f = _frame()
    path = f.scope_path()
    if f.creating:
        bucket = f.params.setdefault(path, {})
        if name not in bucket:
            bucket[name] = init_fn(next_rng_key(), shape, dtype)
        return bucket[name]
    try:
        return f.params[path][name]
    except KeyError as e:
        raise KeyError(f"missing parameter {path!r}/{name!r}") from e


def get_state(name: str, shape: tuple[int, ...], dtype: Any,
              init_fn: Callable[..., jax.Array]) -> jax.Array:
    """Request non-differentiable state (e.g. BN moving statistics)."""
    f = _frame()
    path = f.scope_path()
    if path in f.new_state and name in f.new_state[path]:
        return f.new_state[path][name]
    if f.creating:
        bucket = f.state.setdefault(path, {})
        if name not in bucket:
            bucket[name] = init_fn(shape, dtype)
        return bucket[name]
    try:
        return f.state[path][name]
    except KeyError as e:
        raise KeyError(f"missing state {path!r}/{name!r}") from e


def set_state(name: str, value: jax.Array) -> None:
    f = _frame()
    f.new_state.setdefault(f.scope_path(), {})[name] = value


def next_rng_key() -> jax.Array:
    """Fold a fresh key out of the frame key (explicit-PRNG discipline)."""
    f = _frame()
    if f.rng is None:
        raise RuntimeError("no rng key supplied to init/apply")
    f.rng_count += 1
    return jax.random.fold_in(f.rng, f.rng_count)


def in_init() -> bool:
    frame = getattr(_local, "frame", None)
    return frame is not None and frame.creating


def remat(fn: Callable[..., Any], *args,
          policy: Any = None) -> Any:
    """Run a module-using block under ``jax.checkpoint``: its
    intermediates are recomputed during backprop instead of being
    written to and re-read from HBM — the bandwidth-for-FLOPs trade
    that pays on TPU, at BLOCK granularity (full-forward remat was
    measured slower, PERF_NOTES.md; per-block keeps the recompute
    local while still dropping the saved-activation traffic).

    ``policy`` selects WHAT gets recomputed:
      * ``None`` — save only the block boundary; recompute everything
        (max memory saving, full recompute cost — measured a
        throughput LOSS on the v5e bench, PERF_NOTES.md);
      * ``"conv"`` — save the MXU results (nn.conv outputs are tagged
        ``checkpoint_name("conv_out")``), recompute only the
        elementwise norm/activation tensors between them — near-zero
        recompute FLOPs for roughly half the saved-activation traffic;
      * any ``jax.checkpoint_policies`` callable — passed through.

    ``fn(*args)`` may create/read params and read/write state through
    the frame like any layer code.  The frame's side channels cannot
    legally cross a checkpoint boundary (inner tracers would leak), so
    this wrapper makes them explicit: params/state/pending state writes
    go in as pytree arguments, state writes come back out, and the
    Python-level bookkeeping (auto-name counters, rng count) is
    captured from the single trace and replayed onto the caller's
    frame.  During init it calls ``fn`` directly — param creation is
    eager and init is never differentiated.
    """
    f = _frame()
    if f.creating:
        return fn(*args)
    path0 = list(f.path)
    counters0 = dict(f.counters)
    rng_count0 = f.rng_count
    book: dict[str, Any] = {}

    def inner(params, state, new_state, rng, inner_args):
        g = _Frame(params, state, rng, creating=False)
        g.new_state = {k: dict(v) for k, v in new_state.items()}
        g.rng_count = rng_count0
        g.path = list(path0)
        g.counters = dict(counters0)
        prev = getattr(_local, "frame", None)
        _local.frame = g
        try:
            out = fn(*inner_args)
        finally:
            _local.frame = prev
        # trace-time bookkeeping, captured once (jax replays the jaxpr
        # for the backward recompute — Python runs only here)
        book["rng_count"] = g.rng_count
        book["counters"] = g.counters
        return out, g.new_state

    if policy == "conv":
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    out, new_state = jax.checkpoint(inner, policy=policy)(
        f.params, f.state, f.new_state, f.rng, args)
    f.new_state = new_state
    f.rng_count = book["rng_count"]
    f.counters = book["counters"]
    return out


def current_scope_in_params() -> bool:
    """True when the current scope path exists in the param tree (or we
    are creating).  Lets layers detect graph-optimization removals, e.g.
    BN scopes deleted by inference-time folding."""
    f = _frame()
    return f.creating or f.scope_path() in f.params


def param_exists(name: str) -> bool:
    """True when ``name`` exists in the current scope's params at apply
    time (e.g. a bias injected by BN folding).  False during init."""
    f = _frame()
    if f.creating:
        return False
    return name in f.params.get(f.scope_path(), {})


# ------------------------------------------------------------ intermediates

def tag_intermediate(name: str, value: jax.Array) -> jax.Array:
    """Mark a named activation. Under :func:`collecting` the value is
    recorded; under :func:`overriding` it is REPLACED (the intervention
    hook Grad-CAM uses to differentiate w.r.t. an internal tensor).
    A no-op with zero overhead otherwise — safe to leave in model code.
    """
    frame = getattr(_local, "frame", None)
    if frame is None:
        return value
    key = f"{frame.scope_path()}/{name}"
    overrides = getattr(_local, "overrides", None)
    if overrides:
        for d in reversed(overrides):
            if key in d:
                value = d[key]
                break
    collectors = getattr(_local, "collectors", None)
    if collectors:
        collectors[-1][key] = value
    return value


class collecting:
    """``with collecting() as c:`` — tagged activations inside this block
    land in ``c`` keyed by ``scope_path/name`` (tracers under jit: return
    them from the traced function to materialize)."""

    def __enter__(self) -> dict[str, jax.Array]:
        stack = getattr(_local, "collectors", None)
        if stack is None:
            stack = _local.collectors = []
        self._d: dict[str, jax.Array] = {}
        stack.append(self._d)
        return self._d

    def __exit__(self, *exc):
        _local.collectors.pop()
        return False


class overriding:
    """``with overriding({key: value}):`` — tagged activations matching
    ``key`` are substituted during apply (gradient flows into value)."""

    def __init__(self, values: dict[str, jax.Array]):
        self._values = values

    def __enter__(self):
        stack = getattr(_local, "overrides", None)
        if stack is None:
            stack = _local.overrides = []
        stack.append(self._values)
        return self

    def __exit__(self, *exc):
        _local.overrides.pop()
        return False


class Transformed(NamedTuple):
    init: Callable[..., tuple[Params, State]]
    apply: Callable[..., tuple[Any, State]]


def _merged_state(frame: _Frame) -> State:
    out: State = {k: dict(v) for k, v in frame.state.items()}
    for path, bucket in frame.new_state.items():
        out.setdefault(path, {}).update(bucket)
    return out


def transform(fn: Callable[..., Any]) -> Transformed:
    """Turn an impure-looking forward fn into a pure (init, apply) pair."""

    def init(key: jax.Array, *args, **kwargs) -> tuple[Params, State]:
        frame = _Frame({}, {}, key, creating=True)
        prev = getattr(_local, "frame", None)
        _local.frame = frame
        try:
            fn(*args, **kwargs)
        finally:
            _local.frame = prev
        # Return freshly-created state, NOT post-forward updates: init must
        # yield e.g. zeroed BN moving stats regardless of the train flag used
        # for tracing.
        return frame.params, frame.state

    def apply(params: Params, state: State, key: jax.Array | None,
              *args, **kwargs) -> tuple[Any, State]:
        frame = _Frame(params, state, key, creating=False)
        prev = getattr(_local, "frame", None)
        _local.frame = frame
        try:
            out = fn(*args, **kwargs)
        finally:
            _local.frame = prev
        return out, _merged_state(frame)

    return Transformed(init=init, apply=apply)
