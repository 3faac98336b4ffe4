"""Int8 inference mode: a scope that reroutes conv/dense layers to the
quantized MXU ops (ops/quantized.py).

    with quantize.int8_scope():
        logits, _ = model.apply(params, state, None, x, False)

Two activation-scaling modes:

* **dynamic** (default): per-tensor absmax computed per batch — zero
  setup, but every layer pays a full-tensor reduction and latency
  depends on the data.
* **calibrated static**: run representative batches under
  :func:`calibration_scope` to record per-layer activation absmax
  (keyed by the module scope path), then pass the records to
  ``int8_scope(scales=...)`` — the scales become compile-time
  constants, the reductions disappear, and serving latency is
  deterministic.  ``serving.make_inference_fn(calibrate_with=...)``
  wires this end-to-end.

Inference-only (rounding has no useful gradient); combine with
``serving.make_inference_fn`` so XLA constant-folds the weight
quantization against the frozen params.
"""

from __future__ import annotations

import contextlib
import threading

_local = threading.local()


def int8_active() -> bool:
    return getattr(_local, "int8", False)


@contextlib.contextmanager
def int8_scope(scales: dict[str, float] | None = None):
    """Reroute conv/dense to int8.  ``scales``: {scope_path: absmax}
    from :func:`calibration_scope`; omitted paths fall back to dynamic
    quantization."""
    prev = int8_active()
    prev_scales = getattr(_local, "scales", None)
    _local.int8 = True
    _local.scales = scales
    try:
        yield
    finally:
        _local.int8 = prev
        _local.scales = prev_scales


def calibrating() -> bool:
    return getattr(_local, "calib", None) is not None


@contextlib.contextmanager
def calibration_scope(records: dict[str, float]):
    """Observe-only mode: layers run in full precision while the maximum
    activation |x| per scope path accumulates into ``records`` (run as
    many representative batches as you like)."""
    prev = getattr(_local, "calib", None)
    _local.calib = records
    try:
        yield
    finally:
        _local.calib = prev


def _current_path() -> str:
    from myconvnet_tpu.core.module import _frame
    try:
        return _frame().scope_path()
    except RuntimeError:
        return "~"


def observe_activation(x) -> None:
    """Called by nn.conv/nn.dense under calibration_scope: fold this
    batch's absmax into the records (host-side float — calibration runs
    eagerly, outside jit)."""
    rec = getattr(_local, "calib", None)
    if rec is None:
        return
    import jax.numpy as jnp
    path = _current_path()
    val = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    rec[path] = max(rec.get(path, 0.0), val)


def activation_absmax() -> float | None:
    """The calibrated absmax for the current layer under int8_scope, or
    None (-> dynamic quantization)."""
    scales = getattr(_local, "scales", None)
    if not scales:
        return None
    return scales.get(_current_path())
