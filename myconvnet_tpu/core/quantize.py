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


def qat_active() -> bool:
    return getattr(_local, "qat", False)


@contextlib.contextmanager
def qat_scope():
    """Quantization-aware training: conv/dense weights and activations
    pass through int8 fake-quantization (quantize -> dequantize) with a
    straight-through gradient, so training sees serving's rounding while
    gradients flow as if it were identity.  Compose: train under
    ``qat_scope()``, serve the result under ``int8_scope()`` — the
    quantization error the int8 path introduces is exactly what the
    model was optimized against."""
    prev = qat_active()
    _local.qat = True
    try:
        yield
    finally:
        _local.qat = prev


def fake_quant(x, axis=None):
    """Straight-through int8 quantize->dequantize (symmetric; per-tensor
    or per-``axis`` scales, matching ops.quantized.quantize_tensor)."""
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu.ops.quantized import quantize_tensor

    def qdq(v):
        q, scale = quantize_tensor(v, axis=axis)
        s = scale if axis is None else jnp.expand_dims(
            scale, tuple(i for i in range(v.ndim) if i != (axis % v.ndim)))
        return q.astype(jnp.float32) * s

    xf = x.astype(jnp.float32)
    return (xf + jax.lax.stop_gradient(qdq(xf) - xf)).astype(x.dtype)
