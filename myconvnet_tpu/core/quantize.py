"""Int8 inference mode: a scope that reroutes conv/dense layers to the
quantized MXU ops (ops/quantized.py).

    with quantize.int8_scope():
        logits, _ = model.apply(params, state, None, x, False)

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
def int8_scope():
    prev = int8_active()
    _local.int8 = True
    try:
        yield
    finally:
        _local.int8 = prev
