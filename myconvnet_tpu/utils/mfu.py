"""MFU / throughput accounting (BASELINE north_star: >=45% MFU ResNet-50).

MFU = achieved FLOP/s divided by the chip's peak.  Achieved FLOPs per
step come from XLA's own cost analysis of the *compiled* program (exact
for the program actually run, including backward), falling back to an
analytic conv/dense count when cost analysis is unavailable.
"""

from __future__ import annotations

import jax

# Peak dense matmul FLOP/s per chip (bf16), by platform/type.
#
# NOTE: the v5e figure is 197 TF/s *bf16*; 394 TF/s is the v5e *int8*
# peak (kept separately below).  An earlier revision used 394 here,
# which halved every reported bf16 MFU — the chip's own measured
# 2048^3 bf16 matmul rate (189 TF/s, PERF_NOTES round 3) is 96% of
# 197, confirming 197 as the bf16 spec.
PEAK_FLOPS = {
    "tpu v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
    "tpu v5e": 197e12,
    "tpu v5": 459e12,        # v5p
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,   # v6e (Trillium)
    "cpu": 1e11,             # nominal, for smoke tests only
}

# Peak int8 OP/s per chip, for int8-serving MFU accounting
# (device_peak_flops(dtype="int8")).
PEAK_OPS_INT8 = {
    "tpu v5 lite": 394e12,   # v5e int8
    "tpu v5e": 394e12,
    "tpu v5": 918e12,        # v5p int8
    "tpu v4": 275e12,        # v4 has no int8 doubling
    "tpu v6 lite": 1836e12,  # v6e int8
}


def device_peak_flops(device=None, dtype: str = "bf16") -> float:
    """Peak OP/s of the device for ``dtype`` ("bf16" default; "int8"
    reads the doubled-throughput int8 table for serving MFU)."""
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    table = PEAK_OPS_INT8 if dtype == "int8" else PEAK_FLOPS
    for k, v in table.items():
        if k in kind:
            return v
    return PEAK_FLOPS["cpu"]


def compiled_flops(compiled) -> float | None:
    """FLOPs of a compiled jax function (one execution), or None."""
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        f = analysis.get("flops")
        return float(f) if f else None
    except Exception:
        return None


def mfu(step_flops: float, step_time_s: float, n_devices: int = 1,
        device=None) -> float:
    peak = device_peak_flops(device) * n_devices
    return step_flops / (step_time_s * peak)


def conv_flops(out_shape, kernel_shape) -> float:
    """Analytic MACs*2 for one conv: N*OH*OW*Cout * kh*kw*Cin."""
    n, oh, ow, cout = out_shape
    kh, kw, cin, _ = kernel_shape
    return 2.0 * n * oh * ow * cout * kh * kw * cin
