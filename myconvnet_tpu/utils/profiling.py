"""Profiling hooks (SURVEY.md §5 'tracing/profiling' rebuild column).

The reference has TensorBoard scalar summaries only; the rebuild adds
real accelerator tracing: ``jax.profiler`` trace capture around training
steps (viewable in TensorBoard/Perfetto/XProf) plus device memory stats
and a step-time stall detector (north star: zero input-bound stalls).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed steps:

        with profiling.trace("runs/x/profile"):
            for _ in range(10):
                state, _ = train_step(state, batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k] = int(stats[k])
    return out


@dataclass
class StallDetector:
    """Detects input-bound steps: if the host spends longer between device
    dispatches than the device needs per step, the input pipeline is the
    bottleneck (BASELINE north star requires ~zero such stalls).

    Usage per step::

        det.host_wait_begin()
        batch = next(data_iter)     # host-side work being measured
        det.host_wait_end()
        state, _ = train_step(state, batch)
    """

    device_step_time: float | None = None  # measured steady-state step sec
    _t0: float = field(default=0.0, init=False)
    host_wait_total: float = field(default=0.0, init=False)
    steps: int = field(default=0, init=False)
    stalled_steps: int = field(default=0, init=False)

    def host_wait_begin(self):
        self._t0 = time.perf_counter()

    def host_wait_end(self):
        dt = time.perf_counter() - self._t0
        self.host_wait_total += dt
        self.steps += 1
        if self.device_step_time and dt > 0.05 * self.device_step_time:
            # waiting >5% of a device step on input = a stall
            self.stalled_steps += 1

    @property
    def stall_fraction(self) -> float:
        return self.stalled_steps / max(self.steps, 1)

    def report(self) -> dict:
        return {
            "input_wait_ms_per_step":
                1e3 * self.host_wait_total / max(self.steps, 1),
            "stall_fraction": self.stall_fraction,
        }
